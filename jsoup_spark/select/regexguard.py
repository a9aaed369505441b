"""Linear-time-safe compilation of USER-supplied selector regexes.

jsoup 1.22.1 routes `:matches(...)` / `[attr~=re]` patterns through re2j
(linear-time) when it is on the classpath, because these are user patterns
evaluated over wild text — one catastrophic-backtracking pattern wedges a
worker core (reference: /root/reference/src/main/java/org/jsoup/helper/
Regex.java:1, CHANGES.md 1.22.1). This module mirrors that contract:

* if the `re2` / `google-re2` wheel is importable, compile with it
  (linear-time guarantee); patterns it cannot express (backrefs,
  lookaround) fall back to stdlib `re`, gated by the static check;
* otherwise compile with stdlib `re` after a static ReDoS heuristic that
  REJECTS exponential-backtracking shapes at parse time:
    - a variable-width repeat nested inside an amplifying repeat
      (``(a+)+``, ``(.*)*``, ``(a{2,3})+`` — composition counting is
      exponential);
    - an amplifying repeat over an alternation whose branches overlap on
      their first character or can match empty (``(a|a)+``, ``(a|ab)+``).

Rejection raises SelectorParseError (ValueError), so a bad pattern fails
the query at PARSE time in bounded time instead of hanging an executor at
match time. Disable re2 (parity with -Djsoup.useRe2j=false) with env
JSOUP_SPARK_USE_RE2=0.
"""

from __future__ import annotations

import os
import re
from re import _constants as _C
from re import _parser as _sre_parse

try:  # pragma: no cover - exercised only where the wheel exists
    if os.environ.get("JSOUP_SPARK_USE_RE2", "1") != "0":
        import re2 as _re2
    else:
        _re2 = None
except ImportError:
    _re2 = None


class UnsafePatternError(ValueError):
    """Raised for patterns with exponential backtracking potential."""


_REPEAT_OPS = {_C.MAX_REPEAT, _C.MIN_REPEAT}
if hasattr(_C, "POSSESSIVE_REPEAT"):
    # possessive repeats never backtrack - but their BODY may still contain
    # plain repeats, so they are walked (and never count as amplifying)
    _POSSESSIVE = _C.POSSESSIVE_REPEAT
else:  # pragma: no cover - py<3.11
    _POSSESSIVE = None

# a bounded repeat with this many iterations amplifies inner ambiguity
# enough to matter (n^7 on a long text is already a wedged core)
_AMPLIFY_MIN = 8

_ZERO_WIDTH = {_C.AT, _C.ASSERT, _C.ASSERT_NOT}


def _first_info(seq):
    """(literal_first_set, wildcard, can_match_empty) for a parsed seq.

    Conservative: character classes / ANY / category escapes report
    wildcard=True (overlap with everything)."""
    lits: set[int] = set()
    wildcard = False
    for op, av in seq:
        if op in _ZERO_WIDTH:
            continue
        if op is _C.LITERAL:
            lits.add(av)
            return lits, wildcard, False
        if op is _C.SUBPATTERN:
            s_l, s_w, s_e = _first_info(av[3])
            lits |= s_l
            wildcard = wildcard or s_w
            if not s_e:
                return lits, wildcard, False
            continue  # group can be empty: next token also first
        if op is _C.BRANCH:
            any_empty = False
            for b in av[1]:
                b_l, b_w, b_e = _first_info(b)
                lits |= b_l
                wildcard = wildcard or b_w
                any_empty = any_empty or b_e
            if not any_empty:
                return lits, wildcard, False
            continue
        if op in _REPEAT_OPS or op is _POSSESSIVE:
            lo, _hi, body = av
            b_l, b_w, _ = _first_info(body)
            lits |= b_l
            wildcard = wildcard or b_w
            if lo > 0:
                return lits, wildcard, False
            continue  # optional: next token also contributes
        # ANY, IN, NOT_LITERAL, GROUPREF, ... - treat as wildcard width-1
        return lits, True, False
    return lits, wildcard, True


def _branches_overlap(branches) -> bool:
    infos = [_first_info(b) for b in branches]
    for i in range(len(infos)):
        li, wi, ei = infos[i]
        for j in range(i + 1, len(infos)):
            lj, wj, ej = infos[j]
            if ei or ej:          # an empty-matching branch under a repeat
                return True
            if wi and (wj or lj):  # wildcard overlaps anything non-empty
                return True
            if wj and (wi or li):
                return True
            if li & lj:
                return True
    return False


def _walk(seq, amplified: bool) -> None:
    for op, av in seq:
        if op in _REPEAT_OPS:
            lo, hi, body = av
            variable = hi != lo
            amplifying = hi == _C.MAXREPEAT or hi >= _AMPLIFY_MIN
            if amplified and variable:
                raise UnsafePatternError(
                    "variable repeat nested inside an unbounded/large repeat "
                    "(catastrophic backtracking)")
            if amplifying:
                for b_op, b_av in _flatten_groups(body):
                    if b_op is _C.BRANCH and _branches_overlap(b_av[1]):
                        raise UnsafePatternError(
                            "repeat over alternation with overlapping "
                            "branches (catastrophic backtracking)")
            _walk(body, amplified or amplifying)
        elif op is _POSSESSIVE:
            # never backtracks itself; body still checked in current context
            _walk(av[2], amplified)
        elif op is _C.BRANCH:
            for b in av[1]:
                _walk(b, amplified)
        elif op is _C.SUBPATTERN:
            _walk(av[3], amplified)
        elif op in (_C.ASSERT, _C.ASSERT_NOT):
            _walk(av[1], amplified)
        elif op is getattr(_C, "ATOMIC_GROUP", None):
            _walk(av, amplified)


def _flatten_groups(seq):
    """Yield tokens of seq with group wrappers peeled (one level walk)."""
    for op, av in seq:
        if op is _C.SUBPATTERN:
            yield from _flatten_groups(av[3])
        else:
            yield op, av


def check_pattern(pattern: str) -> None:
    """Raise UnsafePatternError if `pattern` has an exponential-
    backtracking shape. No-op for patterns a linear scan can serve."""
    try:
        parsed = _sre_parse.parse(pattern)
    except re.error:
        return  # re.compile will raise the proper syntax error
    _walk(parsed, False)


def compile_safe(pattern: str):
    """Compile a user-supplied regex for selector evaluation.

    Prefers re2 (linear time, any pattern it supports); falls back to
    stdlib `re` gated by the static ReDoS check. The returned object
    exposes `.search` (all selector evaluators use search-semantics)."""
    if _re2 is not None:
        try:
            return _re2.compile(pattern)
        except Exception:
            pass  # unsupported syntax (backrefs/lookaround): fall through
    check_pattern(pattern)
    return re.compile(pattern)
