"""ReDoS guard for user-supplied selector regexes (VERDICT r2 item 3).

The reference swapped :matches* evaluation to re2j (linear time) in
1.22.1 precisely because selector patterns run over wild text
(reference helper/Regex.java:1). Without re2 in the environment the
fallback must reject exponential-backtracking shapes at selector-parse
time — in bounded time — instead of wedging an executor at match time.
"""

import time

import pytest

from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.select.regexguard import (
    UnsafePatternError, check_pattern, compile_safe)
from jsoup_spark.select.selector import SelectorParseError, select

CATASTROPHIC = [
    "(a+)+$",          # classic nested quantifier
    "(a*)*b",
    "(.*)*x",
    "(a|a)+$",         # overlapping alternation under repeat
    "(a|ab)+$",
    "(a{2,3})+$",      # exponential composition counting
    "([a-z]+)*@",
    "(x+x+)+y",
]

SAFE = [
    "Three\\nlines", "[A-Z]\\w+", "\\d", "^Two", "^p\\d+$",   # golden set
    "a+b*c?", "(?i)hello world", "a{3}", "(abc)+", "(a|b)+",
    "colou?r", "\\bfoo\\b.*bar", "^[a-z0-9._%+-]+@[a-z0-9.-]+$",
]


def test_catastrophic_patterns_rejected_in_bounded_time():
    t0 = time.monotonic()
    for pat in CATASTROPHIC:
        with pytest.raises(UnsafePatternError):
            check_pattern(pat)
    assert time.monotonic() - t0 < 1.0


def test_safe_patterns_pass():
    for pat in SAFE:
        assert compile_safe(pat).search is not None


def test_selector_rejects_redos_pattern_at_parse_time():
    doc = parse("<p>" + "a" * 64 + "!</p>")
    t0 = time.monotonic()
    with pytest.raises(SelectorParseError):
        select(doc, ":matches((a+)+$)")
    with pytest.raises(SelectorParseError):
        select(doc, "[id~=(a|a)+$]")
    # bounded: rejection happens at parse, not after backtracking
    assert time.monotonic() - t0 < 1.0


def test_selector_matches_still_work():
    doc = parse("<p id=p1>One</p><p id=p2>Two words</p>")
    assert [e.attr("id") for e in select(doc, "p:matches(^Two)")] == ["p2"]
    assert [e.attr("id") for e in select(doc, "[id~=^p\\d+$]")] == ["p1", "p2"]
