"""CSS selector engine.

From-scratch implementation of the reference's selector dialect
(select/QueryParser.java:63-124 grammar, select/Evaluator.java leaf
evaluators, select/StructuralEvaluator.java combinators), evaluated over the
Python DOM inside batch UDFs.

Supported: tag / ns|tag / *|tag / ns|* / *, #id, .class, [attr] [^pre] [*]
[a=v] [a!=v] [a^=v] [a$=v] [a*=v] [a~=re], combinators (desc, >, +, ~, ','
groups, leading combinator), :lt/:gt/:eq, :first/last/only-child,
:nth-child/:nth-last-child/:nth-of-type/:nth-last-of-type(an+b|odd|even),
:first/last/only-of-type, :empty, :root, :has, :is, :not, :contains,
:containsOwn, :containsWholeText, :containsWholeOwnText, :containsData,
:matches, :matchesOwn, :matchesWholeText, :matchesWholeOwnText, :matchText,
and node selectors ::node ::leafnode ::text ::comment ::data ::cdata with
:contains/:matches/:blank value predicates.
"""

from __future__ import annotations

import re

from ..parser.nodes import (
    CDataNode, CommentNode, DataNode, Document, Element, LeafNode, Node,
    PseudoTextElement, TextNode, copy_attrs,
)


class SelectorParseError(ValueError):
    pass


def _compile_user_regex(pattern: str):
    """User-supplied patterns (:matches* / [a~=re]) go through the
    linear-time guard (reference helper/Regex.java:1 — re2j when present,
    jsoup 1.22.1 ReDoS fix). Unsafe shapes fail at selector-parse time."""
    from jsoup_spark.select.regexguard import UnsafePatternError, compile_safe
    try:
        return compile_safe(pattern)
    except UnsafePatternError as e:
        raise SelectorParseError(f"unsafe regex {pattern!r}: {e}") from e


# ---------------------------------------------------------------- TokenQueue

_IDENT_RE = re.compile(r"[a-zA-Z0-9_\--\U0010FFFF]")
_HEX = "0123456789abcdefABCDEF"


class _TQ:
    """Minimal analog of parser/TokenQueue.java for query lexing."""

    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def is_empty(self) -> bool:
        return self.pos >= len(self.s)

    def current(self) -> str:
        return self.s[self.pos] if self.pos < len(self.s) else ""

    def consume(self) -> str:
        c = self.s[self.pos]
        self.pos += 1
        return c

    def matches(self, seq: str) -> bool:
        return self.s.startswith(seq, self.pos)

    def match_chomp(self, seq: str) -> bool:
        if self.s.startswith(seq, self.pos):
            self.pos += len(seq)
            return True
        return False

    def matches_any(self, chars: str) -> bool:
        c = self.current()
        return bool(c) and c in chars

    def consume_whitespace(self) -> bool:
        seen = False
        while self.pos < len(self.s) and self.s[self.pos] in " \t\n\r\f":
            self.pos += 1
            seen = True
        return seen

    def matches_word(self) -> bool:
        c = self.current()
        return bool(c) and (c.isalnum() or ord(c) >= 0x80 or c in "_")

    def remainder(self) -> str:
        out = self.s[self.pos:]
        self.pos = len(self.s)
        return out

    def chomp_balanced(self, open_c: str, close_c: str) -> str:
        """TokenQueue.chompBalanced: quote- and \\Q..\\E-aware balanced
        extraction; returns contents between open/close."""
        start = None
        depth = 0
        prev = ""
        in_single = in_double = in_qe = False
        last = -1
        while not self.is_empty():
            c = self.consume()
            if prev == "\\":
                if c == "Q":
                    in_qe = True
                elif c == "E":
                    in_qe = False
            else:
                if c == "'" and c != open_c and not in_double:
                    in_single = not in_single
                elif c == '"' and c != open_c and not in_single:
                    in_double = not in_double
                if not (in_single or in_double or in_qe):
                    if c == open_c:
                        depth += 1
                        if start is None:
                            start = self.pos
                    elif c == close_c:
                        depth -= 1
            if depth > 0 and start is not None:
                last = self.pos
            prev = c
            if depth <= 0 and start is not None:
                break
        out = self.s[start:last] if start is not None and last >= start else ""
        if depth > 0:
            raise SelectorParseError(f"Did not find balanced marker in {self.s!r}")
        return out

    def consume_to_any(self, seqs) -> str:
        start = self.pos
        while not self.is_empty():
            if any(self.s.startswith(x, self.pos) for x in seqs):
                break
            self.pos += 1
        return self.s[start:self.pos]

    def _consume_escape(self) -> str:
        # CSS escape: backslash + hex{1,6} + optional ws, or literal char
        assert self.consume() == "\\"
        if self.is_empty():
            return ""
        c = self.current()
        if c in _HEX:
            h = ""
            while not self.is_empty() and self.current() in _HEX and len(h) < 6:
                h += self.consume()
            if not self.is_empty() and self.current() in " \t\n\r\f":
                self.pos += 1
            try:
                cp = int(h, 16)
                if cp == 0 or 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
                    return "�"
                return chr(cp)
            except ValueError:
                return "�"
        return self.consume()

    def consume_css_identifier(self) -> str:
        if self.is_empty():
            raise SelectorParseError("CSS identifier expected")
        out = []
        while not self.is_empty():
            c = self.current()
            if _IDENT_RE.match(c):
                out.append(self.consume())
            elif c == "\\":
                out.append(self._consume_escape())
            else:
                break
        if not out:
            raise SelectorParseError("empty CSS identifier")
        return "".join(out)

    def consume_element_selector(self) -> str:
        out = []
        while not self.is_empty():
            c = self.current()
            if _IDENT_RE.match(c) or c in "*|":
                out.append(self.consume())
            elif c == "\\":
                out.append(self._consume_escape())
            else:
                break
        return "".join(out)


def tq_unescape(s: str) -> str:
    """TokenQueue.unescape (TokenQueue.java:204-221)."""
    if "\\" not in s:
        return s
    out = []
    last = ""
    for c in s:
        if c == "\\":
            if last == "\\":
                out.append(c)
                c = ""
        else:
            out.append(c)
        last = c
    return "".join(out)


# ---------------------------------------------------------------- evaluators

class Ev:
    __slots__ = ()
    cost = 5

    def matches(self, root, el) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError


class AllElements(Ev):
    __slots__ = ()
    cost = 10

    def matches(self, root, el):
        return True


class TagIs(Ev):
    __slots__ = ("name",)
    cost = 1

    def __init__(self, name):
        self.name = name

    def matches(self, root, el):
        return el.name == self.name


class TagStartsWith(Ev):
    __slots__ = ("prefix",)

    def __init__(self, prefix):
        self.prefix = prefix

    def matches(self, root, el):
        return el.name.startswith(self.prefix)


class TagEndsWith(Ev):
    __slots__ = ("suffix",)

    def __init__(self, suffix):
        self.suffix = suffix

    def matches(self, root, el):
        return el.name.endswith(self.suffix)


class IdIs(Ev):
    __slots__ = ("id",)
    cost = 2

    def __init__(self, id_):
        self.id = id_

    def matches(self, root, el):
        return el.attr("id") == self.id


class ClassIs(Ev):
    __slots__ = ("cls",)
    cost = 8

    def __init__(self, cls):
        self.cls = cls

    def matches(self, root, el):
        return el.has_class(self.cls)


def _attr_value(el, key):
    if key.startswith("abs:"):
        return el.abs_url(key[4:])
    return el.attr(key)


def _has_attr(el, key):
    if key.startswith("abs:"):
        return bool(el.abs_url(key[4:]))
    return el.has_attr(key)  # ignore-case (Attributes.hasKeyIgnoreCase)


class HasAttr(Ev):
    __slots__ = ("key",)
    cost = 2

    def __init__(self, key):
        self.key = key

    def matches(self, root, el):
        return _has_attr(el, self.key)


class AttrStarting(Ev):
    __slots__ = ("prefix",)
    cost = 6

    def __init__(self, prefix):
        self.prefix = prefix

    def matches(self, root, el):
        p = self.prefix
        return any(k.lower().startswith(p) for k in el.attrs)



def _unquote_attr(value: str) -> str:
    """AttributeKeyPair quote stripping (Evaluator.java:426-431): a
    value wrapped in matching single or double quotes compares by its
    content ([data-x='a b'] == [data-x=a b])."""
    if len(value) > 1 and value[0] == value[-1] and value[0] in "'\"":
        return value[1:-1]
    return value

class AttrEq(Ev):
    __slots__ = ("key", "value")
    cost = 3

    def __init__(self, key, value):
        self.key = key
        self.value = _unquote_attr(value.strip()).lower()

    def matches(self, root, el):
        return _has_attr(el, self.key) and \
            _attr_value(el, self.key).lower() == self.value


class AttrNe(Ev):
    __slots__ = ("key", "value")
    cost = 3

    def __init__(self, key, value):
        self.key = key
        self.value = _unquote_attr(value.strip()).lower()

    def matches(self, root, el):
        return _attr_value(el, self.key).lower() != self.value


class AttrStartsWith(Ev):
    __slots__ = ("key", "value")
    cost = 4

    def __init__(self, key, value):
        self.key = key
        self.value = _unquote_attr(value.strip()).lower()

    def matches(self, root, el):
        return _has_attr(el, self.key) and \
            _attr_value(el, self.key).lower().startswith(self.value)


class AttrEndsWith(Ev):
    __slots__ = ("key", "value")
    cost = 4

    def __init__(self, key, value):
        self.key = key
        self.value = _unquote_attr(value.strip()).lower()

    def matches(self, root, el):
        return _has_attr(el, self.key) and \
            _attr_value(el, self.key).lower().endswith(self.value)


class AttrContains(Ev):
    __slots__ = ("key", "value")
    cost = 6

    def __init__(self, key, value):
        self.key = key
        self.value = _unquote_attr(value.strip()).lower()

    def matches(self, root, el):
        return _has_attr(el, self.key) and \
            self.value in _attr_value(el, self.key).lower()


class AttrMatches(Ev):
    __slots__ = ("key", "pattern")
    cost = 8

    def __init__(self, key, pattern):
        self.key = key
        self.pattern = pattern

    def matches(self, root, el):
        return _has_attr(el, self.key) and \
            self.pattern.search(_attr_value(el, self.key)) is not None


class And(Ev):
    __slots__ = ("evals",)

    def __init__(self, *evals):
        self.evals = sorted(evals, key=lambda e: e.cost)

    def add(self, ev):
        self.evals.append(ev)
        self.evals.sort(key=lambda e: e.cost)

    @property
    def cost(self):
        return sum(e.cost for e in self.evals)

    def matches(self, root, el):
        return all(e.matches(root, el) for e in self.evals)


class Or(Ev):
    __slots__ = ("evals",)

    def __init__(self, *evals):
        self.evals = list(evals)

    def add(self, ev):
        self.evals.append(ev)

    @property
    def cost(self):
        return max((e.cost for e in self.evals), default=5)

    def matches(self, root, el):
        return any(e.matches(root, el) for e in self.evals)


# --- structural ---

class Root(Ev):
    __slots__ = ()

    def matches(self, root, el):
        r = root.children[0] if isinstance(root, Document) and root.child_elements() else root
        if isinstance(root, Document):
            return el.parent is root or el is root
        return el is root


class Ancestor(Ev):
    __slots__ = ("inner",)
    cost = 40

    def __init__(self, inner):
        self.inner = inner

    def matches(self, root, el):
        if root is el:
            return False
        p = el.parent
        while p is not None:
            if self.inner.matches(root, p):
                return True
            if p is root:
                break
            p = p.parent
        return False


class ImmediateParentRun(Ev):
    """Fused > chains (StructuralEvaluator.java:217-264)."""
    __slots__ = ("evals",)
    cost = 20

    def __init__(self, first):
        self.evals = [first]

    def add(self, ev):
        self.evals.append(ev)

    def matches(self, root, el):
        if not self.evals[-1].matches(root, el):
            return False
        node = el
        for ev in reversed(self.evals[:-1]):
            if node is root:
                return False
            node = node.parent
            if node is None or not isinstance(node, Element):
                return False
            if not ev.matches(root, node):
                return False
        return True


def _prev_element_sibling(el):
    p = el.parent
    if p is None:
        return None
    prev = None
    for c in p.children:
        if c is el:
            return prev
        if isinstance(c, Element):
            prev = c
    return None


class ImmediatePreviousSibling(Ev):
    __slots__ = ("inner",)
    cost = 15

    def __init__(self, inner):
        self.inner = inner

    def matches(self, root, el):
        if root is el:
            return False
        prev = _prev_element_sibling(el)
        return prev is not None and self.inner.matches(root, prev)


class PreviousSibling(Ev):
    __slots__ = ("inner",)
    cost = 30

    def __init__(self, inner):
        self.inner = inner

    def matches(self, root, el):
        if root is el or el.parent is None:
            return False
        for c in el.parent.children:
            if c is el:
                break
            if isinstance(c, Element) and self.inner.matches(root, c):
                return True
        return False


class Has(Ev):
    __slots__ = ("inner", "check_siblings", "_local", "_memo_root", "_memo")
    cost = 50

    def __init__(self, inner):
        self.inner = inner
        # sibling-form :has(~ p) / :has(+ p): the inner evaluator's leftmost
        # is a Root() anchored combinator (StructuralEvaluator.java:80-127)
        self.check_siblings = _has_sibling_form(inner)
        # local predicates (no structural/root references) allow a one-pass
        # ancestor-marking memo per select() root instead of re-scanning each
        # candidate's subtree (the reference memoizes too,
        # StructuralEvaluator.java:32-46) — O(n) instead of O(n^2)
        self._local = not self.check_siblings and _is_local(inner)
        self._memo_root = None  # (generation, root) of the cached marking
        self._memo: set[int] | None = None

    def matches(self, root, el):
        if self.check_siblings:
            sib = el.next_sibling()
            while sib is not None:
                if isinstance(sib, Element) and self.inner.matches(el, sib):
                    return True
                sib = sib.next_sibling()
            return False
        if self._local:
            key = (_GENERATION[0], id(root))
            if self._memo_root != key:
                marked: set[int] = set()
                inner = self.inner
                for d in root.elements():
                    if inner.matches(root, d):
                        p = d.parent
                        while isinstance(p, Element):
                            pid = id(p)
                            if pid in marked:
                                break
                            marked.add(pid)
                            p = p.parent
                self._memo_root = key
                self._memo = marked
            return id(el) in self._memo
        for d in el.elements():
            if self.inner.matches(el, d):
                return True
        return False


_LOCAL_EV_TYPES = (
    AllElements, TagIs, TagStartsWith, TagEndsWith, IdIs, ClassIs, HasAttr,
    AttrStarting, AttrEq, AttrNe, AttrStartsWith, AttrEndsWith, AttrContains,
    AttrMatches,
)


def _is_local(ev) -> bool:
    """True if the evaluator depends only on the element itself (no
    ancestors/siblings/root/descendants), so :has can ancestor-mark."""
    if isinstance(ev, _LOCAL_EV_TYPES):
        return True
    if isinstance(ev, (And, Or)):
        return all(_is_local(e) for e in ev.evals)
    return False


def _has_sibling_form(inner) -> bool:
    """True if the :has() argument had a leading +/~ combinator (match among
    following siblings instead of descendants)."""
    ev = inner
    while isinstance(ev, And) and ev.evals:
        # leading-combinator forms compile to And(Sibling(Root), rest)
        for e in ev.evals:
            if isinstance(e, (ImmediatePreviousSibling, PreviousSibling)):
                anchor = e.inner
                if isinstance(anchor, Root):
                    return True
                if isinstance(anchor, And) and any(
                        isinstance(x, Root) for x in anchor.evals):
                    return True
        return False
    return False


class Is(Ev):
    __slots__ = ("inner",)
    cost = 20

    def __init__(self, inner):
        self.inner = inner

    def matches(self, root, el):
        return self.inner.matches(root, el)


class Not(Ev):
    __slots__ = ("inner",)
    cost = 20

    def __init__(self, inner):
        self.inner = inner

    def matches(self, root, el):
        return not self.inner.matches(root, el)


# --- index / type pseudos ---

def _element_sibling_index(el):
    p = el.parent
    if p is None:
        return 0
    i = 0
    for c in p.children:
        if c is el:
            return i
        if isinstance(c, Element):
            i += 1
    return 0


class IndexLessThan(Ev):
    __slots__ = ("idx",)

    def __init__(self, idx):
        self.idx = idx

    def matches(self, root, el):
        return root is not el and _element_sibling_index(el) < self.idx


class IndexGreaterThan(Ev):
    __slots__ = ("idx",)

    def __init__(self, idx):
        self.idx = idx

    def matches(self, root, el):
        return _element_sibling_index(el) > self.idx


class IndexEquals(Ev):
    __slots__ = ("idx",)

    def __init__(self, idx):
        self.idx = idx

    def matches(self, root, el):
        return _element_sibling_index(el) == self.idx


class IsFirstChild(Ev):
    __slots__ = ()

    def matches(self, root, el):
        # the ROOT element never matches the structural-child family:
        # the reference requires a non-Document parent (Evaluator.java
        # IsFirstChild/IsLastChild/CssNthEvaluator: p != null &&
        # !(p instanceof Document)) — html:first-child is empty
        p = el.parent
        return (p is not None and not isinstance(p, Document)
                and _element_sibling_index(el) == 0
                and any(isinstance(c, Element) for c in p.children))


class IsLastChild(Ev):
    __slots__ = ()

    def matches(self, root, el):
        p = el.parent
        if p is None or isinstance(p, Document):
            return False
        els = [c for c in p.children if isinstance(c, Element)]
        return bool(els) and els[-1] is el


class CssNth(Ev):
    __slots__ = ("step", "offset", "last", "of_type")

    def __init__(self, step, offset, last=False, of_type=False):
        self.step = step
        self.offset = offset
        self.last = last
        self.of_type = of_type

    def _pos(self, el):
        p = el.parent
        if p is None:
            return 1
        if self.of_type:
            sibs = [c for c in p.children
                    if isinstance(c, Element) and c.name == el.name]
        else:
            sibs = [c for c in p.children if isinstance(c, Element)]
        idx = next(i for i, c in enumerate(sibs) if c is el)
        return (len(sibs) - idx) if self.last else (idx + 1)

    def matches(self, root, el):
        if el.parent is None or isinstance(el.parent, Document):
            return False
        pos = self._pos(el)
        if self.step == 0:
            return pos == self.offset
        return (pos - self.offset) * self.step >= 0 and \
            (pos - self.offset) % self.step == 0


class IsFirstOfType(CssNth):
    __slots__ = ()

    def __init__(self):
        super().__init__(0, 1, False, True)


class IsLastOfType(CssNth):
    __slots__ = ()

    def __init__(self):
        super().__init__(0, 1, True, True)


class IsOnlyChild(Ev):
    __slots__ = ()

    def matches(self, root, el):
        p = el.parent
        return (p is not None and not isinstance(p, Document)
                and sum(1 for c in p.children if isinstance(c, Element)) == 1)


class IsOnlyOfType(Ev):
    __slots__ = ()

    def matches(self, root, el):
        p = el.parent
        if p is None or isinstance(p, Document):
            return False
        return sum(1 for c in p.children
                   if isinstance(c, Element) and c.name == el.name) == 1


class IsEmpty(Ev):
    __slots__ = ()

    def matches(self, root, el):
        # blank text nodes / comments etc. don't count as content
        # (Evaluator.java:779 family)
        for c in el.children:
            if isinstance(c, TextNode):
                if not c.is_blank():
                    return False
            elif isinstance(c, Element):
                return False
        return True


class IsRoot(Ev):
    __slots__ = ()

    def matches(self, root, el):
        r = root.children[0] if isinstance(root, Document) else root
        # first element child of the document, or the query root
        if isinstance(root, Document):
            for c in root.children:
                if isinstance(c, Element):
                    return el is c
            return False
        return el is r


# --- text pseudos ---

class ContainsText(Ev):
    __slots__ = ("text",)
    cost = 10

    def __init__(self, text):
        self.text = text.lower()

    def matches(self, root, el):
        return self.text in el.text().lower()


class ContainsOwnText(Ev):
    __slots__ = ("text",)

    def __init__(self, text):
        self.text = text.lower()

    def matches(self, root, el):
        return self.text in el.own_text().lower()


class ContainsWholeText(Ev):
    __slots__ = ("text",)
    cost = 10

    def __init__(self, text):
        self.text = text

    def matches(self, root, el):
        return self.text in el.whole_text()


class ContainsWholeOwnText(Ev):
    __slots__ = ("text",)

    def __init__(self, text):
        self.text = text

    def matches(self, root, el):
        return self.text in el.whole_own_text()


class ContainsData(Ev):
    __slots__ = ("text",)

    def __init__(self, text):
        self.text = text.lower()

    def matches(self, root, el):
        return self.text in el.data().lower()


class MatchesText(Ev):
    __slots__ = ("pattern",)
    cost = 8

    def __init__(self, pattern):
        self.pattern = pattern

    def matches(self, root, el):
        return self.pattern.search(el.text()) is not None


class MatchesOwn(Ev):
    __slots__ = ("pattern",)

    def __init__(self, pattern):
        self.pattern = pattern

    def matches(self, root, el):
        return self.pattern.search(el.own_text()) is not None


class MatchesWholeText(Ev):
    __slots__ = ("pattern",)

    def __init__(self, pattern):
        self.pattern = pattern

    def matches(self, root, el):
        return self.pattern.search(el.whole_text()) is not None


class MatchesWholeOwnText(Ev):
    __slots__ = ("pattern",)

    def __init__(self, pattern):
        self.pattern = pattern

    def matches(self, root, el):
        return self.pattern.search(el.whole_own_text()) is not None


class MatchText(Ev):
    """Deprecated :matchText (Evaluator.java:1051-1090). cost -1 forces
    first evaluation inside And: matching any real element WRAPS each of
    its direct TextNode children in a PseudoTextElement bearing the
    element's tag name and attributes (in place — tree mutation persists,
    as in the reference), then returns False; only PseudoTextElements
    match. The lazy select() traversal then visits the new pseudo
    elements, where the rest of the evaluator chain (tag/class/structural
    pseudos/sibling combinators) applies to them."""
    __slots__ = ()
    cost = -1  # "forces first evaluation, which prepares the DOM"

    def matches(self, root, el):
        if isinstance(el, PseudoTextElement):
            return True
        kids = el.children
        for i, c in enumerate(kids):
            # CDataNode extends TextNode, matching Element.textNodes()
            if isinstance(c, TextNode):
                # copy_attrs keeps the preserved-case/collision marker
                # (plain-dict attr() fast path invariant, r9)
                pel = PseudoTextElement(el.name, el.ns, copy_attrs(el.attrs))
                pel.tag_name_case = el.tag_name_case
                pel.parent = el
                kids[i] = pel
                c.parent = pel
                pel.children.append(c)
        return False


# --- node evaluators (::text etc; select_nodes API) ---

class NodeInstance(Ev):
    __slots__ = ("cls",)

    def __init__(self, cls):
        self.cls = cls

    def matches_node(self, node):
        return isinstance(node, self.cls)

    def matches(self, root, el):
        return isinstance(el, self.cls)


class NodeContains(Ev):
    __slots__ = ("text",)

    def __init__(self, text):
        self.text = text.lower()

    def matches_node(self, node):
        v = getattr(node, "value", "")
        return self.text in v.lower()

    matches = matches_node  # type: ignore


class NodeMatches(Ev):
    __slots__ = ("pattern",)

    def __init__(self, pattern):
        self.pattern = pattern

    def matches_node(self, node):
        return self.pattern.search(getattr(node, "value", "")) is not None

    matches = matches_node  # type: ignore


class NodeBlank(Ev):
    __slots__ = ()

    def matches_node(self, node):
        v = getattr(node, "value", "")
        return not v.strip()

    matches = matches_node  # type: ignore


_NODE_CLASSES = {
    "node": Node,
    "leafnode": LeafNode,
    "text": TextNode,
    "comment": CommentNode,
    "data": DataNode,
    "cdata": CDataNode,
}


# ---------------------------------------------------------------- parser

_COMBINATORS = ">+~"
_SEQUENCE_ENDERS = ",)"
_ATTRIBUTE_EVALS = ("=", "!=", "^=", "$=", "*=", "~=")


class QueryParser:
    def __init__(self, query: str):
        self.query = query.strip()
        self.tq = _TQ(self.query)
        self.in_node_context = False

    def parse(self) -> Ev:
        ev = self.parse_selector_group()
        self.tq.consume_whitespace()
        if not self.tq.is_empty():
            raise SelectorParseError(
                f"Could not parse query {self.query!r}: unexpected token at "
                f"{self.tq.remainder()!r}")
        return ev

    def parse_selector_group(self) -> Ev:
        left = self.parse_selector()
        while self.tq.match_chomp(","):
            right = self.parse_selector()
            left = _or(left, right)
        return left

    def parse_selector(self) -> Ev:
        tq = self.tq
        tq.consume_whitespace()
        if tq.matches_any(_COMBINATORS):
            left = Root()
        else:
            left = self.parse_simple_sequence()
        while True:
            combinator = ""
            if tq.consume_whitespace():
                combinator = " "
            if tq.matches_any(_COMBINATORS):
                combinator = tq.consume()
            elif tq.matches_any(_SEQUENCE_ENDERS):
                break
            if combinator:
                right = self.parse_simple_sequence()
                left = _combine(left, combinator, right)
            else:
                break
        return left

    def parse_simple_sequence(self) -> Ev:
        tq = self.tq
        left = None
        tq.consume_whitespace()
        if tq.matches_word() or tq.matches("*|"):
            left = self.by_tag()
        elif tq.match_chomp("*"):
            left = AllElements()
        while True:
            right = self.parse_subclass()
            if right is not None:
                left = _and(left, right)
            else:
                break
        if left is None:
            raise SelectorParseError(
                f"Could not parse query {self.query!r}: unexpected token at "
                f"{tq.remainder()!r}")
        return left

    def parse_subclass(self):
        tq = self.tq
        if tq.match_chomp("#"):
            return IdIs(tq.consume_css_identifier())
        if tq.match_chomp("."):
            return ClassIs(tq.consume_css_identifier().strip())
        if tq.matches("["):
            return self.by_attribute()
        if tq.match_chomp("::"):
            return self.parse_node_selector()
        if tq.match_chomp(":"):
            return self.parse_pseudo()
        return None

    def by_tag(self) -> Ev:
        name = self.tq.consume_element_selector().strip().lower()
        if not name:
            raise SelectorParseError("empty tag selector")
        if name.startswith("*|"):
            plain = name[2:]
            return Or(TagIs(plain), TagEndsWith(":" + plain))
        if name.endswith("|*"):
            return TagStartsWith(name[:-2] + ":")
        if "|" in name:
            name = name.replace("|", ":")
        return TagIs(name)

    def by_attribute(self) -> Ev:
        contents = self.tq.chomp_balanced("[", "]")
        cq = _TQ(contents)
        key = cq.consume_to_any(_ATTRIBUTE_EVALS).strip().lower()
        if not key:
            raise SelectorParseError("empty attribute key")
        cq.consume_whitespace()
        if cq.is_empty():
            if key.startswith("^"):
                return AttrStarting(key[1:])
            if key == "*":
                return AttrStarting("")
            return HasAttr(key)
        if cq.match_chomp("!="):
            return AttrNe(key, cq.remainder())
        if cq.match_chomp("^="):
            return AttrStartsWith(key, cq.remainder())
        if cq.match_chomp("$="):
            return AttrEndsWith(key, cq.remainder())
        if cq.match_chomp("*="):
            return AttrContains(key, cq.remainder())
        if cq.match_chomp("~="):
            return AttrMatches(key, _compile_user_regex(cq.remainder()))
        if cq.match_chomp("="):
            return AttrEq(key, cq.remainder())
        raise SelectorParseError(f"Could not parse attribute query: {contents!r}")

    def _parens(self) -> str:
        return self.tq.chomp_balanced("(", ")")

    def _index(self) -> int:
        s = self._parens().strip()
        if not s.isdigit():
            raise SelectorParseError("Index must be numeric")
        return int(s)

    _NTH_STEP = re.compile(r"(([+-])?(\d+)?)n(\s*([+-])?\s*\d+)?", re.I)
    _NTH_OFF = re.compile(r"([+-])?(\d+)")

    def _nth(self, last, of_type) -> Ev:
        arg = self._parens().strip().lower()
        if arg == "odd":
            step, offset = 2, 1
        elif arg == "even":
            step, offset = 2, 0
        else:
            m = self._NTH_STEP.fullmatch(arg)
            if m:
                if m.group(3) is not None:
                    step = int(m.group(1).lstrip("+"))
                else:
                    step = -1 if m.group(2) == "-" else 1
                offset = int(m.group(4).replace(" ", "").lstrip("+")) \
                    if m.group(4) is not None else 0
            else:
                m = self._NTH_OFF.fullmatch(arg)
                if not m:
                    raise SelectorParseError(f"Could not parse nth-index {arg!r}")
                step = 0
                offset = int(m.group().lstrip("+"))
        return CssNth(step, offset, last, of_type)

    def _nested(self, factory) -> Ev:
        if not self.tq.match_chomp("("):
            raise SelectorParseError("expected (selector)")
        inner = self.parse_selector_group()
        if not self.tq.match_chomp(")"):
            raise SelectorParseError("expected )")
        return factory(inner)

    def parse_pseudo(self) -> Ev:
        p = self.tq.consume_css_identifier()
        if p == "lt":
            return IndexLessThan(self._index())
        if p == "gt":
            return IndexGreaterThan(self._index())
        if p == "eq":
            return IndexEquals(self._index())
        if p == "has":
            return self._nested(Has)
        if p == "is":
            return self._nested(Is)
        if p == "contains":
            return self._contains(False)
        if p == "containsOwn":
            return self._contains(True)
        if p == "containsWholeText":
            t = tq_unescape(self._parens())
            return ContainsWholeText(t)
        if p == "containsWholeOwnText":
            t = tq_unescape(self._parens())
            return ContainsWholeOwnText(t)
        if p == "containsData":
            return ContainsData(tq_unescape(self._parens()))
        if p == "matches":
            return self._matches(False)
        if p == "matchesOwn":
            return self._matches(True)
        if p == "matchesWholeText":
            return MatchesWholeText(_compile_user_regex(self._parens()))
        if p == "matchesWholeOwnText":
            return MatchesWholeOwnText(_compile_user_regex(self._parens()))
        if p == "not":
            sub = self._parens()
            return Not(QueryParser(sub).parse())
        if p == "nth-child":
            return self._nth(False, False)
        if p == "nth-last-child":
            return self._nth(True, False)
        if p == "nth-of-type":
            return self._nth(False, True)
        if p == "nth-last-of-type":
            return self._nth(True, True)
        if p == "first-child":
            return IsFirstChild()
        if p == "last-child":
            return IsLastChild()
        if p == "first-of-type":
            return IsFirstOfType()
        if p == "last-of-type":
            return IsLastOfType()
        if p == "only-child":
            return IsOnlyChild()
        if p == "only-of-type":
            return IsOnlyOfType()
        if p == "empty":
            return IsEmpty()
        if p == "blank":
            return NodeBlank()
        if p == "root":
            return IsRoot()
        if p == "matchText":
            return MatchText()
        raise SelectorParseError(f"unknown pseudo :{p}")

    def _contains(self, own: bool) -> Ev:
        text = tq_unescape(self._parens())
        if not text:
            raise SelectorParseError(":contains(text) must not be empty")
        if self.in_node_context:
            return NodeContains(text)
        return ContainsOwnText(text) if own else ContainsText(text)

    def _matches(self, own: bool) -> Ev:
        regex = self._parens()
        if not regex:
            raise SelectorParseError(":matches(regex) must not be empty")
        pattern = _compile_user_regex(regex)
        if self.in_node_context:
            return NodeMatches(pattern)
        return MatchesOwn(pattern) if own else MatchesText(pattern)

    def parse_node_selector(self) -> Ev:
        p = self.tq.consume_css_identifier()
        cls = _NODE_CLASSES.get(p)
        if cls is None:
            raise SelectorParseError(f"unknown node type ::{p}")
        self.in_node_context = True
        left: Ev = NodeInstance(cls)
        while True:
            right = self.parse_subclass()
            if right is None:
                break
            left = _and(left, right)
        self.in_node_context = False
        return left


def _or(left, right):
    if isinstance(left, Or):
        left.add(right)
        return left
    return Or(left, right)


def _and(left, right):
    if left is None:
        return right
    if isinstance(left, And):
        left.add(right)
        return left
    return And(left, right)


def _combine(left, combinator, right):
    if combinator == ">":
        run = left if isinstance(left, ImmediateParentRun) \
            else ImmediateParentRun(left)
        run.add(right)
        return run
    if combinator == " ":
        return _and(Ancestor(left), right)
    if combinator == "+":
        return _and(ImmediatePreviousSibling(left), right)
    if combinator == "~":
        return _and(PreviousSibling(left), right)
    raise SelectorParseError(f"unknown combinator {combinator!r}")


# select()-call generation: scopes :has memos to one traversal so document
# mutation between selects can never serve stale marks
_GENERATION = [0]

_QUERY_CACHE: dict[str, Ev] = {}


def compile_query(query: str) -> Ev:
    ev = _QUERY_CACHE.get(query)
    if ev is None:
        ev = QueryParser(query).parse()
        if len(_QUERY_CACHE) < 2048:
            _QUERY_CACHE[query] = ev
    return ev


def select(root, query_or_ev) -> list[Element]:
    """All matching elements under (and including) root, document order."""
    ev = compile_query(query_or_ev) if isinstance(query_or_ev, str) \
        else query_or_ev
    _GENERATION[0] += 1
    out = []
    if ev.matches(root, root):
        out.append(root)
    for el in root.elements():
        if ev.matches(root, el):
            out.append(el)
    return out


def select_multi(query_or_ev, roots) -> list[Element]:
    """Selector.select(query, roots) (Selector.java:180-194): matches
    across multiple roots, deduplicated by identity (overlapping
    hierarchies yield each element once), per-root document order."""
    ev = compile_query(query_or_ev) if isinstance(query_or_ev, str) \
        else query_or_ev
    seen: set[int] = set()
    out: list[Element] = []
    for root in roots:
        for el in select(root, ev):
            if id(el) not in seen:
                seen.add(id(el))
                out.append(el)
    return out


def filter_out(elements, outs) -> list[Element]:
    """Selector.filterOut (Selector.java:197-211): elements minus outs,
    identity equality, input order preserved."""
    out_ids = {id(o) for o in outs}
    return [el for el in elements if id(el) not in out_ids]


def elements_not(elements, query: str) -> list[Element]:
    """Elements.not(query) (Elements.java:482-485): remove from this list
    any element matching the query when evaluated across the list's
    elements as roots."""
    matched = select_multi(query, elements)
    return filter_out(elements, matched)


def select_first(root, query_or_ev):
    ev = compile_query(query_or_ev) if isinstance(query_or_ev, str) \
        else query_or_ev
    _GENERATION[0] += 1
    if ev.matches(root, root):
        return root
    for el in root.elements():
        if ev.matches(root, el):
            return el
    return None


def select_nodes(root, query_or_ev) -> list[Node]:
    """selectNodes: typed leaf-node selection (::text etc)."""
    ev = compile_query(query_or_ev) if isinstance(query_or_ev, str) \
        else query_or_ev
    out = []
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, Element):
            stack.extend(reversed(n.children))
        if n is root:
            continue
        if _node_matches(ev, root, n):
            out.append(n)
    return out


def _node_matches(ev, root, node) -> bool:
    if isinstance(ev, And):
        return all(_node_matches(e, root, node) for e in ev.evals)
    if isinstance(ev, Or):
        return any(_node_matches(e, root, node) for e in ev.evals)
    if hasattr(ev, "matches_node"):
        return ev.matches_node(node)
    # element-level predicates apply to the node's parent element
    parent = node if isinstance(node, Element) else node.parent
    if parent is None:
        return False
    return ev.matches(root, parent)
