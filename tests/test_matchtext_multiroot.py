"""Exact :matchText semantics, multi-root select, and Elements.not —
cases ported from the reference's SelectorTest.java:992-1041 and
ElementsTest.java:258-267."""

from jsoup_spark.clean.serializer import OutputSettings, outer_html
from jsoup_spark.parser.nodes import PseudoTextElement
from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.select.selector import elements_not, select, select_multi


def _plain(doc):
    return outer_html(doc, OutputSettings(pretty=False))


def test_match_text():
    # SelectorTest.java:992-1007
    doc = parse("<p>One<br>Two</p>")
    orig_html = _plain(doc)

    one = select(doc, "p:matchText:first-child")
    assert one and one[0].text() == "One"

    two = select(doc, "p:matchText:last-child")
    assert two and two[0].text() == "Two"

    # pseudo wrapping persists but serializes invisibly
    assert _plain(doc) == orig_html

    star = select(doc, "p:matchText + br + *")
    assert " ".join(e.text() for e in star) == "Two"


def test_split_on_br():
    # SelectorTest.java:1015-1024
    doc = parse("<div><p>One<br>Two<br>Three</p></div>")
    els = select(doc, "p:matchText")
    assert len(els) == 3
    assert els[0].text() == "One"
    assert els[1].text() == "Two"
    assert outer_html(els[2]) == "Three"
    assert all(isinstance(e, PseudoTextElement) for e in els)


def test_match_text_attributes():
    # SelectorTest.java:1026-1032
    doc = parse("<div><p class=one>One<br>Two<p class=two>Three<br>Four")
    els = select(doc, "p.two:matchText:last-child")
    assert len(els) == 1
    assert els[0].text() == "Four"


def test_find_between_span():
    # SelectorTest.java:1034-1041
    doc = parse("<p><span>One</span> Two <span>Three</span>")
    els = select(doc, "span ~ p:matchText")
    assert len(els) == 1
    assert els[0].text() == "Two"


def test_elements_not():
    # ElementsTest.java:258-267
    doc = parse("<div id=1><p>One</p></div> "
                "<div id=2><p><span>Two</span></p></div>")
    divs = select(doc, "div")

    div1 = elements_not(divs, ":has(p > span)")
    assert len(div1) == 1
    assert div1[0].attr("id") == "1"

    div2 = elements_not(divs, "#1")
    assert len(div2) == 1
    assert div2[0].attr("id") == "2"


def test_multi_root_dedupe():
    # Selector.select(query, roots) dedupes overlapping hierarchies by
    # identity (Selector.java:180-194)
    doc = parse("<div id=outer><div id=inner><p>x</p></div></div>")
    outer = select(doc, "#outer")[0]
    inner = select(doc, "#inner")[0]
    ps = select_multi("p", [outer, inner])
    assert len(ps) == 1
    # per-root document order, first-seen wins
    both = select_multi("div, p", [outer, inner])
    assert [e.attr("id") or e.name for e in both] == ["outer", "inner", "p"]


def test_multi_root_includes_roots():
    doc = parse("<div class=logo>One</div><div>Two</div>")
    divs = select(doc, "div")
    kept = elements_not(divs, ".logo")
    assert len(kept) == 1 and kept[0].text() == "Two"
