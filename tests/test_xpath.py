"""XPath subset parity tests, encoding the reference's select/XpathTest.java
assertions (file:line cited per test) against jsoup_spark.select.xpath."""
import pytest

from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.parser.xmlbuilder import parse_xml
from jsoup_spark.select.selector import SelectorParseError, select_first
from jsoup_spark.select.xpath import select_xpath, select_xpath_nodes


def test_supports_xpath():
    # XpathTest.java:28-36
    doc = parse("<body><div><p>One</div><div><p>Two</div><div>Three</div>")
    els = select_xpath(doc, "//div/p")
    assert len(els) == 2
    assert els[0].text() == "One"
    assert els[1].text() == "Two"


def test_supports_xpath_from_element():
    # XpathTest.java:39-54
    doc = parse("<body><div><p>One</div><div><p>Two</div><div>Three</div>")
    div = select_first(doc, "div")
    assert div is not None
    w3c_div = select_xpath(div, ".")[0]
    assert w3c_div is div

    els = select_xpath(div, "p")
    assert len(els) == 1
    assert els[0].text() == "One"
    assert els[0].name == "p"

    # the whole document is visible on the div context
    assert len(select_xpath(div, "//body")) == 1
    assert len(select_xpath(doc, "//body")) == 1


def test_empty_elements_if_no_results():
    # XpathTest.java:57-60
    doc = parse("<p>One<p>Two")
    assert select_xpath(doc, "//div") == []


def test_throws_select_exception():
    # XpathTest.java:62-80
    doc = parse("<p>One<p>Two")
    with pytest.raises(SelectorParseError) as exc:
        select_xpath(doc, "//???")
    assert str(exc.value).startswith("Could not evaluate XPath query [//???]:")


def test_supports_localname():
    # XpathTest.java:82-90
    xhtml = "<html xmlns='http://www.w3.org/1999/xhtml'><body id='One'><div>hello</div></body></html>"
    doc = parse_xml(xhtml)
    els = select_xpath(doc, "//*[local-name()='body']")
    assert len(els) == 1
    assert els[0].id == "One"


def test_not_namespace_aware_body():
    # XpathTest.java:199-206 — name test matches local name in XML mode
    xhtml = "<html xmlns='http://www.w3.org/1999/xhtml'><body id='One'><div>hello</div></body></html>"
    doc = parse_xml(xhtml)
    els = select_xpath(doc, "//body")
    assert len(els) == 1
    assert els[0].id == "One"


CSS_XPATH_EQUIV = [
    ("DIV", "//div"),
    ("div > p.foo", "//div/p[@class]"),
    ("div + div", "//div/following-sibling::div[1]"),
    ("p:containsOwn(Hello)", '//p[contains(text(),"Hello")]'),
]


@pytest.mark.parametrize("css,xpath", CSS_XPATH_EQUIV)
def test_css_and_xpath_equivalents(css, xpath):
    # XpathTest.java:104-126
    from jsoup_spark.select.selector import select

    doc = parse("<div id=1><div id=2><p class=foo>Hello</p></div></div><DIV id=3>")
    from_css = select(doc, css)
    from_xpath = select_xpath(doc, xpath)
    assert len(from_css) >= 1
    assert from_css == from_xpath  # same size, order, identity


def test_can_select_text_nodes():
    # XpathTest.java:129-146
    doc = parse("<div><p>One<p><a>Two</a><p>Three and some more")
    nodes = select_xpath_nodes(doc, "//body//p//text()")
    assert [n.value for n in nodes] == ["One", "Two", "Three and some more"]


def test_select_by_attribute():
    # XpathTest.java:148-155
    doc = parse("<p><a href='/foo'>Foo</a><a href='/bar'>Bar</a><a>None</a>")
    hrefs = [e.attr("href") for e in select_xpath(doc, "//a[@href]")]
    assert hrefs == ["/foo", "/bar"]


def test_select_outside_of_element_tree():
    # XpathTest.java:157-170
    doc = parse("<p>One<p>Two<p>Three")
    ps = select_xpath(doc, "//p")
    assert len(ps) == 3
    p1 = ps[0]
    assert p1.text() == "One"
    sibs = select_xpath(p1, "following-sibling::p")
    assert [s.text() for s in sibs] == ["Two", "Three"]


def test_select_ancestors_on_context_element():
    # XpathTest.java:172-181 (jhy/jsoup#1652)
    doc = parse("<div><p>Hello")
    p = select_first(doc, "p")
    chain = select_xpath(p, "ancestor-or-self::*")
    assert [e.name for e in chain] == ["html", "body", "div", "p"]


def test_supports_prefixes():
    # XpathTest.java:208-237 — prefixed names match by local name;
    # name() keeps the prefix, local-name() strips it
    xml = (
        '<?xml version="1.0"?>\n'
        "<bk:book xmlns:bk='urn:loc.gov:books'\n"
        "         xmlns:isbn='urn:ISBN:0-395-36341-6'>\n"
        "    <bk:title>Cheaper by the Dozen</bk:title>\n"
        "    <isbn:number>1568491379</isbn:number>\n"
        "</bk:book>"
    )
    doc = parse_xml(xml)
    els = select_xpath(doc, "//book/title")
    assert len(els) == 1
    assert els[0].text() == "Cheaper by the Dozen"

    by_prefix = select_xpath(doc, "//*[name()='bk:book']/*[name()='bk:title']")
    assert len(by_prefix) == 1
    assert by_prefix[0].text() == "Cheaper by the Dozen"

    by_local = select_xpath(doc, "//*[local-name()='book']/*[local-name()='title']")
    assert len(by_local) == 1

    isbn = select_xpath(doc, "//book/number")
    assert len(isbn) == 1
    assert isbn[0].text() == "1568491379"


def test_with_semi_in_attribute_name():
    # XpathTest.java:239-244 (jhy/jsoup#2244)
    doc = parse('<div grading?&quot;=foo>One</div>')
    assert len(select_xpath(doc, "//div")) == 1


# --- subset coverage beyond the reference's test file ---------------------

def test_positional_and_last():
    doc = parse("<ul><li>a<li>b<li>c</ul>")
    assert [e.text() for e in select_xpath(doc, "//li[1]")] == ["a"]
    assert [e.text() for e in select_xpath(doc, "//li[last()]")] == ["c"]
    assert [e.text() for e in select_xpath(doc, "//li[position()>1]")] == ["b", "c"]


def test_union_and_parent():
    doc = parse("<div><p>One</p><span>Two</span></div>")
    els = select_xpath(doc, "//p | //span")
    assert [e.name for e in els] == ["p", "span"]
    assert select_xpath(doc, "//p/..")[0].name == "div"


def test_attr_value_and_functions():
    doc = parse("<a href='http://x/a'>A</a><a href='/b'>B</a>")
    assert [e.text() for e in select_xpath(doc, "//a[@href='/b']")] == ["B"]
    assert [e.text() for e in select_xpath(doc, "//a[starts-with(@href,'http')]")] == ["A"]
    assert [e.text() for e in select_xpath(doc, "//a[not(starts-with(@href,'http'))]")] == ["B"]
    assert [e.text() for e in select_xpath(doc, "//*[count(a)=2]")][:1] == ["AB"]


def test_nested_relative_path_predicate():
    doc = parse("<div><span>x</span></div><div><p>y</p></div>")
    assert [e.text() for e in select_xpath(doc, "//div[span]")] == ["x"]
    assert [e.text() for e in select_xpath(doc, "//div[.//p]")] == ["y"]


def test_descendant_or_self_abbrev_mid_path():
    doc = parse("<div><section><p>deep</p></section></div>")
    assert [e.text() for e in select_xpath(doc, "//div//p")] == ["deep"]


def test_comment_and_normalize_space():
    doc = parse("<div><!-- note --><p>  padded   text </p></div>")
    comments = select_xpath_nodes(doc, "//div/comment()")
    assert len(comments) == 1 and comments[0].value == " note "
    assert [e.text() for e in select_xpath(doc, "//p[normalize-space()='padded text']")] == [
        "padded text"
    ]
