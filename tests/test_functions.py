"""Collection/accessor function tests (Elements surface, cssSelector,
formData)."""

from jsoup_spark.extract import functions as fn
from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.select.selector import select


DOC = parse("""
<div id=wrap>
  <p class=one>alpha</p>
  <p class=one>beta</p>
  <p id=last href-ish>gamma</p>
  <a href='/a'>1</a><a href='/b' title=T>2</a><a>3</a>
</div>
<form id=f action=/go>
  <input name=q value=search>
  <input type=checkbox name=cb value=x checked>
  <input type=checkbox name=cb2 value=y>
  <input type=radio name=r value=r1>
  <input name=nameless-ignored>
  <input name=dis value=no disabled>
  <select name=s><option value=o1>One<option value=o2 selected>Two</select>
  <select name=s2><option>First<option>Second</select>
  <textarea name=t>raw text</textarea>
  <input type=submit name=go value=Go>
</form>
""", "http://x.example/base/")


def test_each_text_attr():
    ps = select(DOC, "p")
    assert fn.each_text(ps) == ["alpha", "beta", "gamma"]
    links = select(DOC, "a")
    assert fn.each_attr(links, "href") == ["/a", "/b"]
    assert fn.each_attr(links, "abs:href") == [
        "http://x.example/a", "http://x.example/b"]
    assert fn.first_attr(links, "title") == "T"
    assert fn.elements_text(ps) == "alpha beta gamma"


def test_css_selector_unique():
    last = select(DOC, "#last")[0]
    assert fn.css_selector(last) == "#last"
    betas = select(DOC, "p.one")
    sel = fn.css_selector(betas[1])
    assert select(DOC, sel) == [betas[1]]
    anons = select(DOC, "a")
    for a in anons:
        assert select(DOC, fn.css_selector(a)) == [a]


def test_form_data():
    form = fn.forms(DOC)[0]
    data = dict(fn.form_data(form))
    assert data["q"] == "search"
    assert data["cb"] == "x"
    assert "cb2" not in data
    assert "r" not in data  # unchecked radio
    assert "dis" not in data  # disabled
    assert data["s"] == "o2"
    assert data["s2"] == "First"  # first-option fallback, text value
    assert data["t"] == "raw text"
    assert "go" not in data  # submit excluded


def test_entities_escape_modes():
    """EntitiesTest.java:13-52 — Entities.escape across escape modes and
    charsets (expected strings verbatim; full-table equality verified
    differentially against the compiled reference, 1453 cps x 6 configs)."""
    from jsoup_spark.parser.entities import escape_full, unescape
    text = "Hello &<> Å å π 新 there ¾ © » ' \""
    ea = escape_full(text, "ascii", "base")
    ef = escape_full(text, "ascii", "extended")
    ex = escape_full(text, "ascii", "xhtml")
    uf = escape_full(text, "utf-8", "extended")
    assert ea == ("Hello &amp;&lt;&gt; &Aring; &aring; &#x3c0; &#x65b0; "
                  "there &frac34; &copy; &raquo; &apos; &quot;")
    assert ef == ("Hello &amp;&lt;&gt; &angst; &aring; &pi; &#x65b0; "
                  "there &frac34; &copy; &raquo; &apos; &quot;")
    assert ex == ("Hello &amp;&lt;&gt; &#xc5; &#xe5; &#x3c0; &#x65b0; "
                  "there &#xbe; &#xa9; &#xbb; &#x27; &quot;")
    assert uf == "Hello &amp;&lt;&gt; Å å π 新 there ¾ © » &apos; &quot;"
    # round trips (EntitiesTest escape() tail)
    for esc in (ea, ef, ex, uf):
        assert unescape(esc) == text
    # escapedSupplementary (EntitiesTest.java:44-52)
    supp = "\U0001D559"
    assert escape_full(supp, "ascii", "base") == "&#x1d559;"
    assert escape_full(supp, "ascii", "extended") == "&hopf;"
    assert escape_full(supp, "utf-8", "extended") == supp

