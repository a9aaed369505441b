"""Main-content DOM heuristics (extract/maincontent.py)."""

from jsoup_spark import parse
from jsoup_spark.extract.maincontent import (
    extract_main, main_content_stage, score_document)

LONG = ("This is a long sentence of real article prose, with commas, "
        "clauses, and enough characters to register as content mass. ")


def _page(middle: str) -> str:
    return f"""<html><head><title>t</title></head><body>
    <div class="nav"><a href="/">Home</a> <a href="/b">Blog</a>
      <a href="/c">Contact</a></div>
    {middle}
    <div class="sidebar"><a href="/x">Link one here</a>
      <a href="/y">Link two here</a> <a href="/z">Link three</a></div>
    <div class="footer"><a href="/p">Privacy</a> copyright notice</div>
    </body></html>"""


def test_obvious_article_class_wins():
    html = _page(f'<div class="post-content"><p>{LONG}</p>'
                 f'<p>{LONG}</p></div>')
    r = extract_main(parse(html))
    assert r["el_class"] == "post-content"
    assert LONG.strip() in r["text"]
    assert "Privacy" not in r["text"]
    assert "Home" not in r["text"]


def test_neutral_classes_content_wins_by_mass():
    # no helpful class names anywhere: text mass + link density decide
    html = _page(f'<div class="c1"><p>{LONG * 3}</p><p>{LONG * 2}</p>'
                 f'</div>')
    r = extract_main(parse(html))
    assert r["el_class"] == "c1"
    assert "copyright" not in r["text"]


def test_link_farm_loses_despite_mass():
    farm_links = "".join(
        f'<li><a href="/l{i}">{LONG[:40]} more linked text {i}</a></li>'
        for i in range(12))
    html = _page(
        f'<div class="c2"><ul>{farm_links}</ul></div>'
        f'<div class="c3"><p>{LONG * 2}</p></div>')
    r = extract_main(parse(html))
    assert r["el_class"] == "c3"


def test_negative_class_penalised():
    html = _page(
        f'<div class="comments"><p>{LONG}</p><p>{LONG}</p></div>'
        f'<div class="c4"><p>{LONG}</p><p>{LONG}</p></div>')
    r = extract_main(parse(html))
    assert r["el_class"] == "c4"


def test_td_content():
    html = _page(f'<table><tr><td class="c5">{LONG * 2}</td>'
                 f'<td><a href="/m">menu menu menu</a></td></tr></table>')
    r = extract_main(parse(html))
    assert LONG.strip() in r["text"]


def test_tiny_page_falls_back_to_body():
    r = extract_main(parse("<html><body><p>short</p></body></html>"))
    assert r["tag"] == "body"
    assert r["text"] == "short"
    assert r["score_e3"] == 0


def test_empty_doc():
    r = extract_main(parse(""))
    assert r["text"] == ""


def test_deterministic_tie_break_doc_order():
    block = f'<p>{LONG}</p>'
    html = _page(f'<div class="c6">{block}</div>'
                 f'<div class="c7">{block}</div>')
    r1 = extract_main(parse(html))
    assert r1["el_class"] == "c6"          # equal scores: first wins
    ranked = score_document(parse(html))
    classes = [el.attr("class") for el, _ in ranked]
    assert classes.index("c6") < classes.index("c7")


def test_grandparent_half_credit():
    html = _page(
        '<div class="wrap"><div class="inner">'
        f'<p>{LONG}</p><p>{LONG}</p></div></div>')
    ranked = {el.attr("class"): s for el, s in
              score_document(parse(html))}
    assert ranked["inner"] > ranked["wrap"] > 0


def test_stage_spark(spark):
    rows = [(str(i),
             _page(f'<div class="content-main"><p>{LONG} doc {i}</p>'
                   f'<p>{LONG}</p></div>'))
            for i in range(6)]
    rows.append(("99", "<html><body><p>tiny</p></body></html>"))
    df = spark.createDataFrame(rows, "doc_id string, html string")
    out = {r["doc_id"]: r for r in main_content_stage(df).collect()}
    for i in range(6):
        r = out[str(i)]
        assert r["el_class"] == "content-main"
        assert f"doc {i}" in r["text"]
        assert "Privacy" not in r["text"]
    assert out["99"]["tag"] == "body" and out["99"]["text"] == "tiny"
