"""Page metadata extraction (extract/metadata.py)."""

from jsoup_spark import parse
from jsoup_spark.extract.metadata import (
    extract_metadata, metadata_stage, microdata_items)


def test_opengraph_precedence_over_title_tag():
    r = extract_metadata(parse(
        '<html><head><title>fallback</title>'
        '<meta property="og:title" content="OG Title">'
        '<meta name="twitter:title" content="TW Title">'
        '<meta property="og:description" content="og desc">'
        '<meta property="og:site_name" content="Example">'
        '<meta property="og:image" content="http://e/i.png">'
        '</head><body></body></html>'))
    assert r["title"] == "OG Title"
    assert r["description"] == "og desc"
    assert r["site_name"] == "Example"
    assert r["image"] == "http://e/i.png"


def test_twitter_then_title_then_h1_fallbacks():
    r = extract_metadata(parse(
        '<head><meta name="twitter:title" content="TW"></head>'))
    assert r["title"] == "TW"
    r = extract_metadata(parse("<title>TT</title>"))
    assert r["title"] == "TT"
    r = extract_metadata(parse("<body><h1>H1 title</h1></body>"))
    assert r["title"] == "H1 title"


def test_jsonld_article_preferred_and_fields():
    html = """<script type="application/ld+json">
    {"@context":"https://schema.org","@graph":[
      {"@type":"WebSite","name":"site"},
      {"@type":"NewsArticle","headline":"LD Head",
       "datePublished":"2023-04-05",
       "author":{"@type":"Person","name":"Jo Writer"}}]}
    </script><title>tt</title>"""
    r = extract_metadata(parse(html))
    assert r["title"] == "LD Head"
    assert r["published"] == "2023-04-05"
    assert r["author"] == "Jo Writer"
    assert r["jsonld_type"] == "NewsArticle"


def test_jsonld_malformed_is_skipped():
    html = ('<script type="application/ld+json">{broken</script>'
            '<script type="application/ld+json">{"@type":"Article",'
            '"headline":"ok"}</script>')
    assert extract_metadata(parse(html))["title"] == "ok"


def test_published_precedence_and_time_element():
    r = extract_metadata(parse(
        '<meta property="article:published_time" content="2021-01-02">'
        '<time datetime="2020-09-09">then</time>'))
    assert r["published"] == "2021-01-02"
    r = extract_metadata(parse('<time datetime="2020-09-09">x</time>'))
    assert r["published"] == "2020-09-09"


def test_canonical_absolutized_and_og_url_fallback():
    from jsoup_spark.parser.treebuilder import HtmlTreeBuilder
    doc = HtmlTreeBuilder().parse(
        '<link rel="canonical" href="/p/1">', "http://ex.com/a/b")
    assert extract_metadata(doc)["canonical_url"] == "http://ex.com/p/1"
    r = extract_metadata(parse(
        '<meta property="og:url" content="http://ex.com/c">'))
    assert r["canonical_url"] == "http://ex.com/c"


def test_lang_from_html_attr_and_http_equiv():
    assert extract_metadata(parse(
        '<html lang="de"><body></body></html>'))["lang"] == "de"
    assert extract_metadata(parse(
        '<meta http-equiv="content-language" content="fr">'
    ))["lang"] == "fr"


def test_microdata_scopes_and_nesting():
    items = microdata_items(parse(
        '<div itemscope itemtype="https://schema.org/Article">'
        '<span itemprop="headline">MD Head</span>'
        '<time itemprop="datePublished" datetime="2019-01-01">x</time>'
        '<div itemscope itemtype="https://schema.org/Person">'
        '<span itemprop="name">Inner P</span></div>'
        '</div>'))
    assert len(items) == 2
    art = next(i for i in items if i["type"].endswith("Article"))
    assert art["props"]["headline"] == "MD Head"
    assert art["props"]["datePublished"] == "2019-01-01"
    assert "name" not in art["props"]          # nested scope owns it
    per = next(i for i in items if i["type"].endswith("Person"))
    assert per["props"]["name"] == "Inner P"


def test_empty_doc_all_blank():
    r = extract_metadata(parse(""))
    assert r["title"] == "" and r["published"] == ""
    assert r["n_meta"] == 0


def test_stage_spark(spark):
    rows = [(str(i),
             f'<head><meta property="og:title" content="T{i}">'
             f'<meta name="description" content="D{i}"></head>')
            for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id string, html string")
    out = {r["doc_id"]: r for r in metadata_stage(df).collect()}
    for i in range(5):
        assert out[str(i)]["title"] == f"T{i}"
        assert out[str(i)]["description"] == f"D{i}"
        assert out[str(i)]["n_meta"] == 2
