"""Crawl plumbing: feeds, sitemaps, robots.txt (sources/webfeeds.py)."""

from jsoup_spark.sources.webfeeds import (
    crawl_delay, feed_stage, parse_feed, parse_robots, parse_sitemap,
    robots_allowed, sitemap_stage)

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel><title>My Feed</title>
<item><title>First &amp; foremost</title><link>http://e/1</link>
  <guid>g1</guid><pubDate>2020-01-01</pubDate>
  <description>d1</description></item>
<item><title>Second</title><link>http://e/2</link><guid>g2</guid>
  <pubDate>2020-01-02</pubDate><description>d2</description></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"><title>A Feed</title>
<entry><title>E1</title>
  <link rel="self" href="http://e/self"/>
  <link rel="alternate" href="http://e/alt"/>
  <id>tag:1</id><published>2021-05-05</published>
  <summary>s1</summary></entry>
<entry><title>E2</title><link href="http://e/plain"/>
  <id>tag:2</id><updated>2021-06-06</updated></entry>
</feed>"""


def test_rss_parse():
    f = parse_feed(RSS)
    assert f["kind"] == "rss" and f["title"] == "My Feed"
    assert [e["title"] for e in f["entries"]] == \
        ["First & foremost", "Second"]
    assert f["entries"][0]["link"] == "http://e/1"
    assert f["entries"][1]["published"] == "2020-01-02"
    assert f["entries"][0]["id"] == "g1"


def test_atom_parse_alternate_link_preferred():
    f = parse_feed(ATOM)
    assert f["kind"] == "atom" and f["title"] == "A Feed"
    assert f["entries"][0]["link"] == "http://e/alt"    # not rel=self
    assert f["entries"][1]["link"] == "http://e/plain"
    assert f["entries"][1]["published"] == "2021-06-06"  # updated fallback


def test_non_feed_xml():
    assert parse_feed("<root><x/></root>")["kind"] == ""


def test_sitemap_urlset_and_index():
    s = parse_sitemap("""<?xml version="1.0"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <url><loc>http://e/a</loc><lastmod>2020-01-01</lastmod>
      <changefreq>daily</changefreq><priority>0.8</priority></url>
    <url><loc> http://e/b </loc></url></urlset>""")
    assert s["kind"] == "urlset"
    assert s["entries"][0]["loc"] == "http://e/a"
    assert s["entries"][0]["changefreq"] == "daily"
    assert s["entries"][1]["loc"] == "http://e/b"       # trimmed
    idx = parse_sitemap(
        "<sitemapindex><sitemap><loc>http://e/s1.xml</loc></sitemap>"
        "</sitemapindex>")
    assert idx["kind"] == "sitemapindex"
    assert idx["entries"][0]["loc"] == "http://e/s1.xml"


ROBOTS = """# policy
User-agent: gbot
Disallow: /

User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /*.pdf$
Crawl-delay: 7

Sitemap: https://e/sitemap.xml
"""


def test_robots_group_selection_substring_and_star():
    r = parse_robots(ROBOTS)
    assert len(r["groups"]) == 2
    assert r["sitemaps"] == ["https://e/sitemap.xml"]
    # gbot product token matches the specific group -> everything denied
    assert not robots_allowed(r, "gbot-news/1.0", "/anything")
    # other agents fall to *
    assert robots_allowed(r, "otherbot", "/public/page")
    assert crawl_delay(r, "otherbot") == "7"
    assert crawl_delay(r, "gbot") == ""


def test_robots_longest_match_and_allow_tie():
    r = parse_robots(ROBOTS)
    # Allow /private/ok (11) beats Disallow /private/ (9)
    assert robots_allowed(r, "x", "/private/ok.html")
    assert not robots_allowed(r, "x", "/private/secret")
    # equal-length tie -> Allow wins (RFC 9309)
    r2 = parse_robots("User-agent: *\nDisallow: /page\nAllow: /page\n")
    assert robots_allowed(r2, "x", "/page/sub")


def test_robots_wildcard_and_anchor():
    r = parse_robots(ROBOTS)
    assert not robots_allowed(r, "x", "/docs/x.pdf")     # /*.pdf$
    assert robots_allowed(r, "x", "/docs/x.pdfx")        # $ anchor
    r2 = parse_robots("User-agent: *\nDisallow: /a/*/c\n")
    assert not robots_allowed(r2, "x", "/a/b/c")
    assert robots_allowed(r2, "x", "/a/b/d")


def test_robots_multi_agent_group_and_no_groups():
    r = parse_robots("User-agent: a\nUser-agent: b\nDisallow: /x\n")
    assert not robots_allowed(r, "a", "/x/1")
    assert not robots_allowed(r, "b", "/x/1")
    assert robots_allowed(r, "c", "/x/1")                # no * group
    assert robots_allowed(parse_robots(""), "a", "/x")


def test_stages_spark(spark):
    rows = [(0, RSS), (1, ATOM), (2, "<root/>")]
    df = spark.createDataFrame(rows, "doc_id long, xml string")
    out = feed_stage(df).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r)
    assert len(by[0]) == 2 and by[0][0]["kind"] == "rss"
    assert len(by[1]) == 2 and by[1][0]["kind"] == "atom"
    assert 2 not in by

    sm = ("<urlset><url><loc>http://e/a</loc></url>"
          "<url><loc>http://e/b</loc></url></urlset>")
    df2 = spark.createDataFrame([(0, sm)], "doc_id long, xml string")
    out2 = sitemap_stage(df2).collect()
    assert sorted(r["loc"] for r in out2) == ["http://e/a", "http://e/b"]
