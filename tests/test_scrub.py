"""Unit tests for the corpus-hygiene operators (operators/scrub.py +
textstats.repetition_stats): semantics pinned against brute-force
Python on crafted docs, independent of the driver's DuckDB oracles.
"""

from collections import Counter

import pytest

from jsoup_spark.operators import scrub, textstats


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _brute_rep(text):
    w = text.split(" ")
    bi = [" ".join(w[i:i + 2]) for i in range(len(w) - 1)]
    tri = [" ".join(w[i:i + 3]) for i in range(len(w) - 2)]
    bc, tc = Counter(bi), Counter(tri)
    top = max(bc.values()) if bc else 0
    dup = sum(c * len(g) for g, c in tc.items() if c >= 2)
    return len(w), len(set(w)), top, dup


def test_repetition_stats_vs_brute(spark):
    rows = [
        "a b a b a b a b",            # heavy bigram repetition
        "x y z x y z x y z",          # duplicated trigrams
        "unique words only here now",
        "solo",
        "t t t t t t",                # single-word runs
        "p q",                        # exactly one bigram, no trigram
    ]
    out = {r["doc_id"]: r for r in
           textstats.repetition_stats(_docs(spark, rows)).collect()}
    for i, t in enumerate(rows):
        nw, nd, top, dup = _brute_rep(t)
        r = out[i]
        assert (r["n_words"], r["n_distinct_words"],
                r["top_bigram_count"], r["dup_trigram_chars"]) == \
            (nw, nd, top, dup), t


def test_pii_scrub_detects_and_redacts(spark):
    df = _docs(spark, ["plain words here", "more plain words"])
    out = {r["doc_id"]: r for r in
           scrub.pii_scrub(scrub.with_synth_pii(df)).collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert out[0]["n_ips"] == 1        # even doc_id carries an IP
    assert out[1]["n_ips"] == 0
    assert "[EMAIL]" in out[0]["redacted"]
    assert "[PHONE]" in out[0]["redacted"]
    assert "[IP]" in out[0]["redacted"]
    assert "@" not in out[0]["redacted"]
    assert out[0]["redacted"].startswith("plain words here contact ")


def test_pii_scrub_on_raw_text_column(spark):
    # operator applies to any column: no synthesized PII -> all zero
    df = _docs(spark, ["nothing sensitive here"])
    out = scrub.pii_scrub(df, text_col="text").collect()[0]
    assert (out["n_emails"], out["n_phones"], out["n_ips"]) == (0, 0, 0)
    assert out["redacted"] == "nothing sensitive here"


def test_url_normalize(spark):
    df = _docs(spark, ["a", "b"])
    out = {r["doc_id"]: r for r in
           scrub.url_normalize(scrub.with_synth_url(df)).collect()}
    r = out[0]
    assert r["host"] == "src0.example.com"          # lowercased, www gone
    assert r["registered_domain"] == "example.com"
    assert r["norm_url"] == "https://src0.example.com/en/page-0?id=0"
    assert "#" not in r["norm_url"] and "utm" not in r["norm_url"]


def test_url_normalize_edge_urls(spark):
    rows = [(0, "HTTP://Example.COM", "en", "s", 1),       # no path/query
            (1, "https://www.a.b.c.org/p?x=1&id=42&y=2#f", "en", "s", 1),
            (2, "ftp://WWW.Files.net/dir/f.txt", "en", "s", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, lang string, source string, "
        "n_chars long")
    out = {r["doc_id"]: r for r in scrub.url_normalize(df).collect()}
    assert out[0]["host"] == "example.com"
    assert out[0]["norm_url"] == "https://example.com"
    assert out[1]["host"] == "a.b.c.org"
    assert out[1]["registered_domain"] == "c.org"
    assert out[1]["norm_url"] == "https://a.b.c.org/p?id=42"
    assert out[2]["host"] == "files.net"


def test_paragraph_dedup(spark):
    rows = [
        "a b c d e f",        # chunks: "a b c", "d e f"
        "a b c x y z",        # shares "a b c"
        "q r s",              # unique
    ]
    out = {r["doc_id"]: r for r in
           scrub.paragraph_dedup(_docs(spark, rows),
                                 chunk_words=3).collect()}
    assert out[0]["n_paras"] == 2 and out[0]["n_dup_paras"] == 1
    assert out[0]["retained_chars"] == len("d e f")
    assert out[1]["n_dup_paras"] == 1
    assert out[1]["retained_chars"] == len("x y z")
    assert out[2]["n_dup_paras"] == 0
    assert out[2]["retained_chars"] == len("q r s")


def test_paragraph_dedup_ragged_tail(spark):
    rows = ["a b c d", "c d"]     # doc0 tail chunk "d"... chunks a b c / d
    out = {r["doc_id"]: r for r in
           scrub.paragraph_dedup(_docs(spark, rows),
                                 chunk_words=3).collect()}
    assert out[0]["n_paras"] == 2          # "a b c", "d"
    assert out[1]["n_paras"] == 1          # "c d"
    assert out[0]["n_dup_paras"] == 0 and out[1]["n_dup_paras"] == 0
