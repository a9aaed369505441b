"""WARC reader (sources/warc.py): record framing, gzip member
layout, HTTP response splitting with transport decodings, header
folding, error contracts, and the Spark explode stage."""

import gzip

import pytest

from jsoup_spark.sources.warc import (
    build_warc, http_response, parse_warc, warc_stage)

HTML = b"<html><head><title>T1</title></head><body>hello</body></html>"


def _rec(uri, payload, rtype="response"):
    return ({"WARC-Type": rtype, "WARC-Record-ID": f"<urn:uuid:{uri}>",
             "WARC-Date": "2026-08-17T00:00:00Z",
             "WARC-Target-URI": uri,
             "Content-Type": "application/http;msgtype=response"},
            payload)


def test_roundtrip_plain_and_gzip():
    records = [
        _rec("http://a.example/1", http_response(HTML)),
        _rec("http://a.example/2",
             http_response(HTML, encoding="gzip")),
        _rec("http://a.example/3", http_response(HTML, encoding="br")),
    ]
    for gz in (False, True):
        data = build_warc(records, gzip_members=gz)
        out = parse_warc(data)
        assert len(out) == 3
        for rec in out:
            assert rec.record_type == "response"
            assert rec.http_status == 200
            assert rec.body == HTML.decode()


def test_warcinfo_and_metadata_records():
    records = [
        ({"WARC-Type": "warcinfo", "Content-Type": "application/warc-fields"},
         b"software: jsoup-spark\r\n"),
        _rec("http://b.example/x", http_response(HTML)),
        ({"WARC-Type": "metadata", "WARC-Target-URI": "http://b.example/x"},
         b"fetchTimeMs: 22\r\n"),
    ]
    out = parse_warc(build_warc(records))
    assert [r.record_type for r in out] == \
        ["warcinfo", "response", "metadata"]
    assert out[0].body is None
    assert out[1].body == HTML.decode()


def test_header_folding_and_bracketed_uri():
    rec = ({"WARC-Type": "response",
            "WARC-Target-URI": "<http://c.example/page>",
            "X-Long": "part1\r\n  part2"}, http_response(HTML))
    # fold manually: build_warc writes the value verbatim
    data = build_warc([rec])
    out = parse_warc(data)[0]
    assert out.target_uri == "http://c.example/page"
    assert out.header("X-Long") == "part1 part2"


def test_whole_file_gzip():
    data = build_warc([_rec("http://d.example/", http_response(HTML))])
    out = parse_warc(gzip.compress(data))
    assert out[0].body == HTML.decode()


def test_truncation_contracts():
    data = build_warc([_rec("http://e.example/", http_response(HTML))])
    for cut in (3, 10, 40, len(data) - 10):
        with pytest.raises(ValueError):
            parse_warc(data[:cut])
    with pytest.raises(ValueError):
        parse_warc(b"NOTWARC/1.0\r\n\r\n")


def test_warc_stage_explodes(spark):
    records_a = [_rec(f"http://f.example/{i}", http_response(HTML))
                 for i in range(3)]
    records_b = [_rec("http://g.example/0",
                      http_response(HTML, encoding="gzip"))]
    df = spark.createDataFrame(
        [("a", bytearray(build_warc(records_a))),
         ("b", bytearray(build_warc(records_b, gzip_members=True)))],
        "archive_id string, payload binary")
    rows = warc_stage(df).collect()
    assert len(rows) == 4
    by_archive = {}
    for r in rows:
        by_archive.setdefault(r["archive_id"], []).append(r)
    assert len(by_archive["a"]) == 3
    assert all(r["http_status"] == 200 for r in rows)
    assert all(r["body"] == HTML.decode() for r in rows)
    assert by_archive["b"][0]["target_uri"] == "http://g.example/0"
