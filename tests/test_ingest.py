"""Charset detection / raw-bytes ingest tests, incl. the reference's
meta-charset fixture files."""

import glob
import gzip

from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.sources.ingest import decode_html_bytes, detect_charset


def test_bom_detection():
    assert detect_charset("﻿hi".encode("utf-8")) == "utf-8"
    assert detect_charset("hi".encode("utf-16")) in ("utf-16-le", "utf-16-be")
    assert decode_html_bytes("﻿<p>x</p>".encode("utf-8")) == "<p>x</p>"


def test_meta_charset_sniff():
    html = "<html><head><meta charset='ISO-8859-1'></head><body>caf\xe9</body>"
    data = html.encode("iso-8859-1")
    assert detect_charset(data).lower() == "iso-8859-1"
    assert "café" in decode_html_bytes(data)
    legacy = ("<head><meta http-equiv=Content-Type "
              "content='text/html; charset=Shift_JIS'></head>")
    assert detect_charset(legacy.encode()).lower() == "shift_jis"


def test_xml_decl_and_default():
    assert detect_charset(b"<?xml version='1.0' encoding='ISO-8859-1'?><r/>")\
        .lower() == "iso-8859-1"
    assert detect_charset(b"<p>plain</p>") == "utf-8"
    assert detect_charset(b"<meta charset='not-a-charset'><p>") == "utf-8"


def test_gzip_inflation():
    """Gzipped payloads must decode byte-identically to their plain form
    (DataUtil.openStream magic-byte sniff, helper/DataUtil.java:153-165),
    including a gzipped non-UTF-8 page whose charset is sniffed AFTER
    inflation."""
    import zlib
    wild = sorted(glob.glob(
        "/root/reference/src/test/resources/htmltests/*.html"))[:3]
    assert wild
    for f in wild:
        plain = open(f, "rb").read()
        assert decode_html_bytes(gzip.compress(plain)) == \
            decode_html_bytes(plain)
        assert decode_html_bytes(zlib.compress(plain)) == \
            decode_html_bytes(plain)
    latin = "<meta charset='ISO-8859-1'><p>caf\xe9".encode("iso-8859-1")
    assert "café" in decode_html_bytes(gzip.compress(latin))
    # non-gzip data starting with 0x1f alone passes through
    assert decode_html_bytes(b"\x1f<p>x</p>") == "\x1f<p>x</p>"
    # truncated gzip: passthrough (decoded with replacement), no raise
    decode_html_bytes(gzip.compress(b"<p>hello</p>")[:6])


def test_reference_charset_fixtures():
    """The reference's meta-charset test files must decode to parseable
    documents with non-empty text."""
    files = sorted(
        glob.glob("/root/reference/src/test/resources/htmltests/meta-charset-*.html"))
    assert files
    for f in files:
        data = open(f, "rb").read()
        text = decode_html_bytes(data)
        doc = parse(text)
        assert doc.body is not None
        assert "가각갂갃간갅" in doc.body.text() or doc.body.text()


def test_load_file_and_stream(tmp_path):
    import io
    from jsoup_spark.sources.ingest import load_file, load_stream
    html = "<meta charset='ISO-8859-1'><p>caf\xe9</p>"
    plain = tmp_path / "page.html"
    plain.write_bytes(html.encode("iso-8859-1"))
    doc = load_file(plain)
    assert "café" in doc.body.text()
    assert doc.base.startswith("file://")
    gz = tmp_path / "page.html.gz"
    gz.write_bytes(gzip.compress(html.encode("iso-8859-1")))
    assert load_file(gz, base_uri="http://x/").body.text() == \
        doc.body.text()
    doc2 = load_stream(io.BytesIO(html.encode("iso-8859-1")), "http://x/")
    assert "café" in doc2.body.text()
