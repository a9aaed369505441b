"""DOCX/EPUB text extraction (sources/officedoc.py): container
round trips through the engine's own XML/HTML parsers, structure
conventions (runs/tabs/breaks, OPF spine order), sniffing, contracts,
and the Spark stage."""

import io
import zipfile

import pytest

from jsoup_spark.sources.officedoc import (
    build_docx, build_epub, extract_docx, extract_epub, office_stage,
    sniff_office)


def test_docx_runs_tabs_and_meta():
    d = build_docx(["Hello world", "Col1\tCol2\tCol3", "Last one"],
                   title="My Doc", creator="Alice")
    out = extract_docx(d)
    assert out["title"] == "My Doc" and out["creator"] == "Alice"
    assert out["paragraphs"] == ["Hello world", "Col1\tCol2\tCol3",
                                 "Last one"]
    assert out["text"] == "Hello world\nCol1\tCol2\tCol3\nLast one"


def test_docx_entities_and_empty():
    d = build_docx(["a < b & c > d", ""])
    out = extract_docx(d)
    assert out["paragraphs"] == ["a < b & c > d", ""]


def test_docx_breaks():
    # hand-edit a w:br into the document
    d = build_docx(["xy"])
    zf = zipfile.ZipFile(io.BytesIO(d))
    doc = zf.read("word/document.xml").decode()
    doc = doc.replace("</w:r>", '<w:br/><w:t>z</w:t></w:r>', 1)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z2:
        for n in zf.namelist():
            z2.writestr(n, doc if n == "word/document.xml"
                        else zf.read(n))
    out = extract_docx(buf.getvalue())
    assert out["paragraphs"] == ["xy\nz"]


def test_epub_spine_order_and_meta():
    e = build_epub([("b.xhtml", "<p>Second words</p>"),
                    ("a.xhtml", "<h1>First</h1><p>chapter</p>")],
                   title="Book", creator="Bob")
    out = extract_epub(e)
    assert out["title"] == "Book" and out["creator"] == "Bob"
    # spine order, NOT alphabetical
    assert [c[0] for c in out["chapters"]] == ["b.xhtml", "a.xhtml"]
    assert out["text"] == "Second words\nFirst chapter"


def test_epub_html_normalization():
    e = build_epub([("c.xhtml",
                     "<p>spaced\n   out</p><ul><li>item</li></ul>")])
    out = extract_epub(e)
    # the engine's text() whitespace normalization applies
    assert out["chapters"][0][1] == "spaced out item"


def test_sniffing():
    assert sniff_office(build_docx(["x"])) == "docx"
    assert sniff_office(build_epub([("a.xhtml", "<p>x</p>")])) == "epub"
    assert sniff_office(b"PK\x03\x04garbage") is None
    assert sniff_office(b"not a zip") is None
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("random.txt", "hi")
    assert sniff_office(buf.getvalue()) == "zip"


def test_contracts():
    with pytest.raises(ValueError):
        extract_docx(b"PK\x03\x04junk")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("other.xml", "<x/>")
    with pytest.raises(ValueError, match="document.xml"):
        extract_docx(buf.getvalue())
    with pytest.raises(ValueError, match="container.xml"):
        extract_epub(buf.getvalue())


def test_office_stage(spark):
    rows = [("1", bytearray(build_docx(["p one", "p two"],
                                       title="T1", creator="C1"))),
            ("2", bytearray(build_epub([("c.xhtml", "<p>hello</p>")],
                                       title="T2", creator="C2"))),
            ("3", bytearray(b"not an archive"))]
    df = spark.createDataFrame(rows, "doc_id string, payload binary")
    out = {r["doc_id"]: r for r in office_stage(df).collect()}
    assert out["1"]["format"] == "docx" and out["1"]["n_parts"] == 2
    assert out["1"]["text"] == "p one\np two"
    assert out["2"]["format"] == "epub" and out["2"]["title"] == "T2"
    assert out["3"]["format"] is None and out["3"]["text"] is None
