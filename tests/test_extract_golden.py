"""Text extraction + span emitter equivalence vs golden fixtures."""

from conftest import load_fixture

from jsoup_spark.extract.spans import extract_spans
from jsoup_spark.parser.treebuilder import parse

SEP1, SEP2 = chr(1), chr(2)


def test_text_golden():
    fx = load_fixture("golden_text.json")
    for case in fx["text"]:
        doc = parse(case["html"])
        mine = doc.body.text() if doc.body is not None else ""
        assert mine == case["out"], case["html"][:120]
    for case in fx["wholetext"]:
        doc = parse(case["html"])
        mine = doc.body.whole_text() if doc.body is not None else ""
        assert mine == case["out"], case["html"][:120]
    for case in fx["title"]:
        assert parse(case["html"]).title() == case["out"], case["html"][:120]


def test_spans_golden():
    fx = load_fixture("golden_spans.json")
    base = fx["base_uri"]
    bad = 0
    for case in fx["cases"]:
        spans = extract_spans(parse(case["html"], base))
        mine = SEP2.join(f"{k}{SEP1}{t}{SEP1}{r}" for k, t, r, _ in spans)
        if mine != case["spans"]:
            bad += 1
    assert bad == 0, f"{bad} span-sequence mismatches"


def test_span_order_is_dense():
    html = "<p>a<img src=x.png>b</p><script>s</script>"
    spans = extract_spans(parse(html))
    assert [s[3] for s in spans] == list(range(len(spans)))
    assert [s[0] for s in spans] == ["text", "media", "text", "data"]
