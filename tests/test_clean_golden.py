"""Cleaner + serializer equivalence vs golden fixtures."""

from conftest import load_fixture

from jsoup_spark.clean import safelist as sl
from jsoup_spark.clean.cleaner import clean_html, is_valid_body_html
from jsoup_spark.clean.serializer import inner_html
from jsoup_spark.parser.treebuilder import parse


def test_clean_golden():
    for case in load_fixture("golden_clean.json"):
        doc = clean_html(case["html"], "", sl.PRESETS[case["safelist"]]())
        mine = inner_html(doc.body)
        assert mine == case["out"], (case, mine)


def test_bodyhtml_golden():
    bad = 0
    for case in load_fixture("golden_bodyhtml.json"):
        doc = parse(case["html"])
        mine = inner_html(doc.body) if doc.body is not None else ""
        if mine != case["out"]:
            bad += 1
    assert bad == 0, f"{bad} bodyhtml mismatches"


def test_is_valid():
    assert is_valid_body_html("<p>fine</p>", sl.basic())
    assert not is_valid_body_html("<script>x</script>", sl.basic())
    assert not is_valid_body_html("<p onclick=x>h</p>", sl.basic())


def test_safelist_customization():
    custom = sl.basic().add_tags("div").add_attributes("div", "data-keep")
    doc = clean_html("<div data-keep=1 data-drop=2>x</div>", "", custom)
    div = doc.body.children[0]
    assert div.attrs == {"data-keep": "1"}


def test_output_charset_fallback():
    """OutputSettings charset + escape mode drive serialization
    (Entities.doEscape charset fallback): non-encodable chars emit named
    entities per mode, else numeric."""
    from jsoup_spark.clean.serializer import OutputSettings, inner_html
    from jsoup_spark.parser.treebuilder import parse
    body = parse("<p title='π Å'>π Å 新</p>").body
    assert inner_html(body, OutputSettings(pretty=False, charset="ascii")) \
        == '<p title="&#x3c0; &Aring;">&#x3c0; &Aring; &#x65b0;</p>'
    assert inner_html(body, OutputSettings(
        pretty=False, charset="ascii", escape_mode="extended")) \
        == '<p title="&pi; &angst;">&pi; &angst; &#x65b0;</p>'
    assert inner_html(body, OutputSettings(pretty=False)) \
        == '<p title="π Å">π Å 新</p>'
