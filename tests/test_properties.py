"""Property-based invariants (hypothesis): cross-implementation
equalities this engine's optimizations rely on."""

import re

from hypothesis import given, settings, strategies as st

from jsoup_spark.extract.spans import extract_spans, stream_spans
from jsoup_spark.parser.nodes import _append_normalised
from jsoup_spark.parser.positions import Utf16Map
from jsoup_spark.parser.treebuilder import parse

# text with plenty of whitespace variety, invisibles, and astral chars
_text = st.text(
    alphabet=st.sampled_from(
        list("aqZ9.&<>'\"=/ \t\n\f\r") + ["\xa0", "​", "\xad", "😀", "¢"]),
    max_size=60)


def _reference_normalise(accum, text):
    """The original per-char loop (pre-optimization), kept as the spec."""
    ws = frozenset(" \t\n\f\r\xa0")
    invis = frozenset((chr(8203), chr(173)))
    strip_leading = bool(accum) and accum[-1].endswith(" ")
    last_white = False
    reached_non_white = False
    out = []
    for ch in text:
        if ch in ws:
            if (strip_leading and not reached_non_white) or last_white:
                continue
            out.append(" ")
            last_white = True
        elif ch not in invis:
            out.append(ch)
            last_white = False
            reached_non_white = True
    if out:
        accum.append("".join(out))


@settings(max_examples=300, deadline=None)
@given(prev=st.sampled_from(["", "x", "x ", " "]), text=_text)
def test_normaliser_equals_per_char_spec(prev, text):
    a1 = [prev] if prev else []
    a2 = [prev] if prev else []
    _append_normalised(a1, text)
    _reference_normalise(a2, text)
    assert "".join(a1) == "".join(a2)


@settings(max_examples=200, deadline=None)
@given(text=_text)
def test_utf16_map_matches_encoded_lengths(text):
    u = Utf16Map(text)
    for i in range(len(text) + 1):
        assert u.convert(i) == len(text[:i].encode("utf-16-le")) // 2


_html_bits = st.lists(
    st.sampled_from([
        "<p>", "</p>", "<div>", "</div>", "<b>", "</b>", "text ", "two  sp",
        "<img src=x>", "<script>s()</script>", "&amp;", "&bogus", "<br>",
        "<span id=a>", "</span>", "<table><tr><td>c", "</table>", "\n",
        "<li>item", "<pre>\nkeep</pre>", "<!--c-->", "<em>e",
    ]),
    max_size=25)


@settings(max_examples=150, deadline=None)
@given(bits=_html_bits)
def test_stream_spans_equals_full_extract(bits):
    h = "".join(bits)
    assert stream_spans(h, "http://x/") == \
        extract_spans(parse(h, "http://x/"))


@settings(max_examples=150, deadline=None)
@given(bits=_html_bits)
def test_parse_serialize_reaches_fixed_point(bits):
    """parse∘serialize converges by the second iteration (document-level
    whitespace placement can shift once; the reference behaves the same —
    Initial drops blanks that BeforeHtml then preserves)."""
    from jsoup_spark.clean.serializer import OutputSettings, outer_html
    settings_ = OutputSettings(pretty=False)
    h1 = outer_html(parse("".join(bits)), settings_)
    h2 = outer_html(parse(h1), settings_)
    h3 = outer_html(parse(h2), settings_)
    assert h2 == h3
