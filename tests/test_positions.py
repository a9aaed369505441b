"""Source-position tracking parity (reference: nodes/Range.java,
parser/PositionTest.java). Golden fixtures replay the compiled reference's
per-node (sourceRange, endSourceRange) offsets over the structural fuzz
corpus (BMP inputs only — Java offsets are UTF-16 units, ours codepoints)."""
from conftest import load_fixture

from jsoup_spark.parser.nodes import (
    CDataNode, CommentNode, DataNode, Document, DoctypeNode, Element,
    TextNode, XmlDeclNode)
from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.parser.xmlbuilder import parse_xml

SEP1, SEP2 = chr(1), chr(2)


def _fmt(r):
    return "-1,-1" if r is None else f"{r[0]},{r[1]}"


def _name(n):
    if isinstance(n, Document):
        return "#document"
    if isinstance(n, CDataNode):
        return "#cdata"
    if isinstance(n, TextNode):
        return "#text"
    if isinstance(n, DataNode):
        return "#data"
    if isinstance(n, CommentNode):
        return "#comment"
    if isinstance(n, DoctypeNode):
        return "#doctype"
    if isinstance(n, XmlDeclNode):
        return "#declaration"
    return n.tag_name_case if n.ns != "http://www.w3.org/1999/xhtml" else n.name


def canonical_positions(doc):
    parts = []

    def walk(n):
        s = f"{_name(n)}{SEP1}{_fmt(getattr(n, 'srcr', None))}"
        if isinstance(n, Element):
            s += f"{SEP1}{_fmt(getattr(n, 'endr', None))}"
            ranges = getattr(n, "attr_ranges", None) or {}
            for k in n.attrs:
                r = ranges.get(k)
                if r is None:
                    s += f"{SEP1}{k}=-1,-1,-1,-1"
                else:
                    s += f"{SEP1}{k}={r[0]},{r[1]},{r[2]},{r[3]}"
        else:
            s += f"{SEP1}-,-"
        parts.append(s)
        for c in getattr(n, "children", ()):
            walk(c)

    walk(doc)
    return SEP2.join(parts)


def test_positions_golden_html():
    fixture = load_fixture("golden_positions.json")
    bad = []
    for case in fixture["html"]:
        doc = parse(case["html"], track_positions=True, utf16_offsets=True)
        if canonical_positions(doc) != case["out"]:
            bad.append(case["html"][:90])
    assert not bad, f"{len(bad)} html position mismatches; first: {bad[:3]}"


def test_positions_golden_xml():
    fixture = load_fixture("golden_positions.json")
    bad = []
    for case in fixture["xml"]:
        doc = parse_xml(case["xml"], track_positions=True, utf16_offsets=True)
        if canonical_positions(doc) != case["out"]:
            bad.append(case["xml"][:90])
    assert not bad, f"{len(bad)} xml position mismatches; first: {bad[:3]}"


def test_tracks_markup_offsets():
    # PositionTest.tracksMarkup (PositionTest.java:306-331), offsets only
    html = "<!doctype\nhtml>\n<title>jsoup &copy;\n2022</title><body>\n<![CDATA[\n<jsoup>\n]]>"
    doc = parse(html, track_positions=True)
    doctype = doc.children[0]
    assert isinstance(doctype, DoctypeNode)
    assert doctype.srcr == (0, 15)

    title = next(e for e in doc.elements() if e.name == "title")
    assert title.srcr == (16, 23)
    title_text = title.children[0]
    assert title_text.srcr == (23, 40)

    body = doc.body
    comment = body.children[1]
    assert isinstance(comment, CommentNode)
    assert comment.srcr == (55, 72)
    tail = body.children[2]
    assert isinstance(tail, TextNode)
    assert tail.srcr == (72, 76)


def test_tracks_data_nodes():
    # PositionTest.tracksDataNodes (PositionTest.java:333-341)
    html = "<head>\n<script>foo;\nbar()\n5 <= 4;</script>"
    doc = parse(html, track_positions=True)
    script = next(e for e in doc.elements() if e.name == "script")
    assert script.srcr == (7, 15)
    data = script.children[0]
    assert data.srcr == (15, 33)


def test_implicit_ranges_and_untracked():
    # <p>One<p>Two — explicit opens, implicit (zero-width) closes
    doc = parse("<p>One<p>Two", track_positions=True)
    ps = [e for e in doc.elements() if e.name == "p"]
    assert ps[0].source_range() == (0, 3)
    end0 = ps[0].end_source_range()
    assert end0 is not None and end0[0] == end0[1]  # implicit close
    # untracked parse: no ranges at all
    doc2 = parse("<p>One")
    p = next(e for e in doc2.elements() if e.name == "p")
    assert p.source_range() is None and p.end_source_range() is None


def test_line_col_format():
    # PositionTest.tracksMarkup line,col:pos strings (PositionTest.java:313-325)
    html = "<!doctype\nhtml>\n<title>jsoup &copy;\n2022</title><body>\n<![CDATA[\n<jsoup>\n]]>"
    doc = parse(html, track_positions=True)
    lm = doc.line_map
    doctype = doc.children[0]
    assert lm.format_range(doctype.srcr) == "1,1:0-2,6:15"
    title = next(e for e in doc.elements() if e.name == "title")
    assert lm.format_range(title.srcr) == "3,1:16-3,8:23"
    assert lm.format_range(title.children[0].srcr) == "3,8:23-4,5:40"
    comment = doc.body.children[1]
    assert lm.format_range(comment.srcr) == "5,1:55-6,8:72"
    tail = doc.body.children[2]
    assert lm.format_range(tail.srcr) == "6,8:72-7,4:76"
    # untracked
    assert lm.line_number(-1) == -1 and lm.column_number(-1) == -1


def test_tracks_fragment():
    # PositionTest.tracksFrag (PositionTest.java:642-658, jhy/jsoup#2068):
    # "h1:0-9~12-17; id:4-6=7-8; #text:9-12; #text:17-18; h2:18-27~30-35;
    #  id:22-24=25-26; #text:27-30; h10:35-40~43-49; #text:40-43; "
    from jsoup_spark.parser.treebuilder import parse_fragment

    html = "<h1 id=1>One</h1>\n<h2 id=2>Two</h2><h10>Ten</h10>"
    nodes = parse_fragment(html, "body", track_positions=True)
    track = []

    def walk(n):
        src = getattr(n, "srcr", None)
        if isinstance(n, Element):
            end = getattr(n, "endr", None)
            track.append(f"{n.name}:{src[0]}-{src[1]}~{end[0]}-{end[1]}")
            for k in n.attrs:
                ar = n.attr_source_range(k)
                if ar:
                    (ns, ne), (vs, ve) = ar
                    track.append(f"{k}:{ns}-{ne}={vs}-{ve}")
        else:
            track.append(f"#text:{src[0]}-{src[1]}")
        for c in getattr(n, "children", ()):
            walk(c)

    for n in nodes:
        walk(n)
    assert track == [
        "h1:0-9~12-17", "id:4-6=7-8", "#text:9-12", "#text:17-18",
        "h2:18-27~30-35", "id:22-24=25-26", "#text:27-30",
        "h10:35-40~43-49", "#text:40-43",
    ]


def test_xml_internal_subset():
    # XmlTreeBuilderTest.java:412-418 — subset kept verbatim incl. quoted ]>
    from jsoup_spark.clean.serializer import outer_html
    xml = '<!DOCTYPE root [<!ENTITY example "keep ]> quoted">]><root/>'
    doc = parse_xml(xml)
    dt = doc.children[0]
    assert dt.internal_subset == '<!ENTITY example "keep ]> quoted">'
    assert outer_html(dt) == '<!DOCTYPE root [<!ENTITY example "keep ]> quoted">]>'
    # XmlTreeBuilderTest.java:432-438 — unterminated subset consumes the rest
    doc2 = parse_xml('<!DOCTYPE root [<!ENTITY x "unterminated]><root/>')
    assert doc2.children[0].internal_subset == '<!ENTITY x "unterminated]><root/>'
    assert len(doc2.children) == 1


def test_utf16_offset_mode():
    """utf16_offsets=True reports UTF-16 code units (Java char offsets):
    each astral char shifts later offsets by one extra unit."""
    h = "\U0001F600<p id=x>hi</p>"  # emoji = 2 UTF-16 units
    d_cp = parse(h, track_positions=True)
    d_16 = parse(h, track_positions=True, utf16_offsets=True)
    p_cp = [e for e in d_cp.elements() if e.name == "p"][0]
    p_16 = [e for e in d_16.elements() if e.name == "p"][0]
    assert p_cp.srcr == (1, 9) and p_cp.endr == (11, 15)
    assert p_16.srcr == (2, 10) and p_16.endr == (12, 16)
    a, b, c, dd = p_16.attr_ranges["id"]
    assert (a, b, c, dd) == tuple(v + 1 for v in p_cp.attr_ranges["id"])
    # columns count UTF-16 units too
    assert d_16.line_map.format_pos(p_16.srcr[0]) == "1,3:2"
    # no astral chars -> identical to codepoint mode
    d = parse("<p>x</p>", track_positions=True, utf16_offsets=True)
    p = [e for e in d.elements() if e.name == "p"][0]
    assert p.srcr == (0, 3)
