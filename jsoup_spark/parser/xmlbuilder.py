"""XML tree builder.

Flat, HTML-semantics-free tree construction (reference:
parser/XmlTreeBuilder.java:100-260): case-preserved tag/attr names,
xmlns-stack namespace resolution, self-closing pops, end tags close the
nearest matching open element (ignored if none), CDATA/comments/doctype/
xml-declarations as leaf nodes, unlimited depth.
"""

from __future__ import annotations

from . import tokenizer as tz
from .nodes import (
    CDataNode, CommentNode, DataNode, DoctypeNode, Document, Element,
    TextNode, XmlDeclNode,
)
from .tags import NS_XML


class XmlTreeBuilder:
    def __init__(self):
        self.doc: Document | None = None
        self.stack: list[Element] = []
        # the xml prefix is implicitly bound (XmlTreeBuilder.java:56)
        self.ns_stack: list[dict[str, str]] = [{"": NS_XML, "xml": NS_XML}]
        # (tag_name_case, ns) pairs that saw self-closing syntax (sticky
        # SeenSelfClose, XmlTreeBuilder.java:170)
        self.sticky_sc: set | None = None
        self.tok: tz.Tokeniser | None = None
        self.track = False
        self.current_token = None

    def parse(self, xml: str, base_uri: str = "",
              track_positions: bool = False) -> Document:
        self.doc = Document(base_uri)
        self.doc.parse_mode = "xml"
        self.track = track_positions
        self.tok = tz.Tokeniser(xml, "xml", self.doc.errors)
        self.tok.cdata_allowed = lambda: True
        self.tok.track = track_positions
        if track_positions:
            from .positions import LineMap
            self.doc.line_map = LineMap(xml)
            virt = tz.StartTag("", None, False)
            virt.start_pos = 0  # Token.java:20 — startPos defaults 0
            self.current_token = virt
            self._track(self.doc, True)
        while True:
            token = self.tok.read()
            tt = token.type
            self.current_token = token
            if tt == tz.T_EOF:
                break
            if tt == tz.T_START:
                self._insert_element(token)
            elif tt == tz.T_END:
                self._pop_to_close(token)
            elif tt == tz.T_COMMENT:
                self._append_leaf(CommentNode(token.data))
            elif tt in (tz.T_CHAR, tz.T_CDATA):
                self._insert_character(token)
            elif tt == tz.T_DOCTYPE:
                self._append_leaf(DoctypeNode(
                    token.name, token.public_id, token.system_id,
                    token.internal_subset))
            elif tt == tz.T_XMLDECL:
                attrs = self._finalize_attrs(token.attrs)
                self._append_leaf(XmlDeclNode(
                    token.name, attrs, token.is_declaration))
        if self.track:
            while self.stack:
                el = self.stack[-1]
                self._pop()
                self._track(el, False)
            self._track(self.doc, False)
        if self.sticky_sc:
            from . import tags as _t
            sticky = self.sticky_sc
            work = [self.doc]
            while work:
                n = work.pop()
                if isinstance(n, Element):
                    if (n.tag_name_case, n.ns) in sticky:
                        n.flags |= _t.SEEN_SELF_CLOSE
                    work.extend(n.children)
        return self.doc

    def _append_leaf(self, node) -> None:
        self._cur().append(node)
        if self.track:
            self._track(node, True)

    def _track(self, node, is_start: bool) -> None:
        """TreeBuilder.trackNodePosition semantics, XML flavor (elements
        carry no VOID/SELF_CLOSE flags)."""
        tok = self.current_token
        start = tok.start_pos
        end = tok.end_pos
        if isinstance(node, Element):
            tt = tok.type
            if tt == tz.T_EOF:
                if getattr(node, "endr", None) is not None:
                    return
                start = end = self.tok.pos
            elif is_start:
                if tt != tz.T_START or node.name != tok.normal:
                    end = start
            else:
                if tt != tz.T_END or node.name != tok.normal:
                    end = start
        if is_start:
            node.srcr = (start, end)
        elif isinstance(node, Element):
            node.endr = (start, end)

    def _cur(self) -> Element:
        return self.stack[-1] if self.stack else self.doc

    @staticmethod
    def _finalize_attrs(attrs) -> dict:
        out: dict = {}
        if attrs:
            for k, v in attrs:  # case-sensitive first-wins dedupe
                if k not in out:
                    out[k] = v
            # classify even single-attr dicts: a lone preserved-case key
            # (<x viewBox=1>) must carry the _PcAttrs marker so the plain-
            # dict attr() fast path keeps its all-lowercase invariant
            from .nodes import make_ci_attrs
            out = make_ci_attrs(out)
        return out

    def _insert_element(self, start) -> None:
        namespaces = dict(self.ns_stack[-1])
        self.ns_stack.append(namespaces)
        attrs = self._finalize_attrs(start.attrs)
        for k, v in attrs.items():
            if k == "xmlns":
                namespaces[""] = v or ""
            elif k.startswith("xmlns:"):
                namespaces[k[6:]] = v or ""
        name = start.name  # case preserved
        ns = namespaces.get("", NS_XML)
        if ":" in name:
            prefix = name.split(":", 1)[0]
            if prefix in namespaces:
                ns = namespaces[prefix]
        el = Element(name.lower(), ns, attrs)
        el.tag_name_case = name
        el.flags = 0
        # record resolved namespaces for prefixed attributes (reference
        # XmlTreeBuilder.applyNamespacesToAttributes, XmlTreeBuilder.java:193
        # -> Attributes.userData("jsoup.xmlns-"+prefix, ns)); consumed by
        # helper/w3cdom.py for true namespaced W3C attributes
        attr_ns = None
        for k in attrs:
            p = k.partition(":")[0] if ":" in k else ""
            if p and p != "xmlns":
                ns_v = namespaces.get(p)
                if ns_v is not None:
                    if attr_ns is None:
                        attr_ns = {}
                    attr_ns[p] = ns_v
        if attr_ns:
            el.attr_ns = attr_ns
        if self.track and getattr(start, "attr_ranges", None):
            rng = {}
            for nm, ans, ane, avs, ave in start.attr_ranges:
                if nm not in rng and nm in attrs:
                    rng[nm] = (ans, ane, avs, ave)
            el.attr_ranges = rng
        self._cur().append(el)
        self.stack.append(el)
        if self.track:
            self._track(el, True)
        if start.self_closing:
            from . import tags as _t
            el.flags |= _t.SEEN_SELF_CLOSE
            # sticky per tag per parse (XmlTreeBuilder.java:170 sets the
            # shared Tag's SeenSelfClose) — retro-applied at parse end
            if self.sticky_sc is None:
                self.sticky_sc = set()
            self.sticky_sc.add((el.tag_name_case, el.ns))
            self._pop()
            if self.track:
                self._track(el, False)

    def _pop(self) -> None:
        self.ns_stack.pop()
        self.stack.pop()

    def _pop_to_close(self, end) -> None:
        # pop to remove the nearest open element of this name; if none, no-op
        name = end.name
        target = None
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag_name_case == name:
                target = i
                break
        if target is None:
            return
        while len(self.stack) > target:
            el = self.stack[-1]
            self._pop()
            if self.track:
                self._track(el, False)

    def _insert_character(self, token) -> None:
        if token.type == tz.T_CDATA:
            node = CDataNode(token.data)
        else:
            node = TextNode(token.data)
        self._append_leaf(node)


def parse_xml(xml: str, base_uri: str = "",
              track_positions: bool = False,
              utf16_offsets: bool = False) -> Document:
    doc = XmlTreeBuilder().parse(xml, base_uri, track_positions)
    if track_positions and utf16_offsets:
        from .positions import convert_ranges_utf16
        convert_ranges_utf16(doc, xml)
    return doc
