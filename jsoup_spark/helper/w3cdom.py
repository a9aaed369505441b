"""W3C DOM bridge: convert the engine's DOM to a standard-library
``xml.dom.minidom`` Document (reference helper/W3CDom.java:49-470).

Gives users of the standard DOM APIs (and DOM-based tooling) a lossless
view of a parsed document: elements carry their namespaces (HTML/SVG/
MathML; XML-namespace elements with no prefix map to no namespace, as the
W3C DOM reserves the XML namespace for the ``xml`` prefix), attribute
keys are coerced to XML-safe names exactly like the reference
(Attribute.getValidKey), prefixed attributes whose namespace was never
declared get a fake ``xmlns:prefix='undefined'`` declaration so
serialization stays well-formed, and every created W3C node links back to
its source node via ``source_map``.

Per-attribute namespaces (reference Attribute.namespace(), set by the XML
parser only — Attribute.java:146-159): XML parses record resolved
prefix->namespace maps per element (xmlbuilder attr_ns); prefixed
attributes with a declared namespace become true namespaced W3C
attributes via setAttributeNS. HTML parses never bind attribute
namespaces (same as the reference), so HTML-side prefixed attributes
(``xlink:href``, ``v-bind:x``) take the stack-walk / fake
``xmlns:prefix='undefined'`` path, exactly like W3CDom.java:444-466.

The engine's native XPath subset (select/xpath.py) remains the query
path — this bridge exists for DOM-API interop, mirroring the reference's
conversion semantics (differential-tested via Harness op ``w3ctree``).
"""

from __future__ import annotations

import re
from xml.dom import minidom

from ..parser.nodes import (
    CDataNode, CommentNode, DataNode, Document, DoctypeNode, Element,
    TextNode,
)
from ..parser.tags import NS_XML

_XML_KEY_VALID = re.compile(r"[a-zA-Z_:][-a-zA-Z0-9_:.]*\Z")
_XML_KEY_REPLACE = re.compile(r"[^-a-zA-Z0-9_:.]+")
_HTML_KEY_BAD = re.compile(r"[\x00-\x1f\x7f-\x9f \"'/=]")
_HTML_KEY_REPLACE = re.compile(r"[\x00-\x1f\x7f-\x9f \"'/=]+")

_UNDEFINED_NS = "undefined"

# XML 1.0 (5th ed) Name production — what the JAVA DOM layer enforces on
# setAttribute/createElement (Xerces INVALID_CHARACTER_ERR). Broader than
# jsoup's ASCII isValidXmlKey: unicode letters and a lone ':' are legal,
# so an html-syntax attribute like 'aé' survives the reference's
# DOMException fallback untouched.
_NAME_START = ("A-Za-z_:\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF"
               "\u0370-\u037D\u037F-\u1FFF\u200C-\u200D\u2070-\u218F"
               "\u2C00-\u2FEF\u3001-\uD7FF\uF900-\uFDCF\uFDF0-\uFFFD"
               "\U00010000-\U000EFFFF")
_NAME_CHAR = _NAME_START + "\\-.0-9\u00B7\u0300-\u036F\u203F-\u2040"
_XML_NAME_VALID = re.compile(
    "[" + _NAME_START + "][" + _NAME_CHAR + "]*\\Z")


def _set_plain_attr(w_el, name: str, value: str) -> None:
    """Plain (non-namespaced) attribute set, keyed by nodeName like the
    Java DOM. minidom's setAttribute splits the qualified name and keys
    its NS map by (None, local-part), which collides ':' with 'xmlns:'
    and 'lang' with 'xml:lang' — pairs Xerces keeps distinct
    (harness-probed: <x-y lang=1 xml:lang=2> keeps both)."""
    doc = w_el.ownerDocument
    a = doc.createAttribute(name)
    a.value = value if value is not None else ""
    if w_el._attrs is None:  # minidom inits the maps lazily
        w_el._ensure_attributes()
    old = w_el._attrs.get(name)
    if old is not None:  # same-name replace, drop both of the old keys
        w_el._attrs.pop(name, None)
        for k2, v2 in list(w_el._attrsNS.items()):
            if v2 is old:
                del w_el._attrsNS[k2]
    lk = (None, a.localName)
    occupied = w_el._attrsNS.get(lk)
    if occupied is not None and occupied.nodeName != name:
        # a DIFFERENT qualified name owns this (None, local) slot — key
        # by nodeName instead, as the Java DOM does, so the pair coexists
        w_el._attrsNS[(None, name)] = a
    else:
        w_el._attrsNS[lk] = a
    w_el._attrs[name] = a
    a.ownerElement = w_el


def get_valid_key(key: str, syntax: str) -> str | None:
    """Attribute.getValidKey (nodes/Attribute.java:228-240): coerce an
    attribute key to a syntax-valid name, or None if uncoercible."""
    if syntax == "xml" and _XML_KEY_VALID.match(key) is None:
        key = _XML_KEY_REPLACE.sub("_", key)
        return key if _XML_KEY_VALID.match(key) is not None else None
    if syntax == "html" and not _valid_html_key(key):
        key = _HTML_KEY_REPLACE.sub("_", key)
        return key if _valid_html_key(key) else None
    return key


def _valid_html_key(key: str) -> bool:
    return bool(key) and _HTML_KEY_BAD.search(key) is None


def xml_safe_tag_name(name: str) -> str | None:
    """Normalizer.xmlSafeTagName — same normal form as XML attr keys."""
    return get_valid_key(name, "xml")


class W3CDom:
    """Converter; ``namespace_aware=False`` drops element namespaces
    (reference does this under selectXpath for query convenience)."""

    def __init__(self, namespace_aware: bool = True):
        self.namespace_aware = namespace_aware
        #: id(w3c node) -> source engine node, filled by from_jsoup
        self.source_map: dict[int, object] = {}

    def from_jsoup(self, root, syntax: str = "html") -> minidom.Document:
        """Convert a Document (or an Element's whole owning tree) to a
        minidom Document. ``syntax`` is the attribute-coercion mode of the
        source ('html' for HTML-parsed docs, 'xml' for parse_xml docs —
        the reference reads it off Document.outputSettings().syntax())."""
        impl = minidom.getDOMImplementation()
        out = impl.createDocument(None, None, None)
        self.source_map = {}

        doc = root if isinstance(root, Document) else None
        if doc is None:
            n = root
            while n is not None and not isinstance(n, Document):
                n = n.parent
            doc = n
        src_doc = doc if doc is not None else root

        # doctype (invalid/empty names dropped, W3CDom.java:206-212)
        if isinstance(src_doc, Document):
            for c in src_doc.children:
                if isinstance(c, DoctypeNode):
                    name = c.value
                    if name and _XML_KEY_VALID.match(name) is not None:
                        dt = impl.createDocumentType(
                            name, c.public_id or "", c.system_id or "")
                        out.appendChild(dt)
                    break

        root_el = None
        if isinstance(src_doc, Document):
            root_el = next((c for c in src_doc.children
                            if isinstance(c, Element)), None)
        elif isinstance(src_doc, Element):
            root_el = src_doc
        if root_el is not None:
            self._convert(root_el, out, syntax)
        return out

    # ---- conversion walk (W3CBuilder head/tail) ----
    def _convert(self, root_el: Element, out: minidom.Document,
                 syntax: str) -> None:
        def head(source, parent_dest):
            if isinstance(source, Element):
                tag_name = xml_safe_tag_name(source.tag_name_case)
                ns = self._w3c_namespace(source)
                if tag_name is None:
                    node = out.createTextNode(f"<{tag_name}>")
                    parent_dest.appendChild(node)
                    self.source_map[id(node)] = source
                    return None
                if ns is None and ":" in tag_name:
                    ns = ""
                el = out.createElementNS(ns, tag_name)
                self._copy_attributes(source, el, syntax)
                parent_dest.appendChild(el)
                self.source_map[id(el)] = source
                return el
            if isinstance(source, TextNode):  # incl. CData
                node = out.createTextNode(source.value)
            elif isinstance(source, CommentNode):
                node = out.createComment(source.value)
            elif isinstance(source, DataNode):
                node = out.createTextNode(source.value)
            else:
                return None  # doctype handled at doc creation; decls skipped
            parent_dest.appendChild(node)
            self.source_map[id(node)] = source
            return None

        def walk(el, parent_dest):
            w = head(el, parent_dest)
            if isinstance(el, Element):
                target = w if w is not None else parent_dest
                for c in el.children:
                    walk(c, target)

        walk(root_el, out)

    def _w3c_namespace(self, el: Element) -> str | None:
        if not self.namespace_aware:
            return None
        ns = el.ns
        prefix = el.tag_name_case.split(":", 1)[0] \
            if ":" in el.tag_name_case else ""
        if ns == NS_XML and not prefix:
            return None
        return ns

    def _copy_attributes(self, j_el: Element, w_el, syntax: str) -> None:
        # XML parses record resolved per-attribute-prefix namespaces on the
        # element (xmlbuilder attr_ns; reference Attributes.userData
        # "jsoup.xmlns-"+prefix) — those become true namespaced W3C attrs
        # (W3CDom.java:425-433 setAttributeNS)
        attr_ns = getattr(j_el, "attr_ns", None)
        for key, val in j_el.attrs.items():
            k = get_valid_key(key, syntax)
            if k is None:
                continue
            # the JAVA DOM layer enforces XML 1.0 Names on set (Xerces
            # INVALID_CHARACTER_ERR); the reference catches that
            # DOMException and retries with xml-syntax coercion
            # (W3CDom.copyAttributes, W3CDom.java:414-422). The gate is
            # the real Name production, NOT jsoup's ASCII key check —
            # 'aé' passes straight through on an html-parse doc.
            if syntax != "xml" and _XML_NAME_VALID.match(k) is None:
                k = get_valid_key(key, "xml")
                if k is None or _XML_NAME_VALID.match(k) is None:
                    continue
            ns = None
            if self.namespace_aware and attr_ns is not None and ":" in k:
                ns = attr_ns.get(k.split(":", 1)[0])
            if ns:
                w_el.setAttributeNS(ns, k, val if val is not None else "")
                continue  # namespace known: no undeclared-prefix fix-up
            _set_plain_attr(w_el, k, val)
            self._maybe_add_undeclared_ns(k, j_el, w_el)

    def _maybe_add_undeclared_ns(self, attr_key: str, j_el: Element,
                                 w_el) -> None:
        """W3CDom.maybeAddUndeclaredNs: prefixed attributes must have a
        namespace declaration for valid serialization; find one on the
        element stack (HTML parses don't bind prefixes) or fake one."""
        if not self.namespace_aware or ":" not in attr_key:
            return
        prefix = attr_key.split(":", 1)[0]
        if prefix == "xmlns":
            return
        el = j_el
        while el is not None and isinstance(el, Element):
            ns = el.attrs.get("xmlns:" + prefix)
            if ns:
                w_el.setAttributeNS(ns, attr_key, j_el.attr(attr_key))
                return
            el = el.parent
        _set_plain_attr(w_el, "xmlns:" + prefix, _UNDEFINED_NS)

    # ---- serialization / mapping ----
    def as_string(self, wdoc: minidom.Document) -> str:
        """Serialize the converted DOM (minidom XML serialization; the
        reference delegates to javax Transformer, whose output formatting
        differs — structural equivalence is the differential contract)."""
        return wdoc.documentElement.toxml() if wdoc.documentElement else ""

    def source_node(self, wnode):
        """The engine node a converted W3C node came from (SourceProperty
        analog), or None."""
        return self.source_map.get(id(wnode))


def convert(doc, namespace_aware: bool = True,
            syntax: str = "html") -> minidom.Document:
    """W3CDom.convert static-equivalent."""
    return W3CDom(namespace_aware).from_jsoup(doc, syntax)
