"""Canonical s-expression form of a parsed tree.

Matches tools/golden/Harness.java `canonical()` byte-for-byte so pytest can
compare our parse trees against reference-derived golden fixtures.
"""

from __future__ import annotations

from ..parser.nodes import (
    CDataNode, CommentNode, DataNode, DoctypeNode, Element, Node, TextNode,
    XmlDeclNode,
)
from ..parser.tags import NS_HTML


def _esc(s: str) -> str:
    return (s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
            .replace('"', '\\"').replace(";", "\\;").replace("[", "\\[")
            .replace("]", "\\]").replace("|", "\\|"))


def canonical_node(n: Node, out: list[str]) -> None:
    if isinstance(n, Element):
        out.append("(")
        out.append(n.tag_name_case)
        if n.ns != NS_HTML:
            out.append("{" + n.ns + "}")
        for k, v in n.attrs.items():
            out.append(" [" + k + "=" + _esc(v if v is not None else "") + "]")
        for c in n.children:
            canonical_node(c, out)
        out.append(")")
    elif isinstance(n, CDataNode):
        out.append("#cd:" + _esc(n.value) + ";")
    elif isinstance(n, TextNode):
        out.append('"' + _esc(n.value) + '"')
    elif isinstance(n, DataNode):
        out.append("#data:" + _esc(n.value) + ";")
    elif isinstance(n, CommentNode):
        out.append("#c:" + _esc(n.value) + ";")
    elif isinstance(n, DoctypeNode):
        out.append("#dt:" + _esc(n.value) + "|" + _esc(n.public_id) + "|"
                   + _esc(n.system_id) + ";")
    elif isinstance(n, XmlDeclNode):
        out.append("#xd:" + _esc(n.value) + "|" + _esc(n.whole_decl()) + ";")
    else:
        out.append("#?:" + n.name + ";")


def canonical(doc_or_nodes) -> str:
    out: list[str] = []
    if isinstance(doc_or_nodes, Element):
        for c in doc_or_nodes.children:
            canonical_node(c, out)
    else:
        for c in doc_or_nodes:
            canonical_node(c, out)
    return "".join(out)
