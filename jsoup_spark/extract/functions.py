"""Collection / accessor functions over selected elements.

The Elements-level surface from the reference (select/Elements.java:85-271,
nodes/Element.java:1113 cssSelector, nodes/FormElement.java formData),
re-expressed over the Python DOM for use inside batch UDFs and exposed
through pipeline select columns.
"""

from __future__ import annotations

from ..parser.nodes import Element
from ..select.selector import select

_CSS_ESCAPE_NEEDED = set(" !\"#$%&'()*+,./:;<=>?@[\\]^`{|}~")


def escape_css_identifier(ident: str) -> str:
    """TokenQueue.escapeCssIdentifier subset: escape chars that would not
    round-trip through the query parser."""
    out = []
    for i, c in enumerate(ident):
        if c in _CSS_ESCAPE_NEEDED:
            out.append("\\" + c)
        elif i == 0 and c.isdigit():
            out.append(f"\\3{c} ")
        else:
            out.append(c)
    return "".join(out)


def each_text(els: list[Element]) -> list[str]:
    """Elements.eachText: normalized text per element, non-empty only."""
    return [t for t in (el.text() for el in els) if t]


def each_attr(els: list[Element], key: str) -> list[str]:
    """Elements.eachAttr: attr values for elements carrying the attr."""
    out = []
    for el in els:
        if key.startswith("abs:"):
            v = el.abs_url(key[4:])
            if v:
                out.append(v)
        elif el.has_attr(key):
            out.append(el.attr(key))
    return out


def first_attr(els: list[Element], key: str) -> str:
    """Elements.attr: first non-empty attribute value (Elements.java:85)."""
    for el in els:
        if el.has_attr(key):
            v = el.attr(key)
            if v:
                return v
    return ""


def elements_text(els: list[Element]) -> str:
    """Elements.text(): space-joined element texts."""
    return " ".join(t for t in (el.text() for el in els) if t)


def elements_html(els: list[Element]) -> str:
    """Elements.html(): newline-joined inner HTML."""
    from ..clean.serializer import inner_html
    return "\n".join(inner_html(el) for el in els)


def css_selector(el: Element) -> str:
    """Element.cssSelector: a unique selector path for the element
    (#id short-circuit when unique; else tag.classes:nth-child chain)."""
    doc = el.owner_document()
    if el.attr("id"):
        id_sel = "#" + escape_css_identifier(el.attr("id"))
        if doc is None:
            return id_sel
        hits = select(doc, id_sel)
        if len(hits) == 1 and hits[0] is el:
            return id_sel
    parts: list[str] = []
    node = el
    while isinstance(node, Element) and node.name != "#root":
        sel = escape_css_identifier(node.tag_name_case
                                    if node.ns != "http://www.w3.org/1999/xhtml"
                                    else node.name)
        classes = node.class_names()
        if classes:
            sel += "." + ".".join(escape_css_identifier(c) for c in classes)
        parent = node.parent
        if isinstance(parent, Element) and parent.name != "#root":
            siblings = [c for c in parent.children if isinstance(c, Element)]
            same = [c for c in siblings
                    if c.name == node.name and c.class_names() == classes]
            if len(same) > 1:
                idx = next(i for i, c in enumerate(siblings) if c is node)
                sel += f":nth-child({idx + 1})"
        parts.append(sel)
        node = parent
    return " > ".join(reversed(parts))


_SUBMITTABLE = frozenset(("input", "select", "textarea", "button", "keygen"))


def form_data(form: Element) -> list[tuple[str, str]]:
    """FormElement.formData semantics: key/value pairs for submittable,
    named, enabled controls; checkbox/radio only when checked; selects use
    selected options (or the first option as fallback)."""
    out: list[tuple[str, str]] = []
    for el in form.elements():
        if el.name not in _SUBMITTABLE:
            continue
        if el.has_attr("disabled"):
            continue
        name = el.attr("name")
        if not name:
            continue
        typ = el.attr("type").lower()
        if el.name == "select":
            options = [o for o in el.elements() if o.name == "option"]
            picked = [o for o in options if o.has_attr("selected")]
            if not picked and options:
                picked = options[:1]
            for o in picked:
                val = o.attr("value") if o.has_attr("value") else o.text()
                out.append((name, val))
        elif el.name == "textarea":
            out.append((name, el.whole_text()))
        elif typ in ("checkbox", "radio"):
            if el.has_attr("checked"):
                val = el.attr("value") if el.has_attr("value") else "on"
                out.append((name, val))
        elif typ not in ("submit", "image", "button"):
            out.append((name, el.attr("value")))
    return out


def forms(doc) -> list[Element]:
    """Document.forms(): all <form> elements."""
    return [el for el in doc.elements() if el.name == "form"]
