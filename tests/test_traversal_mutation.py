"""Traversal API (NodeVisitor/NodeFilter/NodeIterator) + DOM mutation tests
(TraversorTest / NodeIteratorTest / ElementTest families, SURVEY §5)."""

from jsoup_spark.clean.serializer import OutputSettings, inner_html
from jsoup_spark.parser.nodes import CommentNode, Element, TextNode
from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.select import traversor as tv
from jsoup_spark.select.selector import select

PLAIN = OutputSettings(pretty=False)


class _Log:
    def __init__(self):
        self.out = []

    def head(self, node, depth):
        self.out.append(f"+{node.name if not isinstance(node, Element) else node.name}@{depth}")

    def tail(self, node, depth):
        if isinstance(node, Element):
            self.out.append(f"-{node.name}@{depth}")


def test_traverse_order():
    doc = parse("<div><p>one</p><p>two</p></div>")
    log = _Log()
    tv.traverse(log, doc.body)
    assert log.out == [
        "+body@0", "+div@1", "+p@2", "+#text@3", "-p@2",
        "+p@2", "+#text@3", "-p@2", "-div@1", "-body@0"]


def test_traverse_remove_during_head():
    doc = parse("<div><b>a</b><i>b</i><u>c</u></div>")

    class Remover:
        def head(self, node, depth):
            if isinstance(node, Element) and node.name == "i":
                node.remove()

        def tail(self, node, depth):
            pass

    tv.traverse(Remover(), doc.body)
    assert [e.name for e in select(doc, "div *")] == ["b", "u"]


def test_filter_skip_and_remove():
    doc = parse("<div><p class=skip>one<b>x</b></p><p>two</p><p class=del>three</p></div>")
    seen = []

    class Filt:
        def head(self, node, depth):
            if isinstance(node, Element) and node.has_class("skip"):
                return tv.FilterResult.SKIP_CHILDREN
            if isinstance(node, Element) and node.has_class("del"):
                return tv.FilterResult.REMOVE
            if isinstance(node, TextNode):
                seen.append(node.value)
            return tv.FilterResult.CONTINUE

    res = tv.filter(Filt(), doc.body)
    assert res == tv.FilterResult.CONTINUE
    assert seen == ["two"]
    assert len(select(doc, "p")) == 2  # .del removed


def test_filter_stop():
    doc = parse("<p>a</p><p>b</p><p>c</p>")
    count = []

    class Stopper:
        def head(self, node, depth):
            if isinstance(node, TextNode):
                count.append(node.value)
                if node.value == "b":
                    return tv.FilterResult.STOP
            return tv.FilterResult.CONTINUE

    assert tv.filter(Stopper(), doc.body) == tv.FilterResult.STOP
    assert count == ["a", "b"]


def test_node_iterator():
    doc = parse("<div><p>one<!--c--></p><p>two</p></div>")
    names = [n.name for n in tv.NodeIterator(doc.body)]
    assert names == ["body", "div", "p", "#text", "#comment", "p", "#text"]
    texts = [n.value for n in tv.NodeIterator(doc.body, TextNode)]
    assert texts == ["one", "two"]
    it = tv.NodeIterator(doc.body, CommentNode)
    assert [n.value for n in it] == ["c"]


def test_mutation_api():
    doc = parse("<div id=d><p id=p>text</p></div>")
    p = select(doc, "#p")[0]
    div = select(doc, "#d")[0]

    p.set_attr("data-x", "1").add_class("one").add_class("two")
    assert p.attrs["class"] == "one two"
    p.toggle_class("one")
    assert p.attrs["class"] == "two"
    p.remove_attr("data-x")
    assert "data-x" not in p.attrs

    p.append_html("<b>bold</b> tail")
    assert p.text() == "textbold tail"  # no synthetic space around inline <b>
    p.prepend_html("lead ")
    assert p.text() == "lead textbold tail"

    sib = Element("span")
    sib.append(TextNode("sib"))
    p.after(sib)
    assert inner_html(div, PLAIN) == \
        '<p id="p" class="two">lead text<b>bold</b> tail</p><span>sib</span>'

    wrapper = Element("section")
    p.wrap(wrapper)
    assert select(doc, "section > p") == [p]
    p.unwrap()  # removes p, leaves its children in section
    assert select(doc, "section > b")[0].text() == "bold"

    c = div.clone()
    assert inner_html(c, PLAIN) == inner_html(div, PLAIN)
    c.empty()
    assert not c.children and div.children


def test_set_text_script_data():
    doc = parse("<script>old()</script><p>x</p>")
    script = select(doc, "script")[0]
    script.set_text("new()")
    assert script.data() == "new()"
    assert script.text() == ""  # data, not text
