"""Differential XPath fuzz: our select/xpath.py vs the compiled reference.

The reference's Element.selectXpath delegates to javax.xml.xpath over a
non-namespace-aware W3CDom conversion (Element.java:784-801,
W3CDom.java); the harness "xpath" op drives exactly that and prints a
per-node signature (tag \x01 id \x01 ownText for elements, #text /
#comment for leaves). We parse the same doc with our engine, evaluate
the same query with select_xpath_nodes, and compare signatures.

Error parity: when the reference throws (SelectorParseException /
XPathException) and we raise SelectorParseError, the case counts as a
match — messages differ by construction (ours mirrors the query-name
shape, not Xalan internals).

Docs are structurally random but W3C-clean (valid attr names, no NULs):
W3CDom renames/drops invalid XML attribute names during conversion, a
reference-conversion artifact that is out of scope for the evaluator
contract (mega_fuzz keeps fuzzing the parser over hostile inputs).

Usage: python tools/fuzz_xpath.py [seed] [ndocs]
"""
import base64
import random
import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")
from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.parser.xmlbuilder import parse_xml
from jsoup_spark.parser.nodes import CommentNode, Document, Element, TextNode
from jsoup_spark.select.selector import SelectorParseError
from jsoup_spark.select.xpath import select_xpath_nodes

SEP1, SEP2 = chr(1), chr(2)


def b64(s):
    return base64.b64encode(s.encode()).decode()


TAGS = ["div", "p", "b", "a", "span", "ul", "li", "table", "tr", "td",
        "h1", "em", "section", "article", "nav", "img", "br", "form",
        "input", "option", "pre", "title", "custom-tag", "script", "style"]
ATTRS = [("id", "a"), ("id", "b"), ("id", "z1"), ("class", "x"),
         ("class", "x y"), ("href", "/p?a=1"), ("data-k", "v"),
         ("title", "Zed"), ("type", "text"), ("value", ""),
         ("lang", "en"), ("n", "3"), ("n", "12"), ("n", "-4"),
         ("n", "2.5"), ("n", "NaN-ish")]
TEXTS = ["One", "Two words", "  spaced  ", "3", "12.5", "-7", "x<y",
         "mixed Case", "a,b;c", "", "0", "NaN", "true"]


def rand_doc(rng: random.Random, n: int) -> str:
    parts = []
    depth = 0
    for _ in range(n):
        r = rng.random()
        tag = rng.choice(TAGS)
        if r < 0.45:
            attrs = ""
            for _ in range(rng.randint(0, 2)):
                k, v = rng.choice(ATTRS)
                attrs += f' {k}="{v}"'
            parts.append(f"<{tag}{attrs}>")
            depth += 1
        elif r < 0.65 and depth > 0:
            parts.append(f"</{tag}>")
            depth -= 1
        elif r < 0.9:
            parts.append(rng.choice(TEXTS))
        else:
            parts.append(rng.choice(["<!-- note -->", "<!-- -->", "<br/>"]))
    return "".join(parts)


NAME_TESTS = ["div", "p", "b", "a", "span", "li", "td", "tr", "em", "img",
              "custom-tag", "*", "text()", "node()", "comment()"]
AXES = ["", "", "", "", "descendant::", "descendant-or-self::", "self::",
        "ancestor::", "ancestor-or-self::", "parent::",
        "following-sibling::", "preceding-sibling::",
        "following::", "preceding::", "child::"]
ATTR_NAMES = ["id", "class", "href", "data-k", "title", "type", "lang", "n",
              "missing", "ID", "N", "Data-K", "DATA-K"]
STRS = ["'x'", "'a'", "'One'", "'en'", "''", "'3'", "'div'", "'p'"]


def rand_pred(rng: random.Random, depth: int) -> str:
    r = rng.random()
    if r < 0.18:
        return str(rng.randint(1, 4))
    if r < 0.26:
        return rng.choice(["last()", "last()-1", "position()<3",
                           "position()+1=2", "position() mod 2 = 1",
                           "position()*2 <= last()",
                           "position() div 2 >= 1",
                           "-position() + 2 = 1"])
    if r < 0.40:
        a = rng.choice(ATTR_NAMES)
        if rng.random() < 0.5:
            return f"@{a}"
        return f"@{a}={rng.choice(STRS)}"
    if r < 0.55:
        return rng.choice([
            f"contains(@class, {rng.choice(STRS)})",
            f"starts-with(@id, {rng.choice(STRS)})",
            f"contains(text(), {rng.choice(STRS)})",
            "string-length(normalize-space()) > 3",
            "string-length(.) > 5",
            f"normalize-space() = {rng.choice(STRS)}",
            f"substring(name(), 1, 1) = {rng.choice(STRS)}",
            f"substring-before(@class, ' ') = {rng.choice(STRS)}",
            f"substring-after(@href, '/') != ''",
            f"translate(@id, 'abz', 'ABZ') = 'A'",
            "floor(@n) = 3", "ceiling(@n) = 3", "round(@n) = 3",
            "number(@n) > 2", "sum(.//@n) > 4",
            "boolean(@id)", "not(@class)",
            "lang('en')", "not(lang('en'))",
            "string(lang('fr')) = 'false'", "id('a')", "count(id('a')) = 0",
            "string(@id) = 'a'", "concat(@id, 'x') = 'ax'",
            "name() = 'p'", "local-name() != 'div'",
        ])
    if r < 0.70 and depth < 2:
        return f"{rand_pred(rng, depth + 1)} {rng.choice(['and', 'or'])} " \
               f"{rand_pred(rng, depth + 1)}"
    if r < 0.85 and depth < 2:
        return rand_rel_path(rng, rng.randint(1, 2))
    return rng.choice(["count(.//li) > 1", "count(*) = 0", ".//b",
                       "not(.//comment())", "text()", "@n * 2 = 6",
                       "@n - 1 = 2", "@n + @n = 6"])


def rand_step(rng: random.Random, depth: int) -> str:
    step = rng.choice(AXES) + rng.choice(NAME_TESTS)
    if rng.random() < 0.55:
        step += f"[{rand_pred(rng, depth)}]"
        if rng.random() < 0.15:
            step += f"[{rand_pred(rng, depth)}]"
    return step


def rand_rel_path(rng: random.Random, nsteps: int) -> str:
    return "/".join(rand_step(rng, 2) for _ in range(nsteps))


# Xalan mis-rewrite (documented divergence, see test_xpath.py): an
# explicit descendant/descendant-or-self axis with a node() test AND a
# predicate, followed by a descendant-family continuation (explicit
# descendant:: step OR the // abbreviation) OR a child step whose test
# is a wildcard/kind test (/*, /node(), /text(), /comment()), drops the
# predicate in the reference — Xalan compiles the "//X" abbreviation
# shape into one DescendantIterator; named-test continuations take the
# predicate-preserving walker. Our evaluator follows the XPath 1.0
# spec; the generator skips the shape.
_XALAN_BUG = re.compile(
    r"descendant(?:-or-self)?::node\(\)\[.*"
    r"(?://|/\s*descendant|/\s*\*|/\s*(?:node|text|comment)\(\))")

# Second pinned Xalan defect (see test_xpath.py
# test_xalan_reverse_axis_position_last_divergence): on a REVERSE axis,
# a predicate referencing BOTH position() and last(), followed by any
# further predicate, yields internal-state-dependent garbage in the
# reference ([k] hits arbitrary wrong ranks or nothing). Forward axes
# and single-predicate forms are exact; the generator skips the shape.
# Broadened r8s3: ANY first predicate containing last() — [last()],
# [position()*2 <= last()], [position() <= last()-5] — followed by a
# second predicate, garbles on reverse axes ([last()][1] behaves like
# [1][1]: harness-probed, ancestor::*[last()][3 and 4] returns the
# NEAREST ancestor). pred1-positional-only + pred2-with-last() is fine.
_XALAN_BUG2 = re.compile(
    r"(?:ancestor|ancestor-or-self|preceding|preceding-sibling)::"
    r"[^/\[]*\[[^\]]*last\(\)[^\]]*\]\s*\[")

# Third shape: PREDICATE-FREE plain descendant::node() followed by a //
# continuation ALSO fuses into one descendant walk, which forgets the
# depth>=2 floor the two-step form implies (spec: X whose parent is a
# STRICT descendant). descendant-or-self::node()//X coincides with the
# fused walk by construction, so only the plain axis is skipped.
_XALAN_BUG3 = re.compile(r"(?<!-)descendant::node\(\)\s*//")

def rand_query(rng: random.Random) -> str:
    while True:
        q = _rand_query_once(rng)
        if not _XALAN_BUG.search(q) and not _XALAN_BUG2.search(q) \
                and not _XALAN_BUG3.search(q):
            return q


def _rand_query_once(rng: random.Random) -> str:
    r = rng.random()
    head = rng.choice(["//", "/", "descendant::"]) if r < 0.8 else "//"
    q = head + rand_step(rng, 0)
    for _ in range(rng.randint(0, 2)):
        q += rng.choice(["/", "//"]) + rand_step(rng, 0)
    if rng.random() < 0.15:
        q = f"({q})[{rng.choice(['1', '2', 'last()', 'position() mod 2 = 1'])}]"
        if rng.random() < 0.4:
            q += "/" + rand_step(rng, 1)
    if rng.random() < 0.12:
        q += " | " + "//" + rand_step(rng, 1)
    return q


XML_TAGS = ["Item", "item", "A", "a", "t", "ns:t", "zz:v", "row", "Row",
            "data-cell", "b"]
XML_TEXTS = ["One", "3", "12.5", "-7", "mix Case", "", "0", "x y"]


def rand_xml_children(rng: random.Random, depth: int, budget: list) -> str:
    parts = []
    while budget[0] > 0 and rng.random() > 0.3:
        budget[0] -= 1
        r = rng.random()
        if r < 0.45 and depth < 5:
            tag = rng.choice(XML_TAGS)
            attrs = ""
            if rng.random() < 0.6:
                ik = rng.choice(["id", "id", "id", "ID", "Id"])
                attrs += f' {ik}="{rng.choice("abcdez")}{rng.randint(0, 9)}"'
                if rng.random() < 0.12 and ik != "id":
                    # ignore-case COLLIDING pair: getIgnoreCase must take
                    # the first in order (nodes._CiAttrs fold)
                    attrs += f' id="{rng.choice("abcdez")}{rng.randint(0, 9)}"'
            if rng.random() < 0.3:
                nk = rng.choice(["n", "n", "N"])
                attrs += f' {nk}="{rng.choice(["3", "12", "-4", "2.5"])}"'
            if rng.random() < 0.15:
                attrs += f' class="{rng.choice(["x", "x y", "en"])}"'
            if rng.random() < 0.1:
                attrs += f' Data-K="{rng.choice(["V", "v", ""])}"'
            if rng.random() < 0.12:
                parts.append(f"<{tag}{attrs}/>")
            else:
                inner = rand_xml_children(rng, depth + 1, budget)
                parts.append(f"<{tag}{attrs}>{inner}</{tag}>")
        elif r < 0.7:
            parts.append(rng.choice(XML_TEXTS))
        elif r < 0.8:
            parts.append(f"<![CDATA[{rng.choice(['cd', '<raw>', '3'])}]]>")
        elif r < 0.9:
            parts.append(rng.choice(["<!--c-->", "<!-- note -->"]))
        else:
            parts.append(rng.choice(["<?pi data?>", "<?x?>"]))
    return "".join(parts)


def rand_xml_doc(rng: random.Random) -> str:
    budget = [rng.randint(8, 40)]
    body = rand_xml_children(rng, 0, budget)
    lead = rng.choice(["", "<?xml version=\"1.0\"?>"])
    return (lead + "<root xmlns:ns=\"http://x\" xmlns:zz=\"http://y\">"
            + body + "</root>")


XML_NAME_TESTS = ["Item", "item", "A", "a", "t", "ns:t", "zz:v", "ns:*",
                  "row", "Row", "b", "*", "text()", "node()", "comment()",
                  "processing-instruction()"]


def sig_mine(nodes) -> str:
    out = []
    for n in nodes:
        if isinstance(n, Document):
            out.append(f"#document{SEP1}{SEP1}")
        elif isinstance(n, Element):
            # tagName() preserved case; el.id() = attr("id"), which is
            # the reference's getIgnoreCase first-in-order lookup
            nm = n.tag_name_case or n.name
            out.append(f"{nm}{SEP1}{n.attr('id')}{SEP1}{n.own_text()}")
        elif isinstance(n, TextNode):
            out.append(f"#text{SEP1}{SEP1}{n.value}")
        elif isinstance(n, CommentNode):
            out.append(f"#comment{SEP1}{SEP1}{n.value}")
        else:
            # DataNode prints as the reference's W3C nodeName (#data),
            # content-less — matching the harness's generic-node branch
            label = "#data" if type(n).__name__ == "DataNode" else type(n).__name__
            out.append(f"{label}{SEP1}{SEP1}")
    return SEP2.join(out)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 4100
    ndocs = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    rng = random.Random(seed)
    docs = [rand_doc(rng, rng.randint(8, 60)) for _ in range(ndocs)]
    cases = []
    for d in docs:
        for _ in range(nq):
            cases.append((d, rand_query(rng)))

    # error-parity block: malformed / out-of-scope queries must fail on
    # BOTH sides (messages differ; error-vs-error is the contract)
    ERROR_QS = ["//p[", "//p)", "count(//p)", "string(//p)", "//p[$v=1]",
                "//p[unknownfn(2)]", "p//", "//p[@]", "//p[1=]", "]",
                "//p[position(", "//*[bogus-axis::p]", "//p[id('x')]",
                # wrong arity must be a COMPILE-time error on both sides,
                # even though no <zz> exists to evaluate the predicate on
                "//zz[floor()]", "//zz[lang()]", "//zz[lang('a','b')]",
                "//zz[contains('a')]", "//zz[concat('a')]",
                "//zz[substring('a')]", "//zz[translate('a','b')]",
                "//zz[not()]", "//zz[true(1)]", "//zz[position(1)]",
                "//zz[normalize-space('a','b')]", "//zz[sum(//p,//b)]"]
    for q in ERROR_QS:
        cases.append((docs[0], q))
    cases = [("xpath", d, q) for d, q in cases]

    # XML-parse path (xpathxml op): preserved case, prefixes, CDATA, PIs.
    # Queries draw name tests from the XML tag population; ~1/4 of docs.
    xml_docs = [rand_xml_doc(rng) for _ in range(max(ndocs // 4, 4))]
    global NAME_TESTS
    saved_tests = NAME_TESTS
    NAME_TESTS = XML_NAME_TESTS
    try:
        for d in xml_docs:
            for _ in range(nq):
                cases.append(("xpathxml", d, rand_query(rng)))
    finally:
        NAME_TESTS = saved_tests
    inp = "\n".join(f"{op}\t{b64(d)}\t{b64(q)}" for op, d, q in cases)
    r = subprocess.run(["java", "-cp", "/tmp/jsoupbuild/out", "Harness"],
                       input=inp, capture_output=True, text=True)
    lines = r.stdout.split("\n")[:-1]
    assert len(lines) == len(cases), (len(lines), len(cases), r.stderr[-500:])

    bad = 0
    for (op, d, q), line in zip(cases, lines):
        golden = base64.b64decode(line).decode()
        try:
            root = parse_xml(d, "") if op == "xpathxml" else parse(d, "")
            mine = sig_mine(select_xpath_nodes(root, q))
            mine_err = False
        except SelectorParseError as e:
            mine = f"!ERR {e}"
            mine_err = True
        ref_err = golden.startswith("!ERROR:")
        if ref_err and mine_err:
            continue
        if ref_err != mine_err or mine != golden:
            bad += 1
            if bad <= 8:
                print("MISMATCH")
                print("  doc:", repr(d[:220]))
                print("  q:  ", q)
                print("  REF :", repr(golden[:300]))
                print("  MINE:", repr(mine[:300]))
    print(f"seed={seed}: {len(cases) - bad}/{len(cases)} match")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
