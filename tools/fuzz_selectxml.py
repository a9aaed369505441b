"""Differential CSS-selector fuzz over XML-PARSED documents.

The reference's Element.select works over xmlParser output, where tag and
attribute case are preserved (ParseSettings.preserveCase,
parser/XmlTreeBuilder.java:56) — a surface the html-doc fuzzers never
exercise. Semantics pinned by the harness "selectxml" op:

* tag selectors are case-INSENSITIVE (Evaluator.Tag compares normalName:
  `Item` == `item` == `ITEM`)
* a plain tag does NOT match a prefixed one (`t` vs <ns:t>); `ns|t`
  matches the full name, `*|t` the local name
* attribute KEY lookups are ignore-case, first match in attribute order
  (Attributes.getIgnoreCase — nodes._CiAttrs fold covers colliding pairs
  like <x ID=1 id=2>); attribute VALUES compare ignore-case
* #id is ignore-case on the KEY but case-SENSITIVE on the value

Usage: python tools/fuzz_selectxml.py [seed] [ndocs] [nqueries]
"""
import base64
import random
import subprocess
import sys

sys.path.insert(0, "/root/repo")
from jsoup_spark.parser.xmlbuilder import parse_xml
from jsoup_spark.select.selector import SelectorParseError, compile_query, select
from fuzz_xpath import rand_doc, rand_xml_doc, b64, SEP1, SEP2
from jsoup_spark.parser.treebuilder import parse

TAGS = ["Item", "item", "ITEM", "a", "A", "t", "ns|t", "zz|v", "*|t",
        "*|item", "row", "Row", "b", "*", "data-cell"]
ATTRS = ["id", "ID", "n", "N", "class", "Data-K", "data-k", "missing"]
VALS = ["a1", "b2", "V", "v", "3", "12", "x", "x y", "en", ""]
OPS = ["", "=", "^=", "$=", "*=", "~=", "!="]
PSEUDOS = [":first-child", ":last-child", ":nth-child(2)", ":nth-child(odd)",
           ":nth-of-type(1)", ":only-child", ":empty", ":first-of-type",
           ":contains(One)", ":contains(3)", ":containsOwn(mix)",
           ":matches(\\d+)", ":gt(0)", ":lt(2)", ":eq(1)", ":root",
           ":not([id])", ":has(a)", ":has(Item)", ":is(Item, row)"]


def rand_simple(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.35:
        return rng.choice(TAGS)
    if r < 0.55:
        a = rng.choice(ATTRS)
        op = rng.choice(OPS)
        if not op:
            return f"[{a}]"
        return f"[{a}{op}{rng.choice(VALS)}]"
    if r < 0.65:
        return "#" + rng.choice(["a1", "b2", "A1", "z9", "c3"])
    if r < 0.72:
        return "." + rng.choice(["x", "X", "y", "en"])
    if r < 0.8:
        return rng.choice(TAGS) + rng.choice(PSEUDOS)
    return rng.choice(TAGS) + rand_simple(rng)


def rand_css(rng: random.Random) -> str:
    q = rand_simple(rng)
    for _ in range(rng.randint(0, 2)):
        q += rng.choice([" ", " > ", " + ", " ~ ", ", "]) + rand_simple(rng)
    return q


def sig_mine(els) -> str:
    out = []
    for n in els:
        nm = n.tag_name_case or n.name
        out.append(f"{nm}{SEP1}{n.attr('id')}{SEP1}{n.own_text()}")
    return SEP2.join(out)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 8800
    ndocs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    rng = random.Random(seed)
    docs = [rand_xml_doc(rng) for _ in range(ndocs)]
    cases = [("selectxml", d, "", rand_css(rng))
             for d in docs for _ in range(nq)]
    # element-CONTEXT select (Element.select): candidates are the context
    # subtree including the context itself; structural walks stop at the
    # context; :root means the context (harness-probed). Runs over BOTH
    # parse paths with a random simple-context selector.
    ctx_choices = ["div", "p", "ul", "b", "span", "li"]
    xml_ctx_choices = ["Item", "item", "row", "a", "t", "data-cell"]
    html_docs = [rand_doc(rng, rng.randint(8, 50)) for _ in range(ndocs // 2)]
    for d in html_docs:
        for _ in range(nq // 2):
            cases.append(("select", d, rng.choice(ctx_choices), rand_css(rng)))
    for d in docs[: ndocs // 2]:
        for _ in range(nq // 2):
            cases.append(("selectxml", d, rng.choice(xml_ctx_choices),
                          rand_css(rng)))
    inp = "\n".join(
        f"{op}\t{b64(d)}\t{b64((c + SEP1 + q) if c else q)}"
        for op, d, c, q in cases)
    r = subprocess.run(["java", "-cp", "/tmp/jsoupbuild/out", "Harness"],
                       input=inp, capture_output=True, text=True)
    lines = r.stdout.split("\n")[:-1]
    assert len(lines) == len(cases), (len(lines), len(cases), r.stderr[-400:])
    bad = 0
    for (op, d, c, q), line in zip(cases, lines):
        golden = base64.b64decode(line).decode()
        try:
            root = parse_xml(d) if op == "selectxml" else parse(d, "")
            if c:
                from jsoup_spark.select.selector import select_first
                root = select_first(root, compile_query(c))
                if root is None:
                    mine = ""
                    mine_err = False
                    golden_cmp = golden
                    if golden_cmp != mine and not golden_cmp.startswith("!ERROR:"):
                        bad += 1
                    continue
            mine = sig_mine(select(root, compile_query(q)))
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
                print("  REF :", repr(golden[:250]))
                print("  MINE:", repr(mine[:250]))
    # cssSelector parity: per-element unique-selector generation
    # (Element.cssSelector, Element.java:1113-1151) over both parse paths
    from jsoup_spark.extract.functions import css_selector
    from jsoup_spark.parser.nodes import Element
    cs_cases = [("", d) for d in html_docs] + [("xml", d) for d in docs[:len(docs) // 2]]
    inp2 = "\n".join(f"cssel\t{b64(d)}\t{b64(m)}" for m, d in cs_cases)
    r2 = subprocess.run(["java", "-cp", "/tmp/jsoupbuild/out", "Harness"],
                        input=inp2, capture_output=True, text=True)
    lines2 = r2.stdout.split("\n")[:-1]
    assert len(lines2) == len(cs_cases), (len(lines2), len(cs_cases))
    cs_bad = 0
    for (m, d), line in zip(cs_cases, lines2):
        golden = base64.b64decode(line).decode()
        root = parse_xml(d) if m == "xml" else parse(d, "")
        mine_sels = []

        def walk(n):
            for ch in n.children:
                if isinstance(ch, Element):
                    mine_sels.append(css_selector(ch))
                    walk(ch)

        walk(root)
        mine = SEP2.join(mine_sels)
        if mine != golden:
            cs_bad += 1
            if cs_bad <= 5:
                gl = golden.split(SEP2)
                print("CSSEL MISMATCH", repr(d[:160]))
                for a, b in zip(gl, mine_sels):
                    if a != b:
                        print("  REF :", repr(a), "\n  MINE:", repr(b))
    bad += cs_bad
    print(f"seed={seed}: {len(cases) - (bad - cs_bad)}/{len(cases)} select, "
          f"{len(cs_cases) - cs_bad}/{len(cs_cases)} cssel docs")
    # final line in the gate's "A/B match" tail shape (oracle_gate.fresh_fuzz)
    total = len(cases) + len(cs_cases)
    print(f"seed={seed}: {total - bad}/{total} match")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
