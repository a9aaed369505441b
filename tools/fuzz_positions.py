"""Differential fuzz: source-position tracking vs the compiled reference.

Usage: python tools/fuzz_positions.py [seed] [N]
Reuses mega_fuzz's generator; ops: positions (HTML), posxml (XML).
"""
import base64, random, subprocess, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from mega_fuzz import rand_html  # noqa: E402
from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.parser.xmlbuilder import parse_xml

SEP1, SEP2 = chr(1), chr(2)


def b64(s):
    return base64.b64encode(s.encode()).decode()


def mine_positions(doc):
    parts = []

    def walk(n):
        src = getattr(n, "srcr", None)
        name = node_name(n)
        s = f"{name}{SEP1}{fmt(src)}"
        from jsoup_spark.parser.nodes import Element
        if isinstance(n, Element):
            s += f"{SEP1}{fmt(getattr(n, 'endr', None))}"
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


def fmt(r):
    if r is None:
        return "-1,-1"
    return f"{r[0]},{r[1]}"


def node_name(n):
    from jsoup_spark.parser.nodes import (
        CDataNode, CommentNode, DataNode, Document, DoctypeNode, Element,
        TextNode, XmlDeclNode)
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
        return "#declaration" if n.is_declaration else "#declaration"
    return n.tag_name_case if n.ns != "http://www.w3.org/1999/xhtml" else n.name


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1234
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    rng = random.Random(seed)
    cases = [rand_html(rng, rng.randint(3, 60)) for _ in range(N)]
    # astral inputs run unfiltered: utf16_offsets=True converts our
    # codepoint offsets to the UTF-16 code units Java reports
    ops = [("positions", h) for h in cases] + [("posxml", h) for h in cases[: N // 2]]
    inp = "\n".join(f"{op}\t{b64(h)}" for op, h in ops)
    r = subprocess.run(["java", "-cp", "/tmp/jsoupbuild/out", "Harness"],
                       input=inp, capture_output=True, text=True)
    lines = r.stdout.split("\n")[:-1]
    assert len(lines) == len(ops), (len(lines), len(ops))
    bad = 0
    for (op, h), line in zip(ops, lines):
        golden = base64.b64decode(line).decode()
        try:
            doc = parse(h, track_positions=True, utf16_offsets=True) \
                if op == "positions" \
                else parse_xml(h, track_positions=True, utf16_offsets=True)
            mine = mine_positions(doc)
        except Exception as e:
            mine = f"!EXC {type(e).__name__}: {e}"
        if mine != golden:
            bad += 1
            if bad <= 8:
                gp = golden.split(SEP2)
                mp = mine.split(SEP2)
                print(f"MISMATCH op={op} IN: {h[:120]!r}")
                for i, (g, m) in enumerate(zip(gp, mp)):
                    if g != m:
                        print(f"  node {i}: GOLD {g.replace(SEP1,'|')!r}  MINE {m.replace(SEP1,'|')!r}")
                        break
                if len(gp) != len(mp):
                    print(f"  node-count GOLD {len(gp)} MINE {len(mp)}")
    print(f"seed={seed}: {len(ops)-bad}/{len(ops)} match")


if __name__ == "__main__":
    main()
