"""Differential fuzz of the W3C DOM bridge (helper/w3cdom.py vs the
reference's helper/W3CDom.java via the harness w3ctree op).

The committed golden (tests/fixtures/golden_w3cdom.json, 54 cases) pins
the known corners; this fuzzer drives RANDOM documents through both
conversions — html-parse and xml-parse flavors — and compares the
canonical structure (names, namespaces, coerced/sorted attributes,
text/comments/doctype) using the same canon as the golden test.

Usage: python tools/fuzz_w3cdom.py [seed] [ndocs]
"""
import base64
import random
import subprocess
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo/tools")

from fuzz_xpath import rand_doc, rand_xml_doc, b64
from test_w3cdom import _collapse_dup_attrs, _mine


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7100
    ndocs = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    rng = random.Random(seed)
    cases = [(rand_doc(rng, rng.randint(8, 60)), "") for _ in range(ndocs)]
    cases += [(rand_xml_doc(rng), "xml") for _ in range(ndocs // 2)]
    # hostile-name block: invalid XML attribute/tag names drive the
    # conversion's coercion/drop paths (W3CDom getValidKey/renames)
    HOSTILE_ATTRS = ["1bad", "b@d", "-x", "x y", "x=", "..", "a\u00e9",
                     "xml:lang", "xmlns:q", ":", "a:b:c", "_ok", "A1"]
    HOSTILE_TAGS = ["x-y", "a1", "_t", "t.", "q:r"]
    for _ in range(ndocs // 3):
        parts = []
        for _ in range(rng.randint(2, 6)):
            t = rng.choice(HOSTILE_TAGS)
            a = rng.choice(HOSTILE_ATTRS)
            v = rng.choice(["v", "", "1", "x y"])
            parts.append(f'<{t} {a}="{v}">t</{t}>')
        cases.append(("".join(parts), ""))
    inp = "\n".join(f"w3ctree\t{b64(d)}\t{b64(m)}" for d, m in cases)
    r = subprocess.run(["java", "-cp", "/tmp/jsoupbuild/out", "Harness"],
                       input=inp, capture_output=True, text=True)
    lines = r.stdout.split("\n")[:-1]
    assert len(lines) == len(cases), (len(lines), len(cases), r.stderr[-400:])
    bad = 0
    for (d, m), line in zip(cases, lines):
        golden = _collapse_dup_attrs(base64.b64decode(line).decode())
        mine = _mine(d, m or "html")
        if mine != golden:
            bad += 1
            if bad <= 6:
                print("MISMATCH", repr(m), repr(d[:200]))
                print("  REF :", repr(golden[:260]))
                print("  MINE:", repr(mine[:260]))
    print(f"seed={seed}: {len(cases) - bad}/{len(cases)} match")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
