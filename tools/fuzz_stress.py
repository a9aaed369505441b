"""Targeted stress fuzz: formatting chaos + table fostering + templates."""
import base64, random, subprocess, sys, itertools
sys.path.insert(0, "/root/repo")
from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.extract.canonical import canonical


def b64(s):
    return base64.b64encode(s.encode()).decode()


rng = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
FMT = ["b", "i", "em", "strong", "u", "s", "small", "big", "code", "tt",
       "font", "nobr", "a", "strike"]
TBL = ["table", "tbody", "thead", "tfoot", "tr", "td", "th", "caption",
       "colgroup", "col"]
BLK = ["div", "p", "li", "ul", "dt", "dd", "h1", "article", "button",
       "marquee", "object", "applet", "template", "select", "option",
       "optgroup", "ruby", "rt", "rb", "form"]


def gen(n):
    parts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.3:
            t = rng.choice(FMT)
            parts.append(f"<{t}>" if rng.random() < 0.6 else f"</{t}>")
        elif r < 0.6:
            t = rng.choice(TBL)
            parts.append(f"<{t}>" if rng.random() < 0.6 else f"</{t}>")
        elif r < 0.8:
            t = rng.choice(BLK)
            parts.append(f"<{t}>" if rng.random() < 0.6 else f"</{t}>")
        else:
            parts.append(rng.choice(["x", " y ", "zz", "&amp;"]))
    return "".join(parts)


cases = [gen(rng.randint(4, 120)) for _ in range(4000)]
inp = "\n".join(f"tree\t{b64(h)}\t" for h in cases)
r = subprocess.run(["java", "-cp", "/tmp/jsoupbuild/out", "Harness"],
                   input=inp, capture_output=True, text=True)
bad = 0
for h, line in zip(cases, r.stdout.split("\n")[:-1]):
    golden = base64.b64decode(line).decode()
    try:
        mine = canonical(parse(h))
    except Exception as e:
        mine = f"!EXC {type(e).__name__}: {e}"
    if mine != golden:
        bad += 1
        if bad <= 4:
            i = next((i for i, (a, b) in enumerate(
                itertools.zip_longest(golden, mine)) if a != b), -1)
            print("MISMATCH:", repr(h[:160]))
            print("  GOLD:", repr(golden[max(0, i-70):i+90]))
            print("  MINE:", repr(mine[max(0, i-70):i+90]))
print(f"{len(cases)-bad}/{len(cases)} stress trees match")
