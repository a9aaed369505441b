import os
import base64, subprocess, sys
sys.path.insert(0, "/root/repo")
from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.extract.canonical import canonical
from jsoup_spark.extract.spans import extract_spans
from jsoup_spark.clean.serializer import inner_html

SEP1, SEP2 = chr(1), chr(2)

proc = subprocess.Popen(["java", "-cp", "/tmp/jsoupbuild/out", "Harness"],
                        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                        text=True, bufsize=1)


def b64(s):
    return base64.b64encode(s.encode()).decode()


def golden(op, h, a=""):
    proc.stdin.write(f"{op}\t{b64(h)}\t{b64(a)}\n")
    proc.stdin.flush()
    return base64.b64decode(proc.stdout.readline().strip()).decode()


def mine(op, h, a=""):
    try:
        if op == "tree":
            return canonical(parse(h))
        if op == "spans":
            return SEP2.join(f"{k}{SEP1}{t}{SEP1}{m}"
                             for k, t, m, _ in extract_spans(parse(h, a)))
        if op == "bodyhtml":
            doc = parse(h)
            return inner_html(doc.body) if doc.body is not None else ""
    except Exception as e:
        return f"!EXC {type(e).__name__}: {e}"


def mismatches(op, h, a=""):
    return golden(op, h, a) != mine(op, h, a)


def minimize(op, h, a=""):
    n = max(1, len(h) // 4)
    while n >= 1:
        i = 0
        while i < len(h):
            cand = h[:i] + h[i + n:]
            if cand and mismatches(op, cand, a):
                h = cand
            else:
                i += n
        n //= 2
    return h


exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "mega_fuzz.py")).read().split("ops = []")[0].replace(
    'seed = int(sys.argv[1]) if len(sys.argv) > 1 else 9000',
    'seed = 9002').replace(
    'N = int(sys.argv[2]) if len(sys.argv) > 2 else 3000', 'N = 3000'))
found = []
for h in cases:  # noqa: F821
    for op, a in (("tree", ""), ("spans", "http://base.example/x/"),
                  ("bodyhtml", "")):
        if mismatches(op, h, a):
            found.append((op, a, h))
print(f"{len(found)} mismatching pairs")
seen = set()
for op, a, h in found[:12]:
    m = minimize(op, h, a)
    key = (op, m)
    if key in seen:
        continue
    seen.add(key)
    print("=" * 60)
    print("op:", op)
    print("MIN:", repr(m))
    print("GOLD:", repr(golden(op, m, a)[:200]))
    print("MINE:", repr(mine(op, m, a)[:200]))
