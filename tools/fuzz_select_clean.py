import base64, random, subprocess, sys
sys.path.insert(0, "/root/repo")
from jsoup_spark.parser.treebuilder import parse
from jsoup_spark.select.selector import SelectorParseError, select
from jsoup_spark.clean import safelist as sl
from jsoup_spark.clean.cleaner import clean_html
from jsoup_spark.clean.serializer import inner_html

SEP1, SEP2 = chr(1), chr(2)


def b64(s):
    return base64.b64encode(s.encode()).decode()


rng = random.Random(31415)
TAGS = ["div", "p", "span", "b", "a", "ul", "li", "em", "pre", "code",
        "blockquote", "q", "sub", "sup", "img", "table", "tr", "td", "script",
        "cite", "dl", "dd", "dt", "ol", "small", "strike", "u", "i", "strong", "br"]


def rand_doc():
    parts = []
    ids = 0
    for _ in range(rng.randint(6, 45)):
        t = rng.choice(TAGS)
        r = rng.random()
        if r < 0.5:
            a = []
            if rng.random() < 0.5:
                ids += 1
                a.append(f"id=i{ids}")
            if rng.random() < 0.4:
                a.append("class='%s'" % rng.choice(
                    ["x", "y z", "UPPER", "with-dash", "a.b", "1num"]))
            if rng.random() < 0.4:
                a.append(rng.choice([
                    "href='http://ok.example/p'", "href='javascript:x()'",
                    "href='/rel'", "href='ftp://f/x'", "href='#frag'",
                    "href='mailto:a@b'", "title='T i&amp;tle'",
                    "onclick='bad()'", "style='color:red'",
                    "cite='http://c/'", "src='http://i/x.png'",
                    "src='/rel.png'", "align=left", "width=5", "summary=s",
                ]))
            parts.append(f"<{t} {' '.join(a)}>")
        elif r < 0.8:
            parts.append(f"</{t}>")
        else:
            parts.append(rng.choice(
                ["plain", "Two Words", "5 < 6 & 7", "caf\xe9",
                 "  spaced  ", "line\nbreak", "&copy; marks"]))
    return "".join(parts)


HARD_QUERIES = [
    "div:has(p:has(b))", "div:not(:has(p)) > span", "p:has(+ p)",
    "*:has(> b):not(.x)", "li:nth-child(3n-1)", "li:nth-last-child(2n)",
    "p:contains(two words)", "p:contains(5 \\< 6)", "p:containsOwn(café)",
    ":is(p, li):first-child", "div p b, div p i", "div > p > b",
    "[class~=^[a-z]$]", "[href$=.png]", "[href*=example]",
    ".with-dash", ".a\\.b", ".1num", "#i1 ~ *", "#i2 + * + *",
    "p:matchesOwn((?i)TWO)", "*:not(div):not(p):not(span)",
    "li:only-child", "td:first-of-type", "tr > td:last-of-type",
    "div div div div", "body > div p", ":root > body",
    "p:empty", "*[id]", "*[id][class]", "p:lt(3):gt(0)",
    "div:has(span):has(b)", ":not(:has(*))", "q, cite, blockquote[cite]",
]

docs = [rand_doc() for _ in range(120)]
ops = []
for d in docs:
    for q in rng.sample(HARD_QUERIES, 8):
        ops.append(("select", d, q))
    ops.append(("clean", d, rng.choice(
        ["none", "simpleText", "basic", "basicWithImages", "relaxed"])))
inp = "\n".join(f"{op}\t{b64(a)}\t{b64(b)}" for op, a, b in ops)
r = subprocess.run(["java", "-cp", "/tmp/jsoupbuild/out", "Harness"],
                   input=inp, capture_output=True, text=True)
bad = 0
parsed = {}
presets = {k: v for k, v in sl.PRESETS.items()}
for (op, a, b), line in zip(ops, r.stdout.split("\n")[:-1]):
    golden = base64.b64decode(line).decode()
    try:
        if op == "select":
            doc = parsed.get(a)
            if doc is None:
                doc = parsed[a] = parse(a)
            mine = SEP2.join(
                f"{e.name}{SEP1}{e.attr('id')}{SEP1}{e.own_text()}"
                for e in select(doc, b))
        else:
            doc = clean_html(a, "", presets[b]())
            mine = inner_html(doc.body)
    except SelectorParseError:
        mine = "!PARSE"
    except Exception as e:
        mine = f"!EXC {type(e).__name__}: {e}"
    if golden.startswith("!ERROR") and mine.startswith("!"):
        continue
    if mine != golden:
        bad += 1
        if bad <= 6:
            print(f"MISMATCH {op} arg={b!r}")
            print("  IN:", repr(a[:130]))
            print("  GOLD:", repr(golden[:200]))
            print("  MINE:", repr(mine[:200]))
print(f"{len(ops)-bad}/{len(ops)} hard select/clean cases match")
