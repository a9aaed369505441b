"""Generate golden fixtures for the pytest suite by driving the compiled
reference through tools/golden/Harness.java.

Usage: python tools/golden/gen_fixtures.py <harness-classpath>
Writes tests/fixtures/*.json. Fixture inputs are seeded/deterministic, so
regeneration is reproducible. Wild-corpus files from the reference test
resources are recorded as content hashes (not copied into this repo).
"""

from __future__ import annotations

import base64
import glob
import gzip
import hashlib
import json
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FIXDIR = os.path.join(REPO, "tests", "fixtures")
BASE_URI = "http://base.example/dir/"


def b64(s: str) -> str:
    return base64.b64encode(s.encode()).decode()


def run_harness(cp: str, ops: list[tuple]) -> list[str]:
    inp = "\n".join(
        "\t".join([op[0]] + [b64(a) for a in op[1:]]) for op in ops)
    r = subprocess.run(["java", "-cp", cp, "Harness"], input=inp,
                       capture_output=True, text=True, check=True)
    lines = r.stdout.split("\n")[:-1]
    assert len(lines) == len(ops), f"{len(lines)} != {len(ops)}"
    return [base64.b64decode(ln).decode() for ln in lines]


# ---------------------------------------------------------------- inputs

def structural_inputs() -> list[str]:
    rng = random.Random(1234)
    tags = ["div","p","b","i","a","span","table","tr","td","th","ul","li","h1","h2","em","strong",
            "form","input","select","option","optgroup","button","pre","script","style","title","textarea",
            "svg","math","mi","mo","annotation-xml","foreignObject","desc","template","caption","colgroup","col","thead","tbody","tfoot",
            "nobr","ruby","rt","rp","rb","rtc","dd","dt","dl","img","br","hr","iframe","noscript","noframes",
            "frameset","frame","body","head","html","font","small","u","s","marquee","object","applet","xmp","plaintext",
            "listing","base","meta","link","area","wbr","keygen","embed","custom-tag","FOO","address","article","center","fieldset","figure"]
    words = ["foo","bar  baz","&amp;","&notit","x<y","a&#66;c","  "," nb","tail","\ttab\n","&#x1F600;","&frac12;","&Ab;","nul\x00l"]
    attrs = ["id=a", "class='x y'", "href=/p?a=1&b=2", "data-k=\"v\"", "selected", "TITLE=Zed", "id=a id=b",
             "a=\"q'q\"", "a='&lt;'", "encoding=text/html", "type=hidden", "type=text", "color=red", "xml:lang=en"]
    markers = ["<!-- c -->","<!--->","<!doctype html>","<![CDATA[cd]]>","<?proc?>","<!bogus>","<br/>","<b/>",
               "<!DOCTYPE html PUBLIC 'p' 's'>","<!-- x --!>","</>"]

    def rand_html(n):
        parts = []
        for _ in range(n):
            r = rng.random()
            tag = rng.choice(tags)
            if r < 0.45:
                a = (" " + rng.choice(attrs)) if rng.random() < 0.45 else ""
                sc = "/" if rng.random() < 0.08 else ""
                parts.append(f"<{tag}{a}{sc}>")
            elif r < 0.7:
                parts.append(f"</{tag}>")
            elif r < 0.9:
                parts.append(rng.choice(words))
            else:
                parts.append(rng.choice(markers))
        return "".join(parts)

    curated = [
        "<html><head><title>First!</title></head><body><p>First post! <img src=foo.png></p></body></html>",
        "<p>Hello  <b>there</b> now! </p>",
        "<b>one<i>two</b>three</i>",
        "<p>a<p>b",
        "<table><tr><td>one</td><td>two</table>",
        "text<table>foster</table>after",
        "<ul><li>a<li>b</ul>",
        "<title>a<b</title>",
        "<!doctype html><!-- c --><div class='x y' ID=Q data-a='1'>t</div>",
        "<svg><circle r=1/><text>hi</text></svg><p>after",
        "<script>var x='</div>';</script>",
        "<pre>\nkeep  space</pre>",
        "<select><option>a<option>b</select>",
        "<dl><dt>t<dd>d</dl>",
        "plain text only",
        "<noscript><p>ns</p></noscript>",
        "<template><td>c</td></template>",
        "<form><input name=a><form><input name=b>",
        "<div class=\"foo > bar\">rough</div>",
        "<p one two=2 three three=3>dupes</p>",
        "<b><i>x</b>y</i>",
        "<table><b><tr><td>aaa</td></tr>bbb</table>ccc",
        "<title>unclosed title",
        "<script>unclosed script",
        "<style>unclosed style",
        "<title><p>Foo</TiTLE>after",
        "<li>one<li>two",
        "<dd>a<dt>b<dd>c",
        "<!-- unclosed comment",
        "<?php echo 'x'; ?><div>after</div>",
        "<!weird>x",
        "entities: &AElig; &aelig; &Aacute &notin; &notit; &#97; &#x61; &#128; &#x80; &bogus; &",
        "<!DOCTYPE html><html><body>q</body></html>",
        "<!DOCTYPE html SYSTEM 'about:legacy-compat'><p>x</p>",
        "<svg><foreignObject><p>html island</p></foreignObject></svg>",
        "<math><annotation-xml encoding='text/html'><p>island</p></annotation-xml></math>",
        "<math><mi>x</mi><mglyph/></math>",
        "<svg><![CDATA[cdata text]]></svg>",
        "null\x00char",
        "<base href='http://rebased.example/sub/'><a href=rel>x</a><base href='http://second/'>",
        "<frameset><frame src=a><noframes>nf</noframes></frameset>",
        "x" + "<div>" * 600 + "deep" + "</div>" * 600,
        "<p>" + "a " * 500 + "</p>",
        "<ruby>base<rt>anno</rt><rp>(</rp></ruby>",
        "<table><caption>cap</caption><colgroup><col span=2></colgroup><thead><tr><th>h</th></tr></thead><tbody><tr><td>d</td></tr></tbody></table>",
        "<a href=one>1</a><a href=two>nested <a href=three>3</a></a>",
        "<nobr>a<nobr>b</nobr>c",
        "<button>b1<button>b2</button></button>",
        "<option>one<optgroup>g<option>two</optgroup>three",
        "<isindex>ghost",
        "<image src=x.png>im",
        "<plaintext>everything <raw> from here",
        "<xmp><b>not bold</b></xmp>",
        "<iframe>frame data</iframe>after",
        "<textarea><b>raw</b></textarea>after",
    ]
    return curated + [rand_html(rng.randint(3, 60)) for _ in range(700)]


def tokenizer_inputs() -> list[str]:
    rng = random.Random(5)
    atoms = ["<", ">", "</", "<!", "<!-", "<!--", "-->", "--!>", "&", "&#", "&#x", ";", "=", '"', "'", "/", "/>",
             "a", "b", "script", "style", "title", "textarea", "-", "--", "<![CDATA[", "]]>", "\x00", "\r", "\n",
             " ", "\t", "p", "di", "v", "<scr", "ipt>", "</script", "</scRipt >", "<!doctype", "html", "PUBLIC",
             "SYSTEM", "&amp", "&lt", "&notin", "&noti", "&#65", "&#xZZ;", "?", "<?", "`", "\\", "é",
             "<svg>", "</svg>", "<math>", "<mi>", "<b/>", "<title>", "</title>", "<pre>", "<plaintext>", "<xmp>", "</xmp>"]
    return ["".join(rng.choice(atoms) for _ in range(rng.randint(2, 50)))
            for _ in range(700)]


def span_inputs() -> list[str]:
    rng = random.Random(88)
    tags = ["div","p","b","i","a","span","table","tr","td","ul","li","h1","em","button",
            "video","audio","source","track","object","pre","br","hr","img","script",
            "style","iframe","embed","textarea","input","select","option"]
    words = ["hello","two  words"," lead","trail ","&amp;","&nbsp;x","\tws\n","mid dle"]
    cases = []
    for _ in range(400):
        parts = ["<html><head><title>T t</title><base href='http://ex.com/a/'></head><body>"] if rng.random() < 0.5 else []
        for _ in range(rng.randint(3, 25)):
            r = rng.random()
            tag = rng.choice(tags)
            if r < 0.35:
                a = ""
                if tag == "img":
                    a = f" src='{rng.choice(['x.png','http://a/b.png','/abs.png',''])}' alt='{rng.choice(['pic','',' sp '])}'"
                elif tag in ("video","audio","source","iframe","embed","track"):
                    a = f" src={rng.choice(['m.mp4','http://m/v.mp4'])}"
                parts.append(f"<{tag}{a}>")
            elif r < 0.6:
                parts.append(f"</{tag}>")
            else:
                parts.append(rng.choice(words))
        cases.append("".join(parts))
    cases += [
        "<html><head><title> A  title </title></head><body><p>Hello <b>world</b>!</p><img src=a.png alt=pic><div>after</div><script>js();</script>tail</body></html>",
        "<base href='http://x.com/d/'><img src=rel.png><img src=/root.png><img src='http://abs/a.png'><img>",
        "<pre>  keep\nws </pre><p>norm  al</p>",
        "<video><source src=a.mp4><source src=b.mp4>cap</video>text",
        "<button>Press</button>here<input type=text>x",
    ]
    return cases


SELECT_DOC = """
<html><head><title>Test doc</title></head><body>
<div id=outer class='wrap main'>
  <p id=p1 class=Intro>One <b>bold</b> text</p>
  <p id=p2 data-x='1'>Two &amp; co</p>
  <p id=p3 DATA-Y='zed'>Three<br>lines</p>
  <span id=s1 class='a b c'>span one</span>
  <span id=s2></span>
  <ul id=list>
    <li id=l1>alpha</li>
    <li id=l2 class=sel>beta</li>
    <li id=l3>gamma <a href='http://x/y' id=link title='Go Here'>link</a></li>
  </ul>
  <table id=t1><tr><td id=c1>cell</td><td id=c2 colspan=2>cell2</td></tr></table>
  <script id=sc>var x = "find me";</script>
  <div id=inner><p id=p4>Nested para</p><div id=deep><p id=p5>Deep</p></div></div>
  <img id=im src='pic.png' alt='A Picture'>
  <form id=f1><input id=in1 type=text value=v1><input id=in2 type=hidden></form>
  <p id=empty></p>
  <p id=ws>   </p>
  <pre id=pre>  raw  text </pre>
</div>
<div id=second lang=en-US><P ID=UP CLASS=MixedCase>Case Test</P></div>
</body></html>
"""

SELECT_QUERIES = [
    "p", "div", "span", "li", "*", "p#p1", "#p2", ".sel", ".intro", ".Intro",
    ".a.b", ".a .b", "div.wrap", "div.main.wrap", "[data-x]", "[data-y]",
    "[^data-]", "[*]", "[id=p1]", "[id=P1]", "[title=go here]", "[colspan=2]",
    "[href^=http]", "[href$=y]", "[href*=x/]", "[id~=^p\\d+$]", "[id!=p1]",
    "div p", "div > p", "ul > li", "div div", "li + li", "li ~ li",
    "p + span", "span + span", "#l1 + li", "#l1 ~ li", "p, span",
    "p, span, li", "div p, ul li", "> div", "html > body",
    "p:lt(2)", "p:gt(1)", "p:eq(0)", "li:eq(1)",
    "p:first-child", "p:last-child", "li:first-child", "li:last-child",
    "span:only-child", "td:only-child", "p:only-of-type",
    "li:nth-child(2)", "li:nth-child(odd)", "li:nth-child(even)",
    "li:nth-child(2n+1)", "li:nth-child(-n+2)", "li:nth-last-child(1)",
    "p:nth-of-type(2)", "p:nth-last-of-type(1)", "p:first-of-type",
    "p:last-of-type", "p:empty", ":root", "html:root", "p:contains(one)",
    "p:contains(One)", "p:contains(two & co)", "p:containsOwn(three)",
    "b:contains(bold)", "p:contains(bold)", "p:containsOwn(bold)",
    "p:containsWholeText(Three)", "p:containsWholeOwnText(Three)",
    "script:containsData(find me)", "p:matches(\\d)", "p:matches([A-Z]\\w+)",
    "p:matchesOwn(^Two)", "p:matchesWholeText(Three\\nlines)",
    "div:has(p)", "div:has(> p)", "div:has(span)", "li:has(a)",
    "div:has(p):has(span)", "p:not(.intro)", "p:not(#p1)",
    "div:not(:has(div))", ":not(p)", "li:has(+ li)", "span:has(~ span)",
    "input[type=hidden]", "input[type=TEXT]", "img[alt]", "[alt*=picture]",
    "P", "#UP", ".mixedcase", ".MixedCase", "[class=mixedcase]",
    "div#second p", "td", "table td", "tr > td",
    "p:is(.intro, #p2)", "li:is(:first-child)", "*|p", "p:matchText",
    "p b", "body *", "div *", "[id^=p][id$=1]",
]


def select_fuzz() -> list[tuple[str, str]]:
    rng = random.Random(2024)
    tags = ["div", "p", "span", "b", "a", "ul", "li", "section", "article", "em"]

    def rand_doc():
        parts = []
        n = rng.randint(5, 40)
        ids = 0
        for _ in range(n):
            t = rng.choice(tags)
            r = rng.random()
            if r < 0.5:
                a = []
                if rng.random() < 0.5:
                    ids += 1
                    a.append(f"id=e{ids}")
                if rng.random() < 0.4:
                    a.append(f"class='{rng.choice(['x', 'y', 'x y', 'zed big'])}'")
                if rng.random() < 0.3:
                    a.append(f"data-v={rng.randint(0, 3)}")
                parts.append(f"<{t} {' '.join(a)}>")
            elif r < 0.8:
                parts.append(f"</{t}>")
            else:
                parts.append(rng.choice(["one", "two three", "Four", "5 five", "x"]))
        return "".join(parts)

    queries = ["div", "p", "span", "li", "*", ".x", ".y", ".x.y", "[data-v]",
               "[data-v=1]", "[data-v!=2]", "[id^=e]", "[id$=1]", "[id*=e]",
               "div p", "div > p", "p + span", "p ~ span", "div div div",
               "ul > li:nth-child(2)", "p:first-child", "p:last-child",
               "span:only-child", "li:nth-child(odd)", "p:contains(one)",
               "p:containsOwn(four)", "p:matches(\\d)", "div:has(p)",
               "div:has(> span)", "p:not(.x)", ":not(div)",
               "div:has(p) > span", "p.x, span.y", "b, em", "div .x", "*|div",
               "div:empty", "p:lt(1)", "p:gt(0)", "p:eq(1)",
               "li:first-of-type", "p:nth-of-type(2)", "span:has(~ span)",
               "li:has(+ li)"]
    docs = [rand_doc() for _ in range(50)]
    return [(d, q) for d in docs for q in rng.sample(queries, 10)]


CLEAN_CASES = [
    ("<p><a href='javascript:alert(1)'>link</a> ok <script>bad()</script></p>", "basic"),
    ("<p>Text <b>bold</b> <i>it</i> <u>u</u> <em>em</em></p>", "simpleText"),
    ("<div><p>one</p><p>two</p></div>", "none"),
    ("<div><p>keep <span class=x>span</span></p><table><tr><td>c</td></tr></table></div>", "relaxed"),
    ("<img src='http://x/a.png' alt=pic><img src='ftp://x/b.png'>", "basicWithImages"),
    ("<a href='http://example.com/'>ext</a>", "basic"),
    ("<a href='HTTP://EXAMPLE.com/x'>caps proto</a>", "basic"),
    ("<a href='mailto:a@b.c'>mail</a>", "basic"),
    ("<a href=\"java&#0;script:alert(1)\">conceal</a>", "basic"),
    ("<a href='  javascript:alert(1)'>ws</a>", "basic"),
    ("<a href='jav&#x09;ascript:alert(1)'>tab conceal</a>", "basic"),
    ("<p att=1 class=ok>attr strip</p>", "relaxed"),
    ("<blockquote cite='http://x/q'>q</blockquote>", "basic"),
    ("<p><!-- comment --><?pi ?>text</p>", "basic"),
    ("<frameset><frame src=x></frameset>", "basic"),
    ("<ol start=2 type=a><li>one</li></ol>", "relaxed"),
    ("<b>unclosed <i>nested", "simpleText"),
    ("plain text &amp; entities &lt;tag&gt;", "none"),
    ("<p>5 is &lt; 6</p>", "none"),
    ("<div>unwrap <b>keep</b> tail</div>", "simpleText"),
    ("<a href='/relative'>rel</a>", "basic"),
    ("<a href='#frag'>frag</a>", "basic"),
    ("<td colspan=3 onclick='x()'>cell</td>", "relaxed"),
    ("<pre>  pre  text </pre>", "basic"),
    ("<ul><li>a</li><li>b</li></ul>", "basic"),
    ("<span>span</span> <q cite='http://q'>q</q> <sub>s</sub><sup>p</sup>", "basic"),
    ("<svg><script>alert(1)</script></svg><p>after</p>", "basic"),
    ("<p style='color:red' dir=ltr>styled</p>", "relaxed"),
    ("<a href='ftp://files/x'>ftp</a>", "basic"),
    ("<img src='//proto-relative/x.png'>", "basicWithImages"),
]

XML_CASES = [
    "<?xml version='1.0' encoding='UTF-8'?><root><a href='x'>one</a></root>",
    "<root xmlns='http://ns1/'><child xmlns:p='http://p/'><p:item k='v'/></child></root>",
    "<doc><![CDATA[raw <>& data]]></doc>",
    "<a><b><c>deep</c></b></a>",
    "<a><b>unclosed",
    "<a/><b/>",
    "<MixedCase Attr='V'/>",
    "<!DOCTYPE root SYSTEM 'sys'><root/>",
    "<root><!-- comment --><?pi target?></root>",
    "<x>text &amp; entity &lt;</x>",
    "<a><b></c></b></a>",
    "<script>not rawtext in xml<b/></script>",
    "<a b='1' B='2'/>",
    "<r>pre</r>post",
    "<select><option>keep structure</option></select>",
]


def xml_fuzz() -> list[str]:
    rng = random.Random(66)
    atoms = ["<a>", "</a>", "<b k='v'>", "</b>", "<c/>", "text",
             "<?xml version='1.0'?>", "<![CDATA[cd]]>", "<!-- c -->",
             "&amp;", "<NS:tag xmlns:NS='http://n/'>", "</NS:tag>",
             "<!DOCTYPE r>", "<?pi x?>", "<d a='1' b=\"2\">", "</d>",
             "<e xmlns='http://def/'>", "</e>", "&#65;", "<f", ">", "</", "<"]
    return ["".join(rng.choice(atoms) for _ in range(rng.randint(2, 25)))
            for _ in range(300)]


FRAGMENT_CASES = [
    ("<li>one<li>two", "ul"),
    ("<td>cell</td>", "tr"),
    ("<tr><td>c</td></tr>", "tbody"),
    ("<p>para <b>bold", "div"),
    ("raw text", "title"),
    ("var x = 1;", "script"),
    ("<option>a<option>b", "select"),
    ("<div>block</div>", "p"),
    ("<html><body>x</body></html>", "div"),
    ("<col span=2>", "colgroup"),
    ("<b>bare", ""),
    ("text <i>only", "b"),
    ("<caption>c</caption><tr><td>d</td></tr>", "table"),
    ("<p>island</p>", "noscript"),
    ("<td>tmpl cell", "template"),
]


def customtag_inputs() -> list[str]:
    """Inputs for the fixed custom-TagSet differential (Harness.java
    op customtree: x-raw=Data, x-rc=RcData, custom-pre=PreserveWs+Block,
    custom-widget=TextBoundary, u-*=SelfClose, v-void=Void) — mirrored by
    tests/test_tagset.py::_custom_tagset."""
    import random
    cases = [
        "<x-raw><b>&amp;raw</b></x-raw>after",
        "<x-rc><b>&amp;rc</b></x-rc>after",
        "<x-rc>text</x-rc><p>next",
        "<custom-pre>\n\nFoo\n Bar</custom-pre>",
        "<p>One<custom-widget>Two</custom-widget>Three</p>",
        "<u-a />Bar <u-b/>Baz<u-c></u-c>tail",
        "<v-void>content<p>after",
        "<div><x-raw>unclosed raw",
        "<x-rc>unclosed rc",
        "<custom-pre><pre>inner</pre></custom-pre>",
        "<u-a attr='1'/><u-a attr=2>x</u-a>",
        "<table><tr><td><x-raw><td>2</x-raw></table>",
        "<p>a<x-raw><!-- not comment --></x-raw>b",
        "<X-RAW>UPPER</X-RAW>done",
        "<x-raw></X-RAW>case",
        "mix " * 30 + "<u-z/><x-raw>deep</x-raw>tail",
        "<custom-widget><b>bold</b> inner</custom-widget>",
        "<v-void/><p>x",
        "<x-rc>&lt;esc&gt;</x-rc>z",
        "<x-raw>&lt;notdecoded</x-raw>z",
    ]
    rng = random.Random(42)
    frag = ["<p>t%d</p>", "<x-raw>r%d</x-raw>", "<x-rc>c%d</x-rc>", "<u-q/>",
            "<b>b%d", "<custom-pre> p%d </custom-pre>",
            "<custom-widget>w%d</custom-widget>", "<v-void>", "text%d "]
    for i in range(40):
        parts = [rng.choice(frag) for _ in range(rng.randint(2, 8))]
        cases.append("".join(p % i if "%d" in p else p for p in parts))
    return cases


def w3c_inputs() -> list[tuple[str, str]]:
    """Inputs for the W3CDom-conversion differential (Harness op w3ctree;
    mirrored by tests/test_w3cdom.py). mode '' = html parse, 'xml' = xml.
    Per-attribute namespaces: XML-declared prefixed attributes resolve to
    true namespaced W3C attrs (XmlTreeBuilder applyNamespacesToAttributes
    -> W3CDom setAttributeNS); HTML parses never bind attr namespaces."""
    import random
    cases = [
        # XML-declared attribute namespaces (true setAttributeNS path)
        ("<svg xmlns='http://www.w3.org/2000/svg' "
         "xmlns:xlink='http://www.w3.org/1999/xlink'>"
         "<use xlink:href='#a'/></svg>", "xml"),
        ("<r xmlns:p='http://p.example'><c p:k='1' k='2'/></r>", "xml"),
        ("<r xml:lang='en'><c xml:space='preserve'>t</c></r>", "xml"),
        ("<a:r xmlns:a='http://a.example' a:x='1'><a:c a:y='2'/></a:r>",
         "xml"),
        ("<r><c undeclared:k='v'/></r>", "xml"),
        ("<r xmlns:o='http://o.example'><c xmlns:i='http://i.example' "
         "o:a='1' i:b='2'/><d o:c='3'/></r>", "xml"),
        # HTML parse keeps prefixed NAMES, no attr namespace binding
        ("<svg><use xlink:href='#b'/></svg>", ""),
        ("<p xml:lang='en'>h</p>", ""),
        ("<p>One</p>", ""),
        ("<!DOCTYPE html><html><head><title>T</title></head>"
         "<body><p class=a id=b>x<br>y</p></body></html>", ""),
        ("<div><svg viewBox='0 0 1 1'><circle r='1'/></svg>"
         "<math><mi>x</mi></math></div>", ""),
        ("<p 'weird'=1 ok=2>x", ""),
        ("<p data-x='1' v-bind:href='y'>t</p>", ""),
        ("<p><!-- c --><script>d()</script></p>", ""),
        ("<template><p>in</p></template>", ""),
        ("<p =bare empty>x", ""),
        ("<P CLASS=UP>case</P>", ""),
        ("<div xmlns:v='http://v.example'><p v:k='1'>x</p></div>", ""),
        ("<root><a:b/><c d='1'/>text<![CDATA[cd]]></root>", "xml"),
        ("<?xml version='1.0'?><r><n>t</n></r>", "xml"),
        ("<table><tr><td>1<td>2</table>", ""),
        ("<ul><li>a<li>b</ul><p>&amp; &lt;</p>", ""),
        ("<p>a<b>b<i>c</b>d</i>e</p>", ""),
        ("<img src=x alt='y'><input disabled>", ""),
    ]
    rng = random.Random(5)
    frag = ["<p id=p%d>t%d</p>", "<div class='c%d d'>", "</div>",
            "<span v-on:x='%d'>s</span>", "<b>x%d",
            "<svg><rect w='%d'/></svg>", "<!--m%d-->", "word%d "]
    for i in range(30):
        parts = []
        for _ in range(rng.randint(2, 6)):
            f = rng.choice(frag)
            parts.append(f % tuple([i] * f.count("%d")))
        cases.append(("".join(parts), ""))
    return cases


CASETREE_MODES = ["tt", "tf", "ft", "ff"]


def casetree_inputs() -> list[str]:
    """Inputs for the ParseSettings case-preservation differential
    (Harness op casetree; parser/ParseSettings.java). Each input is run
    under all four (preserveTagCase, preserveAttributeCase) combos."""
    cases = [
        "<DIV Class=Up ID=One><P>x</P></DIV>",
        "<p CLASS=a class=b Class=c>dedupe</p>",
        "<TABLE><TR><TD Colspan=2>t</TABLE>",
        "<SVG viewBox='0 0 1 1'><FOREIGNOBJECT><P>h</P></FOREIGNOBJECT></SVG>",
        "<svg><feMerge/><altGlyph/></svg><math><mi>x</mi></math>",
        "<A HREF=/x TITLE=Zed>l</A><IMG SRC=y ALT=z>",
        "<SCRIPT>var A=1;</SCRIPT><STYLE>B{}</STYLE>",
        "<Body><UL><LI>a<LI>b</UL>",
        "<FORM Action=/f><INPUT Type=Text Name=Q Value=V></FORM>",
        "<SPAN Data-Foo=Bar DATA-FOO=baz>dd</SPAN>",
        "<B><I>nest</B></I>",
        "<TeXtArEa>RaW &amp;</tExTaReA>after",
        "<TITLE>T</TITLE><META Charset=UTF-8>",
        "<CUSTOM-Tag Attr=1>c</CUSTOM-Tag>",
        "<p TITLE=a title=b>first-wins vs case</p>",
        "<NOSCRIPT><P>ns</P></NOSCRIPT>",
        "<Pre>  sp  </Pre>",
        "<H1 ID=UP>h</H1><EM>e</EM><Strong>s</Strong>",
        "<DL><DT>t<DD>d</DL>",
        "<OBJECT Data=x><PARAM Name=N Value=V></OBJECT>",
    ]
    rng = random.Random(77)
    frag = ["<DiV iD=d%d>", "</dIv>", "<P Class='C%d c'>t%d</P>",
            "<B>x%d", "<Span TITLE=s%d>s</Span>", "<BR>", "Word%d ",
            "<TABLE><TR><TD>c%d</TABLE>", "<SVG><RECT W='%d'/></SVG>"]
    for i in range(30):
        parts = []
        for _ in range(rng.randint(2, 6)):
            f = rng.choice(frag)
            parts.append(f % tuple([i] * f.count("%d")))
        cases.append("".join(parts))
    return cases


CHARSETDOC_CASES = [
    # (html, charset-arg) — charset-arg is "CHARSET" or "CHARSET|xml"
    ("<html><head><title>T</title></head><body>x</body></html>", "UTF-8"),
    ("<p>no head structure", "ISO-8859-1"),
    ("<html><head><meta charset=UTF-8><title>T</title></head>"
     "<body>b</body></html>", "windows-1252"),
    ("<html><head><meta name=charset content=x><meta charset=old>"
     "</head><body>y</body></html>", "UTF-16"),
    ("<html><head><meta name=CharSet content=a></head><body>z</body>"
     "</html>", "US-ASCII"),
    ("<!DOCTYPE html><html><head></head><body>d</body></html>", "UTF-8"),
    ("plain text only", "Shift_JIS"),
    ("<html><head><title>x</title></head><body>b</body></html>",
     "UTF-8|xml"),
    ("<?xml version='1.0' encoding='old'?><html><body>p</body></html>",
     "ISO-8859-1|xml"),
    ("<html><body>noxmldecl</body></html>", "EUC-KR|xml"),
    ("<html><head><meta charset=a><meta charset=b></head><body>m</body>"
     "</html>", "GBK"),
    ("<head><meta http-equiv=Content-Type content='text/html; charset=x'>"
     "</head><body>he</body>", "KOI8-R"),
]


def main() -> None:
    cp = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jsoupbuild/out"
    os.makedirs(FIXDIR, exist_ok=True)

    struct = structural_inputs()
    tok = tokenizer_inputs()
    tree_inputs = struct + tok
    spans_in = span_inputs()
    fuzz_sel = select_fuzz()

    ops: list[tuple] = []
    ops += [("tree", h, "") for h in tree_inputs]
    ops += [("text", h, "") for h in struct]
    ops += [("wholetext", h) for h in struct[:200]]
    ops += [("title", h) for h in struct[:200]]
    ops += [("spans", h, BASE_URI) for h in spans_in]
    ops += [("select", SELECT_DOC, q) for q in SELECT_QUERIES]
    ops += [("select", d, q) for d, q in fuzz_sel]
    ops += [("clean", h, p) for h, p in CLEAN_CASES]
    ops += [("bodyhtml", h, "") for h in struct]
    ops += [("fragtree", h, ctx) for h, ctx in FRAGMENT_CASES]
    xml_inputs = XML_CASES + xml_fuzz()
    ops += [("xmltree", h, "") for h in xml_inputs]
    # positions: Java offsets are UTF-16 units; the engine's
    # utf16_offsets=True mode converts, so astral inputs run UNFILTERED
    # (tests parse with utf16_offsets=True)
    pos_html = list(tree_inputs) + [
        # astral-plane cases: exercise the UTF-16 code-unit offset mode
        "\U0001F600<p id=x>hi</p>",
        "<p>a\U0001F600b</p><div title='\U0001F680 go'>tail",
        "<pre>\n\U0001F600</pre><b>\U0001F4A9</b> end",
        "a\U0001F600<!--c-->\U0001F600<span>\U0001F600</span>",
        "<table><tr><td>\U0001F600<td>x</table>\U0001F600",
    ]
    pos_xml = list(xml_inputs) + [
        "<r a='\U0001F600'>x\U0001F600y<c/></r>",
        "\U0001F600<r>\U0001F600</r>",
    ]
    ops += [("positions", h) for h in pos_html]
    ops += [("posxml", h) for h in pos_xml]
    customtag_cases = customtag_inputs()
    ops += [("customtree", h) for h in customtag_cases]
    w3c_cases = w3c_inputs()
    ops += [("w3ctree", h, m) for h, m in w3c_cases]
    case_cases = casetree_inputs()
    ops += [("casetree", h, m) for h in case_cases for m in CASETREE_MODES]
    ops += [("charsetdoc", h, a) for h, a in CHARSETDOC_CASES]

    results = run_harness(cp, ops)
    i = 0

    def take(n):
        nonlocal i
        out = results[i:i + n]
        i += n
        return out

    tree_gold = take(len(tree_inputs))
    text_gold = take(len(struct))
    whole_gold = take(200)
    title_gold = take(200)
    spans_gold = take(len(spans_in))
    selq_gold = take(len(SELECT_QUERIES))
    self_gold = take(len(fuzz_sel))
    clean_gold = take(len(CLEAN_CASES))
    bodyhtml_gold = take(len(struct))
    frag_gold = take(len(FRAGMENT_CASES))
    xml_gold = take(len(xml_inputs))
    pos_html_gold = take(len(pos_html))
    pos_xml_gold = take(len(pos_xml))
    customtag_gold = take(len(customtag_cases))
    w3c_gold = take(len(w3c_cases))
    case_gold = take(len(case_cases) * len(CASETREE_MODES))
    charsetdoc_gold = take(len(CHARSETDOC_CASES))
    assert i == len(results)

    def dump(name, obj):
        with open(os.path.join(FIXDIR, name), "w") as f:
            json.dump(obj, f, ensure_ascii=False)
        print(name, os.path.getsize(os.path.join(FIXDIR, name)) // 1024, "KB")

    dump("golden_tree.json", [
        {"html": h, "tree": g} for h, g in zip(tree_inputs, tree_gold)])
    dump("golden_text.json", {
        "text": [{"html": h, "out": g} for h, g in zip(struct, text_gold)],
        "wholetext": [{"html": h, "out": g} for h, g in zip(struct, whole_gold)],
        "title": [{"html": h, "out": g} for h, g in zip(struct, title_gold)],
    })
    dump("golden_spans.json", {
        "base_uri": BASE_URI,
        "cases": [{"html": h, "spans": g} for h, g in zip(spans_in, spans_gold)],
    })
    dump("golden_select.json", {
        "doc": SELECT_DOC,
        "queries": [{"q": q, "out": g} for q, g in zip(SELECT_QUERIES, selq_gold)],
        "fuzz": [{"doc": d, "q": q, "out": g}
                 for (d, q), g in zip(fuzz_sel, self_gold)],
    })
    dump("golden_clean.json", [
        {"html": h, "safelist": p, "out": g}
        for (h, p), g in zip(CLEAN_CASES, clean_gold)])
    dump("golden_bodyhtml.json", [
        {"html": h, "out": g} for h, g in zip(struct, bodyhtml_gold)])
    dump("golden_fragment.json", [
        {"html": h, "context": c, "tree": g}
        for (h, c), g in zip(FRAGMENT_CASES, frag_gold)])
    dump("golden_xml.json", [
        {"xml": h, "tree": g} for h, g in zip(xml_inputs, xml_gold)])
    dump("golden_positions.json", {
        "html": [{"html": h, "out": g} for h, g in zip(pos_html, pos_html_gold)],
        "xml": [{"xml": h, "out": g} for h, g in zip(pos_xml, pos_xml_gold)],
    })
    dump("golden_customtags.json", [
        {"html": h, "out": g} for h, g in zip(customtag_cases, customtag_gold)])
    dump("golden_w3cdom.json", [
        {"html": h, "mode": m, "out": g}
        for (h, m), g in zip(w3c_cases, w3c_gold)])
    case_items = []
    gi = iter(case_gold)
    for h in case_cases:
        for m in CASETREE_MODES:
            g = next(gi)
            tree, _, html_out = g.partition("")
            case_items.append(
                {"html": h, "mode": m, "tree": tree, "out": html_out})
    dump("golden_casetree.json", case_items)
    dump("golden_charsetdoc.json", [
        {"html": h, "arg": a, "out": g}
        for (h, a), g in zip(CHARSETDOC_CASES, charsetdoc_gold)])

    # wild corpus: hashes only (content stays in the reference tree)
    wild = []
    files = sorted(glob.glob("/root/reference/src/test/resources/htmltests/*"))
    wild_ops = []
    metas = []
    for f in files:
        data = gzip.open(f, "rb").read() if f.endswith(".gz") else open(f, "rb").read()
        try:
            html = data.decode("utf-8")
        except UnicodeDecodeError:
            continue
        metas.append(f)
        wild_ops.append(("tree", html, ""))
        wild_ops.append(("text", html, ""))
    wild_res = run_harness(cp, wild_ops)
    for j, f in enumerate(metas):
        wild.append({
            "path": f,
            "tree_sha": hashlib.sha256(wild_res[2 * j].encode()).hexdigest(),
            "text_sha": hashlib.sha256(wild_res[2 * j + 1].encode()).hexdigest(),
        })
    dump("golden_wild.json", wild)


if __name__ == "__main__":
    main()
