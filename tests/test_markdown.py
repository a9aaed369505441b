"""HTML -> Markdown (extract/markdown.py)."""

from jsoup_spark import parse
from jsoup_spark.extract.markdown import markdown_stage, to_markdown
from jsoup_spark.parser.treebuilder import HtmlTreeBuilder


def md(html, base=""):
    return to_markdown(HtmlTreeBuilder().parse(html, base))


def test_headings_paragraphs_hr():
    assert md("<h1>One</h1><p>Body text.</p><hr><h3>Three</h3>") == \
        "# One\n\nBody text.\n\n---\n\n### Three"


def test_inline_marks_and_code():
    assert md("<p>a <b>bold</b> and <em>it</em> and <code>x*y</code>"
              "</p>") == "a **bold** and *it* and `x*y`"
    # code content is NOT escaped; surrounding text is
    assert md("<p>lit *star* here</p>") == r"lit \*star\* here"


def test_links_and_images_absolutized():
    out = md('<p><a href="/p">go</a> <img src="/i.png" alt="pic"></p>',
             base="http://e.com/a/")
    assert out == "[go](http://e.com/p) ![pic](http://e.com/i.png)"


def test_lists_nested_and_ordered():
    out = md("<ul><li>a</li><li>b<ol><li>c</li><li>d</li></ol></li>"
             "</ul>")
    assert out == "- a\n- b\n  1. c\n  2. d"


def test_blockquote_nested():
    out = md("<blockquote><p>quoted</p>"
             "<blockquote><p>deeper</p></blockquote></blockquote>")
    assert out == "> quoted\n>\n> > deeper"


def test_pre_fenced_with_language():
    out = md('<pre><code class="language-py">x = 1\n  y = 2</code>'
             '</pre>')
    assert out == "```py\nx = 1\n  y = 2\n```"


def test_table_pipe_form():
    out = md("<table><tr><th>H1</th><th>H2</th></tr>"
             "<tr><td>a</td><td>b</td></tr></table>")
    assert out == ("| H1 | H2 |\n| --- | --- |\n| a | b |")


def test_script_dropped_and_br():
    assert md("<p>x<script>evil()</script>y</p>") == "xy"
    assert md("<p>a<br>b</p>") == "a  \nb"


def test_block_start_escape():
    assert md("<p># not a heading</p>") == r"\# not a heading"
    assert md("<p>- not a list</p>") == r"\- not a list"
    assert md("<p>3. not ordered</p>") == r"3\. not ordered"


def test_loose_text_and_divs():
    assert md("<div>first</div>loose<div><p>second</p></div>") == \
        "first\n\nloose\n\nsecond"


def test_stage_spark(spark):
    rows = [(str(i), f"<h2>T{i}</h2><p>body {i}</p>")
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id string, html string")
    out = {r["doc_id"]: r["markdown"]
           for r in markdown_stage(df).collect()}
    for i in range(4):
        assert out[str(i)] == f"## T{i}\n\nbody {i}"
