"""Deterministic interleaved-span corpus synthesizer.

Builds the engine's input table (doc_id, spans<kind,text,media_ref,offset>)
from the driver-provided ``documents`` parquet — entirely with Catalyst
expressions (no Python row code), so the same plan scales from test SF to a
full cluster run. The generated HTML is a deterministic function of
(doc_id, text, lang, source), which lets DuckDB oracles recompute expected
extraction outputs symbolically.

Shape knobs:
* ``repeat`` — heavy-tail amplification: doc_id % 97 == 0 docs get their
  body text repeated 32x, %31 == 0 16x, %7 == 0 4x (skew for bucketing
  tests; FIXTURES.md §W).
* html spans are chunked at tag boundaries into multiple 'html' spans, and
  a standalone 'media' span is interleaved, exercising reassembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic html skeleton; every piece mirrored in oracle SQL
TITLE_PREFIX = "Doc "
IMG_BASE = "http://img.example/"
BASE_URI = "http://corpus.example/docs/"


def body_repeat_expr(col="doc_id"):
    """Heavy-tail repeat factor (1/4/16/32) as a Catalyst expression."""
    d = F.col(col).cast("long")
    return (
        F.when(d % 97 == 0, F.lit(32))
        .when(d % 31 == 0, F.lit(16))
        .when(d % 7 == 0, F.lit(4))
        .otherwise(F.lit(1))
    )


def synthesize(documents: DataFrame, with_media: bool = True) -> DataFrame:
    """documents(doc_id,text,lang,source,n_chars) -> interleaved span table."""
    d = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("text"),
        F.col("lang"),
        F.col("source"),
        body_repeat_expr("doc_id").alias("rep"),
    )
    body = F.concat_ws(" ", F.array_repeat(F.col("text"), F.col("rep").cast("int")))
    head_html = F.concat(
        F.lit("<html><head><title>" + TITLE_PREFIX),
        F.col("doc_id"),
        F.lit("</title><base href='" + BASE_URI + "'></head><body>"),
    )
    para_html = F.concat(
        F.lit("<div id=main class='"),
        F.col("lang"),
        F.lit(" article'><p>"),
        body,
        F.lit("</p>"),
    )
    img_html = F.concat(
        F.lit("<img src='img/"),
        F.col("doc_id"),
        F.lit(".png' alt='fig "),
        F.col("doc_id"),
        F.lit("'>"),
    )
    tail_html = F.concat(
        F.lit("<ul><li>"),
        F.col("source"),
        F.lit("</li><li>"),
        F.col("lang"),
        F.lit("</li></ul><script>track('"),
        F.col("doc_id"),
        F.lit("');</script></div></body></html>"),
    )

    def span(kind, text, media_ref, offset):
        return F.struct(
            F.lit(kind).alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            F.lit(offset).cast("int").alias("offset"),
        )

    empty = F.lit("")
    spans = F.array(
        span("html", head_html, empty, 0),
        span("html", para_html, empty, 1),
        span("media",
             F.concat(F.lit("standalone media for "), F.col("doc_id")),
             F.concat(F.lit(IMG_BASE), F.col("doc_id"), F.lit("/cover.jpg")),
             2),
        span("html", img_html if with_media else F.lit(""), empty, 3),
        span("html", tail_html, empty, 4),
    )
    return d.select("doc_id", spans.alias("spans"))


def assemble_html(docs: DataFrame, base_uri_lit: str = BASE_URI) -> DataFrame:
    """Reconstruct raw HTML per doc: concat of kind='html' span texts in
    offset order — pure Catalyst (array_sort/filter/transform/array_join),
    no shuffle, no Python."""
    html = F.array_join(
        F.transform(
            F.array_sort(F.filter(F.col("spans"), lambda s: s["kind"] == "html"),
                         lambda a, b: a["offset"] - b["offset"]),
            lambda s: s["text"],
        ),
        "",
    )
    return docs.select(
        "doc_id",
        html.alias("html"),
        F.length(html).alias("html_len"),
        F.lit(base_uri_lit).alias("base_uri"),
    )
