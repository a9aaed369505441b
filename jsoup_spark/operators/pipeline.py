"""The extraction pipeline: tokenize → tree-build → extract → spans.

Spark-first layering:
* plan-level stages (reassembly, bucketing, joins, aggregation) are pure
  Catalyst expressions;
* the per-document algorithms (WHATWG parse, selector eval, cleaning) run
  inside ``mapInPandas`` over Arrow batches — batched, never row-at-a-time
  Python UDFs.

Scale design (north rule):
* ``bucket_by_size`` range-partitions on html length so a handful of
  100MB documents can't straggle one partition (heavy-tail skew);
* Arrow batch size is the backstop for memory (one batch of giant docs
  stays bounded via spark.sql.execution.arrow.maxRecordsPerBatch);
* every batch also yields per-partition metric counters (docs, bytes,
  parse errors) that the caller can aggregate and checkpoint for lineage;
* resume is an anti-join of input doc_ids against the checkpointed output
  (see sinks.checkpoint / sinks.remaining).

Output span contract (per-row invariant, BASELINE.json):
  spans = [title?] ++ walk(html)   where walk emits text/media/data spans
  ++ input spans with kind='media' (doc-level attachments, offset order).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import schemas
from ..clean import safelist as safelist_mod
from ..clean.cleaner import clean_document
from ..clean.serializer import inner_html
from ..extract.spans import extract_spans, stream_spans
from ..parser.treebuilder import HtmlTreeBuilder
from ..select.selector import compile_query, select
from ..sources.corpus import BASE_URI, assemble_html

# ---------------------------------------------------------------- bucketing


def bucket_by_size(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Range-partition docs by html length so giant docs spread evenly.

    At 100TB this is the skew lever: the shuffle key is (size_class, salt),
    keeping each partition's total bytes comparable instead of its row
    count (SURVEY §4.3)."""
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    salted = df.withColumn(
        "_size_class",
        F.ceil(F.log2(F.greatest(F.col("html_len"), F.lit(1)))).cast("int"),
    ).withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(64)).cast("int")
    )
    # hash partitioning, NOT repartitionByRange: range partitioning runs a
    # sampling pass that executes the upstream twice. Hashing (size_class,
    # salt) spreads each size class across partitions with one shuffle.
    out = salted.repartition(partitions, "_size_class", "_salt")
    return out.drop("_size_class", "_salt")


# ---------------------------------------------------------------- extract

def _parse_doc(html: str, base_uri: str):
    tb = HtmlTreeBuilder()
    doc = tb.parse(html, base_uri)
    return doc


def extract_stage(docs: DataFrame, *, bucket: bool = False,
                  stream_threshold: int = 8 << 20) -> DataFrame:
    """Interleaved span table -> extracted span table (+ per-doc metrics).

    Input: (doc_id, spans) per schemas.DOC_IN. Output: schemas.EXTRACT_OUT.

    ``bucket=True`` adds the size-class/salt shuffle for corpora with a
    heavy giant-document tail. Default off: for byte-balanced inputs
    (e.g. size-partitioned Iceberg writes or uniform scrapes) the shuffle
    of the full html payload costs more than the skew it prevents; turn it
    on when a partition can end up owning multiple 100MB documents.

    ``stream_threshold``: docs whose html exceeds this many chars take the
    progressive StreamParser path (extract.spans.stream_spans) — completed
    top-level chunks are extracted and pruned as the parse advances, so a
    100MB document never holds its full DOM in worker memory (the
    giant-doc backstop; output is identical to the full-parse path).
    Set 0 to force streaming, or a negative value to disable.
    """
    # html + input media spans in ONE projection — a join here would shuffle
    # the whole corpus against itself.
    # sort_array over offset-FIRST structs instead of array_sort with a
    # comparator lambda: the comparator is interpreted per comparison,
    # while sort_array's natural struct ordering stays in codegen (offsets
    # are unique per doc per the input contract, so the orders agree).
    media_in = F.sort_array(F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == "media"),
        lambda s: F.struct(s["offset"].alias("offset"),
                           s["text"].alias("text"),
                           s["media_ref"].alias("media_ref"))))
    html = F.array_join(
        F.transform(
            F.sort_array(F.transform(
                F.filter(F.col("spans"), lambda s: s["kind"] == "html"),
                lambda s: F.struct(s["offset"].alias("o"),
                                   s["text"].alias("t")))),
            lambda s: s["t"],
        ),
        "",
    )
    # column-pruning audit (r8): base_uri is a corpus-level constant and
    # html_len is only the bucketing key — neither belongs in the Arrow
    # transfer. base_uri rides the closure; html_len exists only on the
    # bucketed plan and is dropped again before the exchange output is
    # serialized to Python.
    base_uri = BASE_URI
    prepared = docs.select(
        "doc_id",
        html.alias("html"),
        media_in.alias("_media_in"),
    )
    if bucket:
        prepared = bucket_by_size(
            prepared.withColumn("html_len", F.length("html"))
        ).drop("html_len")

    import pyarrow as pa

    span_type = pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("order", pa.int32())])
    out_schema = pa.schema([
        ("doc_id", pa.string()),
        ("spans", pa.list_(span_type)),
        ("n_spans", pa.int32()),
        ("n_parse_errors", pa.int32()),
        ("bytes_tokenized", pa.int64()),
    ])

    # r9 transport-overlap experiment (VERDICT r8 #3): flushing output
    # every N docs so the JVM reader deserializes chunk K while Python
    # parses K+1 was measured paired-in-one-session at sf0.1/x20:
    # unchunked 0.537 s min-wall vs 768-chunk 0.576 vs 256-chunk 0.590 —
    # per-chunk RecordBatch assembly outweighs the overlap, the same
    # conclusion NOTES_r8 reached for input batch sizing. Default is
    # therefore "one output batch per input batch" (off); the env knob
    # stays for re-probing on other topologies.
    out_chunk = int(os.environ.get("JSOUP_SPARK_EXTRACT_OUT_CHUNK",
                                   "1000000000"))

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        # mapInArrow, not mapInPandas: the output spans are nested structs
        # and the pandas->arrow conversion of nested objects dominates the
        # stage; building the RecordBatch directly halves the overhead
        for batch in batches:
            idx = {n: i for i, n in enumerate(batch.schema.names)}
            doc_ids = batch.column(idx["doc_id"])
            if doc_ids.type != pa.string():
                doc_ids = doc_ids.cast(pa.string())
            htmls = batch.column(idx["html"]).to_pylist()
            # flat columnar read of the (already offset-sorted) media spans:
            # to_pylist on the nested list<struct> built one dict per span,
            # which dominated batch overhead on media-bearing corpora
            media_col = batch.column(idx["_media_in"])
            m_off = media_col.offsets.to_pylist()  # n+1 (slice-aware)
            m_vals = media_col.values
            m_texts = m_vals.field("text").to_pylist()
            m_refs = m_vals.field("media_ref").to_pylist()
            # column-wise span assembly: flat field lists + offsets beat
            # pa.array() over per-span python dicts by a wide margin.
            # Output flushes every `out_chunk` docs rather than once per
            # input batch (r9, guide-§2.6-style overlap inside the task):
            # the JVM's reader thread deserializes and counts chunk K
            # while this worker parses chunk K+1, hiding most of the
            # output leg of the serialize->parse->read phase chain that
            # batch-size sweeps alone could not move (NOTES_r8 §1).
            kinds: list = []
            texts: list = []
            refs: list = []
            orders: list = []
            offsets = [0]
            out_n, out_err, out_bytes = [], [], []
            chunk_start = 0

            def flush(upto: int):
                nonlocal kinds, texts, refs, orders, offsets
                nonlocal out_n, out_err, out_bytes, chunk_start
                struct = pa.StructArray.from_arrays(
                    [pa.array(kinds, pa.string()),
                     pa.array(texts, pa.string()),
                     pa.array(refs, pa.string()),
                     pa.array(orders, pa.int32())],
                    fields=list(span_type))
                spans_col = pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), struct)
                rb = pa.RecordBatch.from_arrays([
                    doc_ids.slice(chunk_start, upto - chunk_start),
                    spans_col,
                    pa.array(out_n, pa.int32()),
                    pa.array(out_err, pa.int32()),
                    pa.array(out_bytes, pa.int64()),
                ], schema=out_schema)
                kinds, texts, refs, orders = [], [], [], []
                offsets = [0]
                out_n, out_err, out_bytes = [], [], []
                chunk_start = upto
                return rb

            for di, html in enumerate(htmls):
                if stream_threshold >= 0 and len(html) > stream_threshold:
                    errs: list = []
                    tuples = stream_spans(html, base_uri, errors_out=errs)
                    n_errors = len(errs)
                else:
                    doc = _parse_doc(html, base_uri)
                    tuples = extract_spans(doc)
                    n_errors = len(doc.errors)
                for k, t, r, _ord in tuples:
                    kinds.append(k)
                    texts.append(t)
                    refs.append(r)
                order = len(tuples)
                orders.extend(range(order))
                for j in range(m_off[di], m_off[di + 1]):
                    kinds.append("media")
                    texts.append(m_texts[j] or "")
                    refs.append(m_refs[j] or "")
                    orders.append(order)
                    order += 1
                offsets.append(offsets[-1] + order)
                out_n.append(order)
                out_err.append(n_errors)
                out_bytes.append(len(html))
                if di + 1 - chunk_start >= out_chunk:
                    yield flush(di + 1)
            if out_n or not htmls:
                yield flush(len(htmls))

    return prepared.mapInArrow(run, schema=schemas.EXTRACT_OUT)


def partition_metrics(extracted: DataFrame) -> DataFrame:
    """Per-partition lineage counters (north rule metrics/lineage rows)."""
    return (
        extracted
        .withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum("bytes_tokenized").alias("bytes_tokenized"),
            F.sum("n_parse_errors").alias("parse_errors"),
            F.sum("n_spans").alias("spans_out"),
        )
    )


# ---------------------------------------------------------------- select

def select_stage(docs: DataFrame, query: str, *, bucket: bool = False,
                 first_only: bool = False, language: str = "css") -> DataFrame:
    """CSS- or XPath-select over each document; one output row per match.

    The query is compiled once per executor batch (cost-ordered evaluator
    tree for CSS, SURVEY §2.c; XPath-subset AST for language='xpath',
    reference Element.selectXpath, nodes/Element.java:784-801) and
    evaluated over the per-doc DOM.
    """
    if language == "css":
        compiler, evaluate = compile_query, select
    elif language == "xpath":
        from ..select.xpath import compile_xpath, select_xpath
        compiler, evaluate = compile_xpath, select_xpath
    else:
        raise ValueError(f"unknown query language {language!r}")
    compiler(query)  # fail fast on driver for bad queries
    base_uri = BASE_URI
    prepared = assemble_html(docs)
    if bucket:
        prepared = bucket_by_size(prepared)
    # prune the Arrow transfer to what the workers read: base_uri is a
    # corpus constant (closure) and html_len only keys the bucket shuffle
    prepared = prepared.select("doc_id", "html")

    import pyarrow as pa

    # mapInArrow, not mapInPandas: a selective selector can legitimately
    # produce ZERO matches for a whole batch (reference Selector.select
    # returns empty Elements, select/Selector.java:126-142). A pandas
    # empty frame defaults its columns to float64, which pyarrow cannot
    # convert to the attrs map<string,string> field — building the typed
    # RecordBatch directly makes the empty batch a first-class result
    # (and drops the dict->map conversion overhead on the hot path).
    out_schema = pa.schema([
        ("doc_id", pa.string()), ("match_idx", pa.int32()),
        ("tag", pa.string()), ("el_id", pa.string()),
        ("own_text", pa.string()), ("text", pa.string()),
        ("attrs", pa.map_(pa.string(), pa.string())),
    ])

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        ev = compiler(query)
        for batch in batches:
            idx = {n: i for i, n in enumerate(batch.schema.names)}
            doc_ids = batch.column(idx["doc_id"]).to_pylist()
            htmls = batch.column(idx["html"]).to_pylist()
            out_doc: list = []
            out_idx: list = []
            out_tag: list = []
            out_id: list = []
            out_own: list = []
            out_text: list = []
            # flat key/value lists + per-row offsets for the map column
            akeys: list = []
            avals: list = []
            aoffs = [0]
            for doc_id, html in zip(doc_ids, htmls):
                doc = _parse_doc(html, base_uri)
                matches = evaluate(doc, ev)
                if first_only:
                    matches = matches[:1]
                for i, el in enumerate(matches):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_tag.append(el.name)
                    out_id.append(el.attr("id"))
                    out_own.append(el.own_text())
                    out_text.append(el.text())
                    for k, v in el.attrs.items():
                        akeys.append(k)
                        avals.append(v if v is not None else "")
                    aoffs.append(len(akeys))
            attrs_col = pa.MapArray.from_arrays(
                pa.array(aoffs, pa.int32()),
                pa.array(akeys, pa.string()),
                pa.array(avals, pa.string()))
            yield pa.RecordBatch.from_arrays([
                pa.array(out_doc, pa.string()),
                pa.array(out_idx, pa.int32()),
                pa.array(out_tag, pa.string()),
                pa.array(out_id, pa.string()),
                pa.array(out_own, pa.string()),
                pa.array(out_text, pa.string()),
                attrs_col,
            ], schema=out_schema)

    return prepared.mapInArrow(run, schema=schemas.SELECT_OUT)


def positions_stage(docs: DataFrame, query: str) -> DataFrame:
    """Source-position extraction: parse with range tracking
    (Parser.setTrackPosition, nodes/Range.java) and emit the source ranges
    of elements matched by a CSS query — one row per match with
    (src_start, src_end) of the open tag and (end_start, end_end) of the
    close tag (implicit ranges are zero-width, Range.isImplicit)."""
    compile_query(query)
    base_uri = BASE_URI
    prepared = assemble_html(docs).select("doc_id", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..parser.treebuilder import HtmlTreeBuilder
        ev = compile_query(query)
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "match_idx", "tag",
                                    "src_start", "src_end",
                                    "end_start", "end_end")}
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                doc = HtmlTreeBuilder().parse(html, base_uri,
                                              track_positions=True)
                for i, el in enumerate(select(doc, ev)):
                    src = el.source_range() or (-1, -1)
                    end = el.end_source_range() or (-1, -1)
                    rows["doc_id"].append(doc_id)
                    rows["match_idx"].append(i)
                    rows["tag"].append(el.name)
                    rows["src_start"].append(src[0])
                    rows["src_end"].append(src[1])
                    rows["end_start"].append(end[0])
                    rows["end_end"].append(end[1])
            pdf_out = pd.DataFrame(rows)
            for c in ("match_idx", "src_start", "src_end", "end_start",
                      "end_end"):
                pdf_out[c] = pdf_out[c].astype("int32")
            yield pdf_out

    return prepared.mapInPandas(run, schema=schemas.POSITIONS_OUT)


# ------------------------------------------------------- fragment / xml

def fragment_stage(docs: DataFrame, context: str,
                   fragment_col: str = "fragment_html") -> DataFrame:
    """Fragment parse in a context element (Parser.parseFragment,
    reference HtmlTreeBuilder.java:88-143): one output row per top-level
    parsed node that is an element — (doc_id, node_idx, tag, text).

    Exercises the fragment machinery end to end (context-driven initial
    insertion mode, implied cells/rows, re-homing of content pushed
    outside the context root)."""
    from ..parser.nodes import Element
    from ..parser.treebuilder import HtmlTreeBuilder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "node_idx", "tag", "text")}
            for doc_id, frag in zip(pdf["doc_id"], pdf[fragment_col]):
                nodes = HtmlTreeBuilder().parse_fragment(frag, context)
                idx = 0
                for n in nodes:
                    if isinstance(n, Element):
                        rows["doc_id"].append(doc_id)
                        rows["node_idx"].append(idx)
                        rows["tag"].append(n.name)
                        rows["text"].append(n.text())
                        idx += 1
            pdf_out = pd.DataFrame(rows)
            pdf_out["node_idx"] = pdf_out["node_idx"].astype("int32")
            yield pdf_out

    return docs.select("doc_id", fragment_col).mapInPandas(
        run, schema=schemas.FRAGMENT_OUT)


def xml_stage(docs: DataFrame, xml_col: str = "xml") -> DataFrame:
    """XML parse (Parser.xmlParser semantics, reference parser/
    XmlTreeBuilder.java): one output row per element in document order —
    (doc_id, el_idx, tag, own_text). CDATA sections contribute to text."""
    from ..parser.nodes import Element
    from ..parser.xmlbuilder import parse_xml

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "el_idx", "tag", "own_text")}
            for doc_id, xml in zip(pdf["doc_id"], pdf[xml_col]):
                doc = parse_xml(xml)
                idx = 0
                stack = list(reversed(doc.children))
                while stack:
                    n = stack.pop()
                    if isinstance(n, Element):
                        rows["doc_id"].append(doc_id)
                        rows["el_idx"].append(idx)
                        rows["tag"].append(n.name)
                        rows["own_text"].append(n.own_text())
                        idx += 1
                        stack.extend(reversed(n.children))
            pdf_out = pd.DataFrame(rows)
            pdf_out["el_idx"] = pdf_out["el_idx"].astype("int32")
            yield pdf_out

    return docs.select("doc_id", xml_col).mapInPandas(
        run, schema=schemas.XML_OUT)


# ---------------------------------------------------------------- clean

def clean_stage(docs: DataFrame, safelist_name: str = "basic",
                pretty: bool = True) -> DataFrame:
    """Safelist-clean each document; emits cleaned html + text + counters."""
    if safelist_name not in safelist_mod.PRESETS:
        raise ValueError(f"unknown safelist {safelist_name!r}")
    base_uri = BASE_URI
    prepared = assemble_html(docs).select("doc_id", "html")

    import pyarrow as pa

    # mapInArrow like extract/select: the columns are flat strings, so the
    # win here is smaller than on the nested-struct stages, but skipping
    # the arrow->pandas->arrow round trip still drops a copy of every html
    # payload per batch (measured r7: see BENCH.md).
    out_schema = pa.schema([
        ("doc_id", pa.string()), ("clean_html", pa.string()),
        ("clean_text", pa.string()), ("num_discarded", pa.int32()),
    ])

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        sl = safelist_mod.PRESETS[safelist_name]()
        from ..clean.serializer import DEFAULT, OutputSettings
        settings = DEFAULT if pretty else OutputSettings(pretty=False)
        for batch in batches:
            idx = {n: i for i, n in enumerate(batch.schema.names)}
            doc_ids = batch.column(idx["doc_id"])
            htmls = batch.column(idx["html"]).to_pylist()
            out_html: list = []
            out_text: list = []
            discarded: list = []
            for html in htmls:
                doc = _parse_doc(html, base_uri)
                result = clean_document(doc, sl)
                body = result.doc.body
                out_html.append(
                    inner_html(body, settings) if body is not None else "")
                out_text.append(body.text() if body is not None else "")
                discarded.append(result.num_discarded)
            yield pa.RecordBatch.from_arrays([
                doc_ids.cast(pa.string()) if doc_ids.type != pa.string()
                else doc_ids,
                pa.array(out_html, pa.string()),
                pa.array(out_text, pa.string()),
                pa.array(discarded, pa.int32()),
            ], schema=out_schema)

    return prepared.mapInArrow(run, schema=schemas.CLEAN_OUT)


# ---------------------------------------------------------------- helpers

def spans_to_rows(extracted: DataFrame) -> DataFrame:
    """Explode span arrays into a flat span table (doc_id, kind, text,
    media_ref, order) — the relational surface for downstream SQL."""
    return extracted.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.order").alias("order"),
    )


def css_path_stage(docs: DataFrame, query: str) -> DataFrame:
    """Unique-selector generation (Element.cssSelector,
    nodes/Element.java:1113-1151) for every element matched by a CSS
    query — one row (doc_id, match_idx, css_path) per match. The
    generator is differentially fuzzed per-element against the compiled
    reference (tools/fuzz_selectxml.py cssel block)."""
    compile_query(query)
    base_uri = BASE_URI
    prepared = assemble_html(docs).select("doc_id", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..extract.functions import css_selector
        ev = compile_query(query)
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "match_idx", "css_path")}
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                doc = _parse_doc(html, base_uri)
                for i, el in enumerate(select(doc, ev)):
                    rows["doc_id"].append(doc_id)
                    rows["match_idx"].append(i)
                    rows["css_path"].append(css_selector(el))
            out = pd.DataFrame(rows)
            out["match_idx"] = out["match_idx"].astype("int32")
            yield out

    return prepared.mapInPandas(
        run, schema="doc_id string, match_idx int, css_path string")


def xpath_xml_stage(docs: DataFrame, query: str,
                    xml_col: str = "xml") -> DataFrame:
    """XPath select over XML-PARSED documents (the reference's
    Element.selectXpath over Parser.xmlParser output — preserved tag
    case, prefix rules, PI/doctype invisibility; select/xpath.py,
    differentially fuzzed via tools/fuzz_xpath.py xpathxml mode). One row
    per matched element: (doc_id, match_idx, tag, own_text). `tag` is the
    PRESERVED-case tag name (el.tagName())."""
    from ..select.xpath import compile_xpath, select_xpath
    compile_xpath(query)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..parser.xmlbuilder import parse_xml
        ev = compile_xpath(query)
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "match_idx", "tag", "own_text")}
            for doc_id, xml in zip(pdf["doc_id"], pdf[xml_col]):
                doc = parse_xml(xml)
                for i, el in enumerate(select_xpath(doc, ev)):
                    rows["doc_id"].append(doc_id)
                    rows["match_idx"].append(i)
                    rows["tag"].append(el.tag_name_case or el.name)
                    rows["own_text"].append(el.own_text())
            out = pd.DataFrame(rows)
            out["match_idx"] = out["match_idx"].astype("int32")
            yield out

    return docs.select("doc_id", xml_col).mapInPandas(
        run, schema="doc_id string, match_idx int, tag string, own_text string")
