"""Distributed connected components + dedup clustering.

Near-dup pipelines (MinHash/LSH/SimHash, operators/dedup.py) emit
PAIRS; deciding which documents to keep requires grouping those pairs
into components and electing one representative per cluster — this
module is that last stage.

`connected_components` is iterative hash-min label propagation WITH
pointer jumping: each round every vertex takes the min label among
itself and its neighbors (one join + one map-side-combined groupBy),
then shortcuts label <- label(label) (one more self-join) — the
combination converges in O(log diameter) rounds (the same shortcutting
idea as large-star/small-star, Kiveris et al., "Connected Components
in MapReduce and Beyond"), verified by a 40-vertex-path unit test.
Each round ends with a `localCheckpoint` (cuts the exponential lineage
growth every iterative Spark algorithm hits) and a single scalar
convergence probe; the driver loop is bounded by `max_iters`.

Determinism: labels are min doc_ids, so the fixpoint is unique — any
execution order converges to identical output (exact-SQL oracle via a
recursive CTE on the DuckDB side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", *,
                         max_iters: int = 25) -> DataFrame:
    """(src, dst) edge list -> (v, label): label = min vertex id in
    v's component. Vertices only appear if they touch an edge."""
    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = (sym.select(F.col("src").alias("v")).distinct()
              .withColumn("label", F.col("v"))
              .localCheckpoint(eager=True))
    for _ in range(max_iters):
        msgs = (sym.join(labels, sym["src"] == labels["v"])
                .groupBy(F.col("dst").alias("v"))
                .agg(F.min("label").alias("nbr_min")))
        stepped = (
            labels.alias("o").join(msgs.alias("m"), "v", "left")
            .select(F.col("v"),
                    F.least(F.col("o.label"),
                            F.coalesce(F.col("m.nbr_min"),
                                       F.col("o.label"))).alias("label"),
                    F.col("o.label").alias("_prev")))
        # pointer jumping: label <- label(label). Labels are minima, so
        # label(label) <= label; combined with the neighbor step this
        # collapses long paths in O(log diameter) rounds instead of
        # O(diameter) (the same shortcutting large-star/small-star uses).
        lut = stepped.select(F.col("v").alias("lv"),
                             F.col("label").alias("llabel"))
        # the previous round's label rides along so the convergence probe
        # below is a filter over the checkpointed result instead of an
        # extra join-against-old-labels job per round (r9)
        new_labels = (
            stepped.alias("s").join(lut, F.col("s.label") == F.col("lv"),
                                    "left")
            .select(F.col("s.v").alias("v"),
                    F.coalesce(F.col("llabel"), F.col("s.label"))
                    .alias("label"),
                    F.col("s._prev").alias("_prev"))
            .localCheckpoint(eager=True))
        changed = (new_labels
                   .where(F.col("label") != F.col("_prev"))
                   .limit(1).count())
        labels = new_labels.select("v", "label")
        if changed == 0:
            break
    return labels


def dedup_clusters(documents: DataFrame, *,
                   threshold: float = 0.0) -> DataFrame:
    """End-to-end near-dup clustering: LSH candidate pairs
    (dedup.ngram_jaccard_pairs at `threshold`) -> connected components
    -> per-doc (cluster_id, is_keeper). Docs without any near-dup pair
    are their own singleton cluster; the keeper is the min doc_id of
    each component (the same rep exact_dedup elects)."""
    pairs = dedup.ngram_jaccard_pairs(documents, threshold=threshold)
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    d = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    out = (d.join(cc, d["doc_id"] == cc["v"], "left")
           .select(
               F.col("doc_id"),
               F.coalesce(F.col("label"), F.col("doc_id"))
               .alias("cluster_id")))
    return out.select(
        "doc_id", "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).cast("int")
        .alias("is_keeper"))
