"""Approximate-nearest-neighbor similarity search over embeddings.

* brute-force cosine top-k: broadcast the (small) query set, JVM-side
  zip_with/aggregate dot products, per-query top-k via window — the exact
  baseline;
* IVF-style variant: coarse buckets from sign-pattern hyperplane hashes;
  queries probe only their own bucket (the scale path — at 10^9 vectors
  the probe set shrinks by ~2^nbits).

Scores are rounded to 6 decimals so results are stable across engines
(DuckDB oracle uses list_cosine_similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _UNSET


# Float64 throughout: bitwise-identical across engines (float32 list ops
# diverge in the last ulps and break value-hash comparison after
# rounding). All three helpers take column-reference SQL fragments and
# return one F.expr — Column-by-Column assembly of the nested lambdas
# paid dozens of py4j round trips per query construction (r9); the
# parsed expressions are identical, so values are bit-identical.

def _norm(c: str):
    """sqrt(sum(x^2)) left fold over the float64-cast array `c` — a norm
    PRECOMPUTED per vector (one pass per row) is bit-identical to one
    recomputed per candidate pair. The interpreted higher-order
    functions used to run 3 aggregates + 4 casts per PAIR; precomputing
    both norms leaves only the dot product pair-side (guide §2.3 —
    don't compute things per-pair that are per-row)."""
    return F.expr(
        f"sqrt(aggregate(transform(transform({c}, x -> cast(x as double)), "
        f"x -> x * x), cast(0.0 as double), (acc, x) -> acc + x))")


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with(transform({a}, x -> cast(x as double)), "
        f"transform({b}, x -> cast(x as double)), (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, x) -> acc + x)")


def _cosine(a: str, b: str):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(embeddings: DataFrame, n_queries: int = 5,
                     k: int = 10) -> DataFrame:
    """Top-k cosine neighbors for the first n_queries vectors (by vec_id),
    excluding self. Exact baseline."""
    base = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding"),
        _norm("embedding").alias("_nrm"))
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"),
        F.col("_nrm").alias("_qnrm"))
    joined = base.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("q_id"))
    scored = joined.select(
        "q_id", "vec_id",
        F.round(_dot("q_emb", "embedding")
                / (F.col("_qnrm") * F.col("_nrm")), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def _bucket_expr(col, nbits: int = 6):
    return F.concat_ws("", *[
        (col[i] >= 0).cast("int").cast("string") for i in range(nbits)])


def suggest_nbits(n_vectors: int, target_bucket: int = 4096) -> int:
    """Coarse-quantizer width scaled to corpus size: ~target_bucket vectors
    per bucket, clamped to [4, 20]. At 10^9 vectors this yields ~2^18
    buckets instead of the fixed 64 a small-corpus default would give."""
    import math
    if n_vectors <= target_bucket:
        return 4
    return max(4, min(20, int(math.ceil(math.log2(n_vectors / target_bucket)))))


def _table_bucket(col, table: int, nbits: int):
    # table t hashes the sign pattern of dims [t*nbits, (t+1)*nbits) —
    # disjoint axis-aligned hyperplane sets per table. Requires
    # n_tables * nbits <= embedding dim.
    lo = table * nbits
    return F.concat_ws("", *[
        (col[lo + i] >= 0).cast("int").cast("string") for i in range(nbits)])


def _probe_set(bucket_col, nbits: int, probe_hamming: int):
    """Own bucket (+ every 1-bit flip when probe_hamming >= 1)."""
    if probe_hamming < 1:
        return F.array(bucket_col)
    flips = [
        F.concat(F.substring(bucket_col, 1, i),
                 F.when(F.substring(bucket_col, i + 1, 1) == "0", F.lit("1"))
                  .otherwise(F.lit("0")),
                 F.substring(bucket_col, i + 2, nbits - i - 1))
        for i in range(nbits)
    ]
    return F.array(bucket_col, *flips)


def _resolve_ivf_knobs(nbits, probe_hamming, n_tables, scale):
    """Profile resolution for ivf_topk: explicit knobs always win; only
    _UNSET (omitted) knobs take the profile value."""
    if scale == "large":
        profile = {"nbits": None, "probe_hamming": 1, "n_tables": 2}
    elif scale in (None, "small"):
        profile = {"nbits": 6, "probe_hamming": 0, "n_tables": 1}
    else:
        raise ValueError(f"unknown scale profile {scale!r}")
    if nbits is _UNSET:
        nbits = profile["nbits"]
    if probe_hamming is _UNSET:
        probe_hamming = profile["probe_hamming"]
    if n_tables is _UNSET:
        n_tables = profile["n_tables"]
    return nbits, probe_hamming, n_tables


def ivf_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10,
             nbits=_UNSET, probe_hamming=_UNSET,
             n_tables=_UNSET, scale: str | None = None) -> DataFrame:
    """IVF/LSH-bucketed ANN.

    Recall knobs (all exact-score the candidate set, so precision is 1 —
    only recall is approximate):
    * nbits — coarse-quantizer width; None scales to corpus size via
      suggest_nbits so buckets stay ~constant-sized at any scale;
    * probe_hamming=1 — multi-probe: each query also probes every bucket
      at Hamming distance 1 (quantization-boundary neighbors);
    * n_tables=L — OR-amplified independent tables over disjoint
      hyperplane sets; a candidate needs to collide in ANY table.
      Requires n_tables * nbits <= embedding dim.

    Plan shape at scale: the big side is scanned once per table (a
    Generate, no shuffle), the query side is broadcast with its probe set
    exploded, and the only exchanges are the candidate-dedup/top-k
    shuffles on q_id — never an all-pairs join.

    scale="large" is the one-word recall/scale profile (corpus-scaled
    nbits, multi-probe, 2 tables); explicit knobs keep their values —
    an _UNSET sentinel (the dedup.py profile pattern) distinguishes an
    omitted knob from an explicitly-passed default, so ivf_topk(nbits=6,
    scale="large") really runs with 6 bits.
    """
    nbits, probe_hamming, n_tables = _resolve_ivf_knobs(
        nbits, probe_hamming, n_tables, scale)
    if nbits is None:
        nbits = suggest_nbits(embeddings.count())
    base0 = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding"),
        _norm("embedding").alias("_nrm"))
    base = base0.select(
        "vec_id", "embedding", "_nrm",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     _table_bucket(F.col("embedding"), t, nbits)
                     .alias("bucket"))
            for t in range(n_tables)])).alias("tb"),
    ).select("vec_id", "embedding", "_nrm",
             F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_nrm").alias("_qnrm"),
        F.col("tbl").alias("q_tbl"),
        F.explode(_probe_set(F.col("bucket"), nbits, probe_hamming))
        .alias("q_bucket"))
    joined = base.join(
        F.broadcast(queries),
        (F.col("tbl") == F.col("q_tbl"))
        & (F.col("bucket") == F.col("q_bucket"))).filter(
        F.col("vec_id") != F.col("q_id"))
    scored = joined.select(
        "q_id", "vec_id",
        F.round(_dot("q_emb", "embedding")
                / (F.col("_qnrm") * F.col("_nrm")), 6).alias("cosine"),
    )
    if n_tables > 1:
        # a candidate colliding in several tables appears once per table;
        # cosine is deterministic so the duplicate rows are identical
        scored = scored.distinct()
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )
