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


def _cosine(a, b):
    # compute in float64 throughout: bitwise-identical across engines
    # (float32 list ops diverge in the last ulps and break value-hash
    # comparison after rounding)
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (norm(da) * norm(db))


def brute_force_topk(embeddings: DataFrame, n_queries: int = 5,
                     k: int = 10) -> DataFrame:
    """Top-k cosine neighbors for the first n_queries vectors (by vec_id),
    excluding self. Exact baseline."""
    base = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding"))
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    joined = base.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("q_id"))
    scored = joined.select(
        "q_id", "vec_id",
        F.round(_cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cosine"),
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


def ivf_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10,
             nbits: int = 6) -> DataFrame:
    """IVF/LSH-bucketed ANN: queries only scan their own coarse bucket.
    Approximate — recall depends on bucket granularity."""
    base = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding"),
        _bucket_expr(F.col("embedding"), nbits).alias("bucket"))
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"))
    joined = base.join(F.broadcast(queries),
                       F.col("bucket") == F.col("q_bucket")).filter(
        F.col("vec_id") != F.col("q_id"))
    scored = joined.select(
        "q_id", "vec_id",
        F.round(_cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )
