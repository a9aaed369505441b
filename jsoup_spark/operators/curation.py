"""Corpus curation operators: deterministic sampling, leakage-free
train/val/test splits, and the composed keep/drop decision.

Everything here is hash-deterministic — no RNG state, no sampling
seed to disagree about across engines or re-runs: a document's fate
is a pure function of its content/ids, so the pipeline is idempotent
and resumable at any scale (the property production curation jobs
need; Spark's `sample()` is seed+partitioning dependent and exactly
the wrong tool).

The hex-prefix trick makes every decision portable SQL: fixed-length
lowercase hex (md5 substrings) orders lexicographically exactly as
numerically, so `substr(md5(k), 1, 4) < '4000'` IS "hash(k) <
0.25 * 2^16" in any engine, with no integer-conversion dialect to
match.

* `hash_sample` — corpus subsampling at an exact n/65536 rate.
* `split_assign` — train/val/test by CLUSTER, not by doc: near-dup
  clusters (operators/graph.dedup_clusters) never straddle a split
  boundary, the leakage rule every serious corpus builds by.
* `corpus_filter` — quality gates composed into one keep flag +
  per-rule reason bitmask (exact-dup elect, contamination, Gopher
  repetition thresholds, quality score, length) — integer outputs
  only (the events fixed-point lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup, graph, textstats


def _hex_bucket(col, salt: str, digits: int = 4):
    return F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))),
                       1, digits)


def hash_sample(documents: DataFrame, rate_16bit: int,
                salt: str = "sample:") -> DataFrame:
    """Keep docs whose 16-bit hash bucket < `rate_16bit` (an exact
    rate of rate_16bit/65536). Map-only, idempotent, partitioning-
    independent."""
    threshold = format(rate_16bit, "04x")
    bucket = _hex_bucket(F.col("doc_id"), salt)
    return (documents
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    bucket.alias("bucket"))
            .where(F.col("bucket") < threshold))


def split_assign(documents: DataFrame, *,
                 train_255: int = 204, val_255: int = 230,
                 salt: str = "split:") -> DataFrame:
    """Assign train/val/test BY NEAR-DUP CLUSTER: every member of a
    cluster (graph.dedup_clusters) shares its cluster_id's hash
    bucket, so near-duplicates can never leak across splits. Exact
    fractions: train_255/256, (val_255-train_255)/256, rest."""
    clusters = graph.dedup_clusters(documents)
    bucket = _hex_bucket(F.col("cluster_id"), salt, 2)
    split = (F.when(bucket < format(train_255, "02x"), "train")
             .when(bucket < format(val_255, "02x"), "val")
             .otherwise("test"))
    return clusters.select(
        "doc_id", "cluster_id", split.alias("split"))


# reason bits (set = rule REJECTS the doc)
R_DUP = 1            # not the elected exact-duplicate representative
R_CONTAMINATED = 2   # shares shingles with the eval set
R_REPETITION = 4     # Gopher repetition thresholds
R_QUALITY = 8        # stopword/length quality gate
R_SHORT = 16         # too few words


def corpus_filter(documents: DataFrame, *, n_eval: int = 10,
                  min_words: int = 20,
                  max_top_bigram_pct: int = 20,
                  max_dup_tri_pct: int = 60) -> DataFrame:
    """The composed curation decision: one row per doc with keep flag
    and a reason bitmask. Rules:

    * R_DUP: exact duplicates keep only the min-doc_id representative
      (one md5 shuffle with map-side combine);
    * R_CONTAMINATED: any shingle overlap with the broadcast eval set
      (docs < n_eval — dedup.contamination's convention);
    * R_REPETITION: top bigram occurrences > max_top_bigram_pct% of
      words, OR duplicated-trigram chars > max_dup_tri_pct% of chars;
    * R_QUALITY: quality_score's gate (length bounds + stopwords);
    * R_SHORT: fewer than min_words words.

    Integer-only output; every rule recomputable in portable SQL.

    Plan shape (audited): the repetition / quality / length rules are
    per-doc LOCAL and fold into the ONE base scan (no join between
    them); the exact-dup election is a window over md5(text) — one
    shuffle, no join-back; contamination adds its broadcast-eval
    lookup. Three exchanges total at any scale."""
    from pyspark.sql import Window

    stats = textstats.repetition_stats(documents)
    docs_nc = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5("text").alias("k"),
        F.col("n_chars").cast("long").alias("n_chars"))
    quality = textstats.quality_score(documents).select(
        "doc_id",
        (F.col("quality_ok") == 0).cast("int").alias("bad_quality"))
    # stats/quality both derive from the same scan projection —
    # Catalyst collapses them into one pass over `documents`
    local = (docs_nc.join(stats, "doc_id").join(quality, "doc_id")
             .select(
                 "doc_id", "k",
                 ((F.col("top_bigram_count") * 100
                   > F.col("n_words") * max_top_bigram_pct)
                  | (F.col("dup_trigram_chars") * 100
                     > F.col("n_chars") * max_dup_tri_pct))
                 .cast("int").alias("is_rep"),
                 (F.col("n_words") < min_words).cast("int")
                 .alias("is_short"),
                 "bad_quality"))
    is_dup = (F.col("doc_id") != F.min("doc_id").over(
        Window.partitionBy("k"))).cast("int")
    with_dup = local.withColumn("is_dup", is_dup).drop("k")

    cont = dedup.contamination(documents, n_eval=n_eval).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit(1).alias("is_cont"))

    out = (with_dup
           .join(cont, "doc_id", "left")
           .fillna(0, ["is_cont"]))
    reasons = (F.col("is_dup") * R_DUP
               + F.col("is_cont") * R_CONTAMINATED
               + F.col("is_rep") * R_REPETITION
               + F.col("bad_quality") * R_QUALITY
               + F.col("is_short") * R_SHORT)
    return out.select(
        "doc_id",
        reasons.cast("int").alias("reasons"),
        (reasons == 0).cast("int").alias("keep"))
