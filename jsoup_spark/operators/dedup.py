"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (100TB design):
* exact dedup is one hash-shuffle on md5(text) with map-side combine;
* MinHash/LSH avoids the O(n^2) pairwise join — docs shuffle once per band
  on the band key, candidate pairs only form inside buckets;
* all hashes are md5-hex (identical across Spark and DuckDB) so every
  operator has an exact SQL oracle;
* pairwise verification joins (jaccard / cosine) run only on LSH-bucketed
  candidates, never the full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MINHASH_PERMS = 4          # seeds 0..3; min over md5(shingle:seed)
LSH_BANDS = 2              # 2 bands x 2 rows


def _shingles(text_col="text"):
    """3-word shingles as a Catalyst expression over space-split words.

    Built with zip_with over shifted slices, NOT element indexing —
    `words[i]` inside a transform re-inlines the split() per element after
    projection collapse, turning shingling O(n^2)."""
    words = F.split(F.col(text_col), " ")
    size = F.size(words)
    w2 = F.slice(words, 2, size)
    w3 = F.slice(words, 3, size)
    tri = F.zip_with(
        F.zip_with(words, w2, lambda a, b: F.concat_ws(" ", a, b)),
        w3, lambda ab, c: F.concat_ws(" ", ab, c))
    sh = F.slice(tri, 1, F.greatest(size - 2, F.lit(1)))
    return F.when(size >= 3, sh).otherwise(F.array(F.col(text_col)))


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash; keeper = min doc_id."""
    h = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5("text").alias("text_md5"),
    )
    return (
        h.groupBy("text_md5")
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") >= 1)
    )


def minhash_signatures(documents: DataFrame,
                       perms: int = MINHASH_PERMS) -> DataFrame:
    """MinHash signature per doc: perm p = min(md5(shingle || ':p')).

    Shingles are projected once, then each permutation hashes that column —
    one pass over the text, no repeated tokenization."""
    shingled = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _shingles().alias("_sh"),
    )
    cols = [
        F.array_min(F.transform(F.col("_sh"), lambda s: F.md5(
            F.concat(s, F.lit(f":{p}"))))).alias(f"mh{p}")
        for p in range(perms)
    ]
    return shingled.select("doc_id", *cols)


def minhash_lsh_buckets(documents: DataFrame) -> DataFrame:
    """Band docs by pairs of minhashes; emits bucket sizes per band key.
    Buckets with n_docs > 1 are near-dup candidates."""
    sig = minhash_signatures(documents)
    # no exchange needed: the bands explode below references each mh column
    # exactly once inside a single Generate input, so projection collapse
    # still evaluates every signature once per row — and the groupBy is the
    # only shuffle in the plan (measured equal-or-faster than an explicit
    # repartition at sf0.1, and one full shuffle cheaper at scale)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(
            F.struct(F.lit(0).alias("band"),
                     F.md5(F.concat_ws("|", "mh0", "mh1")).alias("band_key")),
            F.struct(F.lit(1).alias("band"),
                     F.md5(F.concat_ws("|", "mh2", "mh3")).alias("band_key")),
        )).alias("b"),
    ).select("doc_id", F.col("b.band").alias("band"),
             F.col("b.band_key").alias("band_key"))
    stacked = bands
    return (
        stacked.groupBy("band", "band_key")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(documents: DataFrame,
                        threshold: float = 0.0) -> DataFrame:
    """Pairwise n-gram Jaccard among LSH candidates (same band-0 key).

    The candidate join is bucketed — never a full cross join.
    """
    shingled = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _shingles().alias("_sh"),
    )
    sh = shingled.select(
        "doc_id",
        F.array_distinct(F.col("_sh")).alias("sh"),
        F.md5(F.concat_ws(
            "|",
            F.array_min(F.transform(F.col("_sh"), lambda s: F.md5(F.concat(s, F.lit(":0"))))),
            F.array_min(F.transform(F.col("_sh"), lambda s: F.md5(F.concat(s, F.lit(":1"))))),
        )).alias("band_key"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.round(inter.cast("double") / union, 6)
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash over word features: bit j set iff sum over words of
    (bit j of md5-high-32(word)) majority-votes positive."""
    words = F.split(F.col("text"), " ")
    word_hash = lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
    bit_exprs = []
    for j in range(bits):
        contrib = F.transform(
            words,
            lambda w: (F.shiftright(word_hash(w), j) % 2) * 2 - 1,
        )
        bit_exprs.append(
            (F.aggregate(contrib, F.lit(0).cast("long"),
                         lambda acc, x: acc + x) > 0).cast("long") * (1 << j))
    sim = bit_exprs[0]
    for e in bit_exprs[1:]:
        sim = sim + e
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        sim.alias("simhash"),
    )


def embedding_near_dup(embeddings: DataFrame,
                       threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-dup candidates, LSH-bucketed by the sign
    pattern of the first 8 dimensions (random-hyperplane style)."""
    v = F.col("embedding")
    bucket = F.concat_ws("", *[
        (v[i] >= 0).cast("int").cast("string") for i in range(8)])
    e = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        v.alias("embedding"),
        bucket.alias("bucket"),
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
    to_d = lambda c: F.transform(c, lambda x: x.cast("double"))
    ea, eb = to_d(F.col("a.embedding")), to_d(F.col("b.embedding"))
    dot = F.aggregate(F.zip_with(ea, eb, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    cos = F.round(dot / (norm(ea) * norm(eb)), 6)
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        ).filter(F.col("cosine") >= threshold)
    )
