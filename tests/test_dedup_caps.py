"""LSH bucket-size caps (VERDICT r3 items 3+4).

At 100 TB, web boilerplate produces million-document identical-band
clusters; the intra-bucket all-pairs join is O(bucket^2) on exactly the
data dedup exists for. max_bucket switches oversized buckets to
representative pairing (every member vs the bucket's min id — O(bucket)
pairs) and REPORTS what was dropped. Default (max_bucket=None) stays
exact — the sf0.01 oracles gate that path.
"""

import pytest
from pyspark.sql import functions as F

from jsoup_spark.operators.dedup import (
    embedding_near_dup_with_stats, ngram_jaccard_pairs,
    ngram_jaccard_pairs_with_stats,
)


@pytest.fixture(scope="module")
def degenerate_docs(spark):
    """10k near-identical docs (one boilerplate page) + a handful of
    distinct ones — the worst-case skewed band bucket."""
    n = 10_000
    base = ("breaking news site nav footer copyright contact about "
            "subscribe login register privacy terms help faq careers")
    rows = [(i, base) for i in range(n)]
    rows += [(n + i, f"unique document number {i} with its own words "
              f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_degenerate_bucket_is_capped(spark, degenerate_docs):
    pairs, stats = ngram_jaccard_pairs_with_stats(
        degenerate_docs, threshold=0.0, max_bucket=100)
    got = pairs.count()
    # representative pairing: 9999 rep-member pairs for the big cluster
    # (+ small-bucket pairs from the 5 unique docs, each its own bucket)
    assert got == 9_999
    st = stats.collect()
    assert len(st) == 1
    row = st[0]
    assert row.n_docs == 10_000
    assert row.dropped_pairs == 10_000 * 9_999 // 2 - 9_999
    # every pair is rep(0) vs member, jaccard 1.0
    top = pairs.limit(5).collect()
    assert all(r.doc_a == 0 and r.jaccard == 1.0 for r in top)


def test_cap_default_is_exact(spark, degenerate_docs):
    # small corpus where no bucket exceeds the cap: capped == exact
    small = degenerate_docs.filter(F.col("doc_id").between(9_998, 10_004))
    exact = sorted(map(tuple, ngram_jaccard_pairs(small).collect()))
    capped = sorted(map(tuple, ngram_jaccard_pairs(
        small, max_bucket=100).collect()))
    assert exact == capped
    _, stats = ngram_jaccard_pairs_with_stats(small, max_bucket=100)
    assert stats.count() == 0


def _exchange_outputs(df):
    """[(exec-class, [output column names])] for every Exchange in the
    physical plan (broadcast or shuffle), walked via py4j."""
    out = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if "Exchange" in name:
            o = node.output()
            out.append((name, [o.apply(i).name() for i in range(o.size())]))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_candidate_join_carries_no_arrays(spark, degenerate_docs):
    """The candidate self-join must move only (doc_id, band_key) between
    stages — shingle arrays appear exclusively in the post-candidate
    doc_id-keyed fetch joins, renamed sh_a/sh_b (VERDICT r3 item 4)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        pairs = ngram_jaccard_pairs(degenerate_docs.limit(100))
        exchanges = _exchange_outputs(pairs)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert exchanges  # at least the candidate-side broadcast/shuffle
    cand = [cols for _, cols in exchanges if "band_key" in cols]
    assert cand and all(set(c) <= {"doc_id", "band_key"} for c in cand), \
        exchanges
    # the raw `sh` column never crosses an exchange; only the fetch-side
    # renames do, and those exchanges are keyed by doc id, not band
    for _, cols in exchanges:
        assert "sh" not in cols, exchanges


def test_embedding_cap(spark):
    n = 2_000
    rows = [(i, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]) for i in range(n)]
    rows += [(n, [-1.0] * 8)]  # negative signs: lands in its own bucket
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs, stats = embedding_near_dup_with_stats(
        emb, threshold=0.0, nbits=8, max_bucket=50)
    assert pairs.count() == n - 1  # rep(0) vs each clone
    st = stats.collect()
    assert len(st) == 1 and st[0].n_docs == n
    assert st[0].dropped_pairs == n * (n - 1) // 2 - (n - 1)
    # uncapped default on a small slice equals capped
    small = emb.filter(F.col("vec_id") < 10)
    a, s0 = embedding_near_dup_with_stats(small, threshold=0.0, nbits=8)
    b, _ = embedding_near_dup_with_stats(small, threshold=0.0, nbits=8,
                                         max_bucket=50)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert s0.count() == 0


def test_scale_profile_equivalence(spark):
    """scale="large" must equal the explicit knob spelling, and explicit
    knobs must win over the profile (SCALE_PROFILES contract)."""
    from jsoup_spark.operators import similarity
    from jsoup_spark.operators.dedup import (
        SCALE_PROFILES, embedding_near_dup, ngram_jaccard_pairs)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .filter(F.col("vec_id") < 120)
    prof = SCALE_PROFILES["large"]
    a = embedding_near_dup(emb, threshold=-1.0, scale="large")
    b = embedding_near_dup(emb, threshold=-1.0, nbits=prof["nbits"],
                           n_tables=prof["n_tables"],
                           max_bucket=prof["max_bucket"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # explicit knob beats the profile
    c = embedding_near_dup(emb, threshold=-1.0, nbits=8, scale="large")
    d = embedding_near_dup(emb, threshold=-1.0, nbits=8,
                           n_tables=prof["n_tables"],
                           max_bucket=prof["max_bucket"])
    assert sorted(map(tuple, c.collect())) == sorted(map(tuple, d.collect()))
    with pytest.raises(ValueError):
        embedding_near_dup(emb, scale="galactic").collect()

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .filter(F.col("doc_id") < 80)
    e = ngram_jaccard_pairs(docs, scale="large")
    f = ngram_jaccard_pairs(docs, max_bucket=prof["max_bucket"])
    assert sorted(map(tuple, e.collect())) == sorted(map(tuple, f.collect()))

    g = similarity.ivf_topk(emb, n_queries=2, k=5, scale="large")
    h = similarity.ivf_topk(emb, n_queries=2, k=5, nbits=None,
                            probe_hamming=1, n_tables=2)
    assert sorted(map(tuple, g.collect())) == sorted(map(tuple, h.collect()))
