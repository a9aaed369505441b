"""Unit tests for the connected-components / dedup clustering stage
(operators/graph.py)."""

from pyspark.sql import functions as F

from jsoup_spark.operators.graph import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_components_basic(spark):
    out = {r["v"]: r["label"] for r in connected_components(
        _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 20)])).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_long_chain_converges(spark):
    # a 40-vertex path: hash-min needs many propagation rounds — the
    # convergence loop (not a fixed round count) must reach the fixpoint
    chain = [(i, i + 1) for i in range(100, 140)]
    out = {r["v"]: r["label"] for r in connected_components(
        _edges(spark, chain)).collect()}
    assert set(out.values()) == {100}
    assert len(out) == 41


def test_components_direction_independent(spark):
    # edge direction must not matter
    a = connected_components(_edges(spark, [(5, 3), (3, 9)])).collect()
    b = connected_components(_edges(spark, [(3, 5), (9, 3)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(r["label"] == 3 for r in a)


def test_dedup_clusters_singletons_and_keepers(spark):
    from jsoup_spark.operators.graph import dedup_clusters
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "en", "s", 22),
         (2, "alpha beta gamma delta", "en", "s", 22),   # exact dup of 1
         (3, "totally different text here", "en", "s", 27)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = {r["doc_id"]: r for r in dedup_clusters(docs).collect()}
    assert out[1]["cluster_id"] == 1 and out[1]["is_keeper"] == 1
    assert out[2]["cluster_id"] == 1 and out[2]["is_keeper"] == 0
    assert out[3]["cluster_id"] == 3 and out[3]["is_keeper"] == 1
