"""Unit tests for the curation tier (operators/curation.py)."""

import hashlib

from jsoup_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def test_hash_sample_exact_rule(spark):
    docs = _docs(spark, [(i, f"text {i}") for i in range(200)])
    out = {r["doc_id"] for r in
           curation.hash_sample(docs, 16384).collect()}
    expect = {i for i in range(200)
              if hashlib.md5(f"sample:{i}".encode()).hexdigest()[:4]
              < "4000"}
    assert out == expect


def test_split_assign_cluster_coherent(spark):
    # doc 1 and 2 share text (one cluster): must land in the SAME split
    docs = _docs(spark, [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "totally different words here now"),
    ])
    out = {r["doc_id"]: r for r in
           curation.split_assign(docs).collect()}
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == 1
    assert out[1]["split"] == out[2]["split"]
    assert set(r["split"] for r in out.values()) <= \
        {"train", "val", "test"}


def test_corpus_filter_reasons(spark):
    long_good = ("the alpha of beta and gamma to delta in epsilon is "
                 "zeta on eta for theta with iota kappa lambda mu nu "
                 "xi omicron pi rho sigma")
    docs = _docs(spark, [
        (20, long_good),                       # keeper
        (21, long_good),                       # exact dup of 20
        (22, "word " * 30),                    # repetitive, no stopword
        (23, "tiny doc"),                      # too short
    ])
    out = {r["doc_id"]: r for r in
           curation.corpus_filter(docs, n_eval=0).collect()}
    assert out[20]["keep"] == 1 and out[20]["reasons"] == 0
    assert out[21]["keep"] == 0
    assert out[21]["reasons"] & curation.R_DUP
    assert out[22]["keep"] == 0
    assert out[22]["reasons"] & (curation.R_REPETITION
                                 | curation.R_QUALITY)
    assert out[23]["keep"] == 0
    assert out[23]["reasons"] & curation.R_SHORT
