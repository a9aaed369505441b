"""Training-sequence packing: assign documents to fixed-token-budget
training sequences — the last hop of an LLM data pipeline (documents
-> packed context windows).

Contract (deterministic, declared):
* documents pack in doc_id order WITHIN a hash shard
  (`doc_id % n_shards`) — shard-local packing is the practice at
  scale, because a single global ordering would serialise one window
  over the whole corpus, while shard-local windows parallelise
  perfectly and training does not care about cross-shard order;
* greedy append: a document belongs to the sequence where its FIRST
  token lands (`seq = floor(prefix_tokens / budget)`), so sequences
  can overflow the budget by at most one document — the standard
  pack-then-split formulation, exactly expressible in SQL for the
  oracle;
* `offset` is the document's first-token position inside its
  sequence (`prefix_tokens % budget`).

Plan shape: ONE hash-shuffle (the shard window); the running sum is
a map-side window aggregate afterwards. No collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["pack_sequences"]


def pack_sequences(docs: DataFrame, *, budget: int = 2048,
                   n_shards: int = 16,
                   token_col: str = "n_tokens") -> DataFrame:
    """-> (doc_id, n_tokens, shard, seq_id, offset). `token_col` must
    already exist (e.g. a whitespace or BPE token count column)."""
    shard = F.pmod(F.col("doc_id").cast("long"),
                   F.lit(n_shards)).cast("int")
    w = (Window.partitionBy("shard")
         .orderBy(F.col("doc_id").cast("long"))
         .rowsBetween(Window.unboundedPreceding, -1))
    return (docs
            .withColumn("shard", shard)
            .withColumn("_prefix", F.coalesce(
                F.sum(F.col(token_col)).over(w), F.lit(0)))
            .select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col(token_col).cast("long").alias("n_tokens"),
                "shard",
                (F.col("_prefix") / budget).cast("long")
                .alias("seq_id"),
                F.pmod(F.col("_prefix"), F.lit(budget)).cast("long")
                .alias("offset"),
            ))
