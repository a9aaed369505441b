"""Structured Streaming variant of the extraction pipeline.

The reference's StreamParser (parser/StreamParser.java:58-233) is a
pull-based progressive parse of ONE input; at corpus scale the analog is a
stream of documents: ``readStream`` over the span table (file source or any
rate/kafka source with the same schema) → the same extract stage →
checkpointed sink. The per-batch extraction function is identical to the
batch path (mapInPandas is stream-safe — stateless per document), and
watermarking is unnecessary because extraction is per-row (no event-time
aggregation); a windowed error-rate monitor is included as the stateful
example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..operators.pipeline import extract_stage


def read_span_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a span-table parquet directory."""
    return (
        spark.readStream
        .schema(schemas.DOC_IN)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(docs_stream: DataFrame) -> DataFrame:
    """Streaming extraction: same stage as batch, minus size bucketing
    (repartitionByRange is not stream-safe; the file source's trigger size
    bounds batch skew instead)."""
    return extract_stage(docs_stream, bucket=False)


def run_to_parquet(docs_stream: DataFrame, out_path: str,
                   checkpoint_path: str):
    """Start the streaming extraction into a parquet sink (exactly-once per
    file-source offsets + checkpoint)."""
    extracted = extract_stream(docs_stream)
    return (
        extracted.writeStream
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def error_rate_monitor(extracted_stream: DataFrame):
    """Stateful example: per-trigger parse-error counts (complete mode)."""
    return (
        extracted_stream
        .groupBy()
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_parse_errors").alias("parse_errors"),
        )
    )
