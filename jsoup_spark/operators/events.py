"""Event/telemetry operators for the training-data pipeline.

A large-scale extraction job emits per-document telemetry (ingest events,
parse errors, lineage counters — see pipeline.partition_metrics and
streaming.windowed_error_rates); these are the batch analytics over such
an event table: tumbling-window rollups and gap-based sessionization.
Both are pure DataFrame/window-function compositions — no UDFs, one
shuffle each (the groupBy / the partitionBy), so they scale exactly like
any keyed aggregation.

The streaming twins live in jsoup_spark/streaming/stream.py
(withWatermark + window for late data); these batch forms share the
window semantics (epoch-aligned tumbling windows), which is what makes
the DuckDB oracles exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _fixed_point_sum(col: str, scale: int = 100_000) -> Column:
    """Order-independent value sum in integer 1e-5 units.

    `round(sum(double), 5)` is order-DEPENDENT: doubles sum in
    partition-arrival order and a half-ulp difference can cross the
    rounding boundary, flipping the result between runs with different
    partitioning (observed as the CORRECTNESS_r05 events_sessionize hash
    flake). Rounding each value to an integer number of 1e-5 units FIRST
    makes the aggregation exact long arithmetic — associative and
    commutative, so any partitioning yields identical bits.

    r7: the output stays in scaled-long units (`sum_value_e5 BIGINT`)
    rather than dividing back to double — r6's driver artifact still
    flagged a hash mismatch on the (bit-identical locally) double column,
    so the last float is removed from the schema entirely; no hash or
    repr policy can diverge on an all-integer row. The oracle SQL applies
    the identical contract on the DuckDB side."""
    units = F.sum(F.round(F.col(col) * scale).cast("long"))
    return units.alias("sum_value_e5")


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window event rollup: per (window, event_type) counts and
    value sums. Epoch-aligned windows (Spark `window()` default), so any
    engine's date_trunc reproduces the buckets for whole-unit windows.

    Scale shape: one hash shuffle on (window, event_type) with map-side
    combine — the same plan at 10^12 events, no skew beyond the natural
    event_type distribution (salt the groupBy if one type dominates)."""
    w = F.window(F.col("ts"), window)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             _fixed_point_sum("value"))
        .select(
            # TIMESTAMP_NTZ has no direct long cast; go via timestamp
            # (session tz is UTC everywhere in this repo)
            F.col("w.start").cast("timestamp").cast("long")
            .alias("window_start"),
            "event_type", "n_events", "sum_value_e5",
        )
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization: consecutive events of a user belong to
    one session while the gap between them is <= gap_seconds; a larger
    gap starts a new session. The classic lag -> boundary-flag ->
    running-sum window composition (no UDFs; deterministic tie-break on
    (ts, event_id)).

    Scale shape: one shuffle on user_id for the ordered window, then the
    session aggregation reuses the same partitioning (no second
    exchange). Skewed users (bots with millions of events) are bounded
    by the window sort, not a cross product."""
    byu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_long = F.col("ts").cast("timestamp").cast("long")
    prev_ts = F.lag(ts_long).over(byu)
    new_session = (
        prev_ts.isNull()
        | ((ts_long - prev_ts) > gap_seconds)
    ).cast("int")
    sess_idx = F.sum(new_session).over(
        byu.rowsBetween(Window.unboundedPreceding, 0))
    tagged = events.select(
        "user_id", "event_id", "value",
        ts_long.alias("ts_sec"),
        sess_idx.alias("session_idx"),
    )
    return (
        tagged.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts_sec").alias("session_start"),
            F.max("ts_sec").alias("session_end"),
            F.count("*").alias("n_events"),
            _fixed_point_sum("value"),
        )
    )
