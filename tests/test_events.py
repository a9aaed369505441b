"""Event/telemetry operators (operators/events.py): windowed rollups +
gap sessionization — semantics pinned against hand-computed fixtures;
the cross-engine exactness is the driver oracle's job."""

import datetime

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
    yield s


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double")


def T(s):
    return datetime.datetime.fromisoformat(s)


def test_windowed_counts(spark):
    from jsoup_spark.operators.events import windowed_counts
    df = _mk(spark, [
        (1, T("2024-01-01 10:05:00"), 1, "a", 1.0),
        (2, T("2024-01-01 10:55:00"), 1, "a", 2.0),
        (3, T("2024-01-01 11:00:00"), 1, "a", 4.0),
        (4, T("2024-01-01 10:10:00"), 2, "b", 8.0),
    ])
    out = {(r.window_start, r.event_type): (r.n_events, r.sum_value_e5)
           for r in windowed_counts(df).collect()}
    h10 = int(T("2024-01-01 10:00:00").replace(
        tzinfo=datetime.timezone.utc).timestamp())
    assert out[(h10, "a")] == (2, 300000)
    assert out[(h10 + 3600, "a")] == (1, 400000)
    assert out[(h10, "b")] == (1, 800000)


def test_sessionize_gap_semantics(spark):
    from jsoup_spark.operators.events import sessionize
    base = T("2024-01-01 00:00:00")
    d = datetime.timedelta
    df = _mk(spark, [
        # user 1: two events 10 min apart (one session), then a 31-min
        # gap (new session)
        (1, base, 1, "a", 1.0),
        (2, base + d(minutes=10), 1, "a", 2.0),
        (3, base + d(minutes=41, seconds=1), 1, "a", 4.0),
        # user 2: exactly at the 30-min boundary -> SAME session
        (4, base, 2, "a", 1.0),
        (5, base + d(minutes=30), 2, "a", 2.0),
    ])
    rows = {(r.user_id, r.session_idx): r
            for r in sessionize(df, gap_seconds=1800).collect()}
    assert len(rows) == 3
    s11 = rows[(1, 1)]
    assert (s11.n_events, s11.sum_value_e5) == (2, 300000)
    s12 = rows[(1, 2)]
    assert (s12.n_events, s12.sum_value_e5) == (1, 400000)
    s21 = rows[(2, 1)]
    assert (s21.n_events, s21.sum_value_e5) == (2, 300000)
    assert s21.session_end - s21.session_start == 1800


def test_sessionize_plan_single_exchange(spark):
    """The ordered window and the session aggregation share the user_id
    partitioning — one exchange total."""
    from jsoup_spark.operators.events import sessionize
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = sessionize(e)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
