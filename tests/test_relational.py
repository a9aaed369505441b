"""Unit tests for the relational/temporal operators
(operators/relational.py): as-of join semantics (inclusive match,
per-key isolation, deterministic ties, tolerance, unmatched rows) and
the plan shape (ONE exchange — no range-join explosion).
"""

import datetime as dt

from pyspark.sql import functions as F

from jsoup_spark.operators import relational


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    # (event_id, ts, user_id, event_type, value)
    return spark.createDataFrame(
        [(i, _ts(t), u, k, v) for i, t, u, k, v in rows],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double")


def test_asof_basic_inclusive_and_unmatched(spark):
    ev = _events(spark, [
        (1, "2026-01-01T10:00:00", 7, "click", 1.0),
        (2, "2026-01-01T11:00:00", 7, "purchase", 0.0),   # matches 1
        (3, "2026-01-01T12:00:00", 7, "click", 2.0),
        (4, "2026-01-01T12:00:00", 7, "purchase", 0.0),   # inclusive: 3
        (5, "2026-01-01T09:00:00", 8, "purchase", 0.0),   # no click yet
        (6, "2026-01-01T08:00:00", 9, "click", 9.0),      # other user
    ])
    out = {r["event_id"]: r for r in relational.events_asof(ev).collect()}
    assert out[2]["click_event_id"] == 1
    assert out[2]["gap_ms"] == 3600_000
    assert out[4]["click_event_id"] == 3       # same-ts click matches
    assert out[4]["gap_ms"] == 0
    assert out[4]["click_value_e5"] == 200000
    assert out[5]["click_event_id"] is None
    assert out[5]["gap_ms"] is None


def test_asof_tie_break_highest_event_id(spark):
    ev = _events(spark, [
        (10, "2026-01-01T10:00:00", 7, "click", 1.0),
        (11, "2026-01-01T10:00:00", 7, "click", 2.0),
        (12, "2026-01-01T10:30:00", 7, "purchase", 0.0),
    ])
    out = relational.events_asof(ev).collect()[0]
    assert out["click_event_id"] == 11         # max event_id at same ts


def test_asof_tolerance(spark):
    ev = _events(spark, [
        (1, "2026-01-01T10:00:00", 7, "click", 1.0),
        (2, "2026-01-01T10:00:30", 7, "purchase", 0.0),
        (3, "2026-01-01T12:00:00", 7, "purchase", 0.0),   # too old
    ])
    out = {r["event_id"]: r for r in relational.events_asof(
        ev, tolerance_ms=60_000).collect()}
    assert out[2]["click_event_id"] == 1
    assert out[3]["click_event_id"] is None


def test_asof_single_exchange_plan(spark):
    ev = _events(spark, [
        (1, "2026-01-01T10:00:00", 7, "click", 1.0),
        (2, "2026-01-01T11:00:00", 7, "purchase", 0.0),
    ])
    plan = relational.events_asof(ev)._jdf.queryExecution() \
        .executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan       # union-window, not a range join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pricing_summary_fixed_point(spark):
    li = spark.createDataFrame(
        [(1, "A", "F", 17.0, 1000.01, 0.05, 0.02,
          _ts("1997-01-01T00:00:00")),
         (2, "A", "F", 3.0, 200.50, 0.00, 0.00,
          _ts("1997-06-01T00:00:00")),
         (3, "A", "F", 5.0, 100.00, 0.10, 0.05,
          _ts("1999-01-01T00:00:00"))],   # filtered out
        "l_orderkey long, l_returnflag string, l_linestatus string, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_shipdate timestamp")
    out = relational.pricing_summary(li, cutoff="1998-09-01").collect()
    assert len(out) == 1
    r = out[0]
    assert r["sum_qty_c"] == 2000
    assert r["sum_base_c"] == 100001 + 20050
    assert r["sum_disc_c"] == round(1000.01 * 0.95 * 100) + 20050
    assert r["count_order"] == 2
