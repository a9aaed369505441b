"""Relational / temporal operators: as-of join and warehouse-style
analytics over the TPC-H-shaped tables.

The as-of join is the canonical operator Spark lacks natively
(SURVEY.md LLM-pipeline tier; Pandas has merge_asof, DuckDB has ASOF
JOIN): for every left row, the most recent right row at or before its
timestamp, per key. Implemented as a UNION + single hash shuffle +
running window — NOT a range join: a range/theta join explodes to
|L|x|R| per key before filtering, while the union-window shape is
O((|L|+|R|) log) per key with ONE exchange, the shape that survives
100 TB. Ties are deterministic: among right rows sharing the match
timestamp the highest event_id wins (mirrored in the oracle SQL).

The TPC-H-style aggregations (pricing summary / top-k order revenue /
region revenue) follow the events fixed-point contract: every money
sum is sum(round(x*100)) emitted as BIGINT cents — no float reaches
the output, so no engine hash policy can diverge. Dimension tables
(nation, region) are broadcast explicitly; fact-fact joins shuffle on
their natural keys and AQE handles skew at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, *,
              key: str = "user_id", ts: str = "ts",
              right_cols: tuple[str, ...] = ("event_id", "value"),
              tolerance_ms: int | None = None) -> DataFrame:
    """For each left row, the most recent right row with
    right.ts <= left.ts and the same key (inclusive, per-key).

    Scale shape: tag both sides, union, ONE shuffle on `key`, running
    `last(right_ref, ignorenulls=True)` over (ts, side, id) order.
    `tolerance_ms` optionally voids matches older than the window
    (merge_asof's tolerance semantics)."""
    lcols = left.columns
    ref = F.struct(
        F.col(ts).alias("_ats"),
        *[F.col(c).alias(f"_a_{c}") for c in right_cols])
    r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(right_cols[0]).alias("_ord"),
        ref.alias("_ref"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key, ts)])
    l = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_side"),
        F.col(right_cols[0]).alias("_ord")
        if right_cols[0] in lcols else F.lit(0).alias("_ord"),
        F.lit(None).cast(r.schema["_ref"].dataType).alias("_ref"),
        *[F.col(c) for c in lcols if c not in (key, ts)])
    w = (Window.partitionBy(key)
         .orderBy(F.col(ts).asc(), F.col("_side").asc(),
                  F.col("_ord").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (r.unionByName(l)
               .withColumn("_m", F.last("_ref", ignorenulls=True).over(w))
               .where(F.col("_side") == 1))
    if tolerance_ms is not None:
        in_tol = (F.unix_millis(F.col(ts))
                  - F.unix_millis(F.col("_m")["_ats"])) <= tolerance_ms
        matched = matched.withColumn(
            "_m", F.when(in_tol, F.col("_m")))
    out = matched.select(
        F.col(key), F.col(ts),
        *[F.col(c) for c in lcols if c not in (key, ts)],
        F.col("_m")["_ats"].alias("matched_ts"),
        *[F.col("_m")[f"_a_{c}"].alias(f"matched_{c}")
          for c in right_cols])
    return out


def events_asof(events: DataFrame, *, left_type: str = "purchase",
                right_type: str = "click",
                tolerance_ms: int | None = None) -> DataFrame:
    """purchase->latest-click attribution over the events table via
    asof_join; all-integer output (the events fixed-point contract)."""
    left = events.where(F.col("event_type") == left_type) \
        .select("user_id", "ts", "event_id")
    right = events.where(F.col("event_type") == right_type) \
        .select("user_id", "ts", "event_id", "value")
    j = asof_join(left, right, key="user_id", ts="ts",
                  right_cols=("event_id", "value"),
                  tolerance_ms=tolerance_ms)
    # TIMESTAMP_NTZ -> timestamp first (session tz is UTC everywhere in
    # this repo — the events_windowed contract)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    m_us = F.unix_micros(F.col("matched_ts").cast("timestamp"))
    return j.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        ts_us.alias("ts_us"),
        F.col("matched_event_id").cast("long").alias("click_event_id"),
        F.round(F.col("matched_value") * 1e5).cast("long")
        .alias("click_value_e5"),
        F.floor((ts_us - m_us) / 1000).cast("long").alias("gap_ms"),
    )


def top_k_per_group(df: DataFrame, group: str, order: str, *,
                    k: int = 5, id_col: str | None = None) -> DataFrame:
    """Top-k rows per group by `order` (desc), deterministic tie-break
    on `id_col`. One shuffle (the rank window); at scale the window's
    per-partition TopK pushdown keeps state bounded per group."""
    w = Window.partitionBy(group).orderBy(
        F.col(order).desc(),
        *( [F.col(id_col).asc()] if id_col else []))
    return (df.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .withColumn("rnk", F.col("rnk").cast("int")))


def events_quantiles(events: DataFrame) -> DataFrame:
    """Exact per-type value quantiles (p50/p90/p99) computed over the
    fixed-point 1e-5 units. Both engines interpolate at (n-1)*p over
    identical long inputs, so the doubles are bit-identical; emitted
    rounded to 1e-5-unit precision as BIGINT."""
    v = F.round(F.col("value") * 1e5).cast("long")
    e = events.select("event_type", v.alias("v_e5"))

    def q(p, name):
        return F.round(F.expr(f"percentile(v_e5, {p})")) \
            .cast("long").alias(name)

    return (e.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 q(0.5, "p50_e5"), q(0.9, "p90_e5"), q(0.99, "p99_e5"))
            .orderBy("event_type"))


def _cents(col):
    return F.round(col * 100).cast("long")


def pricing_summary(lineitem: DataFrame, cutoff: str) -> DataFrame:
    """TPC-H Q1 shape: scan-side filter + one map-side-combined hash
    aggregate on a 6-value key. Money sums in exact BIGINT cents."""
    l = lineitem.where(F.col("l_shipdate") <= F.lit(cutoff))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (l.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
                 F.sum(_cents(F.col("l_extendedprice")))
                 .alias("sum_base_c"),
                 F.sum(_cents(disc_price)).alias("sum_disc_c"),
                 F.sum(_cents(charge)).alias("sum_charge_c"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def order_revenue_topk(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, *,
                       segment: str = "BUILDING",
                       cutoff: str = "1998-01-01",
                       k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: selective dimension-side filters pushed to the
    scans, orders⨝customer then lineitem⨝orders on their natural keys
    (shuffle joins AQE can re-plan), one hash aggregate, TakeOrdered
    top-k with a deterministic orderkey tie-break."""
    c = customer.where(F.col("c_mktsegment") == segment) \
        .select("c_custkey")
    o = orders.where(F.col("o_orderdate") < F.lit(cutoff)) \
        .select("o_orderkey", "o_custkey", "o_orderdate")
    li = lineitem.where(F.col("l_shipdate") > F.lit(cutoff)) \
        .select("l_orderkey",
                _cents(F.col("l_extendedprice")
                       * (1 - F.col("l_discount"))).alias("rev_c"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey")
            .agg(F.sum("rev_c").alias("revenue_c"),
                 F.min(F.date_format("o_orderdate", "yyyy-MM-dd"))
                 .alias("o_orderdate"))
            .orderBy(F.col("revenue_c").desc(), F.col("l_orderkey").asc())
            .limit(k))


def region_revenue(customer: DataFrame, orders: DataFrame,
                   lineitem: DataFrame, supplier: DataFrame,
                   nation: DataFrame, region: DataFrame, *,
                   region_name: str = "ASIA",
                   date_from: str = "1996-01-01",
                   date_to: str = "1998-01-01") -> DataFrame:
    """TPC-H Q5 shape: fact-fact joins shuffle on natural keys; the
    nation/region dimensions are BROADCAST explicitly (the 100 TB
    plan: no exchange for dimension lookups); local-supplier condition
    c_nationkey = s_nationkey; revenue in exact cents per nation."""
    n = F.broadcast(
        nation.join(F.broadcast(
            region.where(F.col("r_name") == region_name)),
            nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name"))
    o = orders.where((F.col("o_orderdate") >= F.lit(date_from))
                     & (F.col("o_orderdate") < F.lit(date_to))) \
        .select("o_orderkey", "o_custkey")
    li = lineitem.select(
        "l_orderkey", "l_suppkey",
        _cents(F.col("l_extendedprice")
               * (1 - F.col("l_discount"))).alias("rev_c"))
    c = customer.select("c_custkey", "c_nationkey")
    s = supplier.select("s_suppkey", "s_nationkey")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(c, o.o_custkey == c.c_custkey)
         .join(s, (li.l_suppkey == s.s_suppkey)
               & (c.c_nationkey == s.s_nationkey))
         .join(n, s.s_nationkey == n.n_nationkey))
    return (j.groupBy("n_name")
            .agg(F.sum("rev_c").alias("revenue_c"))
            .orderBy(F.col("revenue_c").desc(), F.col("n_name").asc()))
