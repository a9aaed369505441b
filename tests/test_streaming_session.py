"""Streaming gap-sessionization (streaming/stream.sessionize_stateful):
applyInPandasWithState with EVENT-TIME TIMEOUT, validated against the
batch operator's semantics across multiple triggers.

Three event waves land as separate files; maxFilesPerTrigger=1 forces
one micro-batch per wave so the watermark advances between triggers:
wave 2 closes user 1's first session by the gap rule (a later event
arrives), and wave 2's watermark closes user 2's idle session by
TIMEOUT in the wave-3 trigger — the exactly-once append-mode emission
a batch job can't express incrementally.
"""

import datetime as dt

from pyspark.sql import functions as F


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def test_stateful_sessionize_gap_and_timeout(spark, tmp_path):
    from jsoup_spark.streaming.stream import sessionize_stateful
    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    # wave 1: user 1 has a 2-event session; user 2 a 1-event session
    _write(spark, src, [(1, at(0), 1, 1.5), (2, at(10), 1, 2.25),
                        (3, at(5), 2, 7.0)])
    # wave 2: much later event for user 1 (gap-closes session 1, opens
    # a new one) and advances the watermark far past wave 1
    _write(spark, src, [(4, at(100_000), 1, 1.0)])
    # wave 3: later still — its trigger runs with wave 2's watermark,
    # timing out user 2's idle session
    _write(spark, src, [(5, at(200_000), 3, 1.0)])

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out = sessionize_stateful(stream, gap_seconds=1800,
                              watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("sessions")
         .outputMode("append").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = {(r["user_id"], r["session_start"]): r
            for r in spark.sql("select * from sessions").collect()}

    epoch0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    # user 1's first session: closed by the gap rule when wave 2 arrived
    s1 = rows[(1, epoch0)]
    assert s1["session_end"] == epoch0 + 10
    assert s1["n_events"] == 2
    assert s1["sum_value_e5"] == 150000 + 225000
    # user 2's only session: closed by the event-time TIMEOUT
    s2 = rows[(2, epoch0 + 5)]
    assert s2["n_events"] == 1 and s2["sum_value_e5"] == 700000
    # availableNow runs a final no-data batch with the wave-3 watermark
    # (t0+200000 - 10min): that passes user 1's second session end + gap
    # (t0+101800) -> timed out and emitted with exactly its one event
    s3 = rows[(1, epoch0 + 100_000)]
    assert s3["n_events"] == 1 and s3["sum_value_e5"] == 100000
    # ... but NOT user 3's (end + gap = t0+201800 > final watermark):
    # append mode must not leak open sessions
    assert not any(u == 3 for (u, _s) in rows)
    assert len(rows) == 3
