#!/usr/bin/env python3
"""Capture `.explain("formatted")` for every declared query into
plans/<tag>/<query>.txt, plus optional per-query noop-sink wall timings
(guide §1.4: the noop sink computes every column and discards it, so the
timing excludes the sink but not the computation).

This is the round-9 measurement harness the optimization round requires;
bench.py stays frozen (driver contract) — extra measurements live here.

Usage:
    python tools/capture_plans.py --tag r09_before [--sf DIR] [--time]
                                  [--only q1,q2] [--reps 3]
"""
from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--only", default="")
    ap.add_argument("--time", action="store_true",
                    help="also run each query to a noop sink, `reps` times")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bench-window", action="store_true",
                    help="mirror bench.py's per-query window settings "
                    "(AQE off, 8 shuffle partitions) for comparable timings")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    os.environ["PYTHONPATH"] = REPO + os.pathsep + \
        os.environ.get("PYTHONPATH", "")
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("capture_plans")
        .config("spark.python.worker.module", "pyspark_worker_zipcache")
        .config("spark.sql.shuffle.partitions",
                "8" if args.bench_window else str(max(int(args.cpus), 8)))
        .config("spark.sql.adaptive.enabled",
                "false" if args.bench_window else "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16000")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod
    qs = mod.queries()
    only = set(args.only.split(",")) if args.only else None

    outdir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    timings: dict[str, list[float]] = {}

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        except Exception as ex:
            print(f"PLAN FAIL {name}: {type(ex).__name__}: {str(ex)[:200]}")
            continue
        if args.time:
            walls = []
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"noop:{name}")
                t0 = time.time()
                (fn(spark, args.sf).write.format("noop")
                 .mode("overwrite").save())
                walls.append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            timings[name] = walls
            print(f"{name}: min {min(walls)} walls {walls}")
        else:
            print(f"plan {name} ok")

    if timings:
        path = os.path.join(outdir, "_noop_timings.json")
        with open(path, "w") as f:
            json.dump({k: {"min": min(v), "walls": v}
                       for k, v in timings.items()}, f, indent=1)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
