#!/usr/bin/env python3
"""Round-close oracle gate: run every __spark_entry__.queries() entry vs
its DuckDB oracle_sql() twin and compare values exactly, the way the
driver does (columns sorted by name, rows sorted, value-level equality).

Why this exists: the r5 gate ran at local[8] and missed a crash that only
reproduces at local[32] partitioning (select_by_class empty-batch Arrow
conversion, VERDICT r5 #1). The gate now defaults to the DRIVER's
parallelism so partitioning-dependent failures surface before a round
closes.

Usage:
    python tools/oracle_gate.py [--sf /root/testdata/sf0.01] [--master local[32]]
                                [--only q1,q2] [--shuffle-partitions 32]
                                [--close]
Exit code 0 iff every query matches (rows, schema arity, values).

--close is the ROUND-CLOSE policy gate (VERDICT r7 #6): after the oracle
sweep it runs the fresh-seed differential campaign — 3 time-derived
mega_fuzz seeds x 2500 cases + one fresh fuzz_positions seed x 2000 —
against the compiled reference. Fresh seeds are policy, not discipline:
the r7 close found a real parity bug (in-body <script> tokenizes as
Rawtext, not ScriptData) that the committed fixtures could never catch,
because fixtures only revisit corners they already visit. The chosen
seeds are printed so NOTES_rN can record them.
"""
from __future__ import annotations

import argparse
import math
import os
import subprocess
import sys
import time
from decimal import Decimal

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _norm(v):
    """Normalize a cell for cross-engine compare (driver-equivalent)."""
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes repr of round(x, 9); keep the same tolerance
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, int):
        return v
    if v is None:
        return None
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return str(v)


def _rows_sorted(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def fresh_fuzz() -> int:
    """Fresh-seed differential campaign vs the compiled reference.
    Seeds derive from wall-clock time so every close explores new corners;
    they are printed for NOTES_rN. Returns the number of failing runs."""
    here = os.path.dirname(os.path.abspath(__file__))
    # /tmp is wiped between rounds; a missing harness made every fuzz
    # run "fail" with zero output (r9). Build it on demand.
    if not os.path.isdir("/tmp/jsoupbuild/out"):
        print("== building reference harness (missing /tmp/jsoupbuild)")
        r = subprocess.run(
            ["bash", os.path.join(here, "golden", "build_reference.sh")],
            capture_output=True, text=True)
        if r.returncode != 0:
            print(f"HARNESS BUILD FAILED:\n{r.stderr[-2000:]}")
            return 1
    base = int(time.time()) % 1_000_000
    runs = [("mega_fuzz.py", [str(base + i * 7919), "2500"])
            for i in range(3)]
    runs.append(("fuzz_positions.py", [str(base + 31337), "2000"]))
    # XPath evaluator vs javax.xml.xpath (round-8 surface): 40 docs x 40
    # queries + the error-parity block
    runs.append(("fuzz_xpath.py", [str(base + 104729), "40", "40"]))
    runs.append(("fuzz_selectxml.py", [str(base + 1299709), "40", "40"]))
    runs.append(("fuzz_w3cdom.py", [str(base + 15485863), "120"]))
    fails = 0
    for script, args in runs:
        seed = args[0]
        print(f"\n== fresh fuzz: {script} seed={seed} args={args}")
        r = subprocess.run([sys.executable, os.path.join(here, script),
                            *args], capture_output=True, text=True)
        tail = r.stdout.strip().split("\n")[-1] if r.stdout.strip() else ""
        print(r.stdout[:4000])
        # tail shape: "seed=X: A/B match" where A==B iff zero mismatches
        # (B = ops generated, a multiple of n cases)
        ok = False
        if r.returncode == 0 and "MISMATCH" not in r.stdout \
                and tail.endswith(" match"):
            frac = tail.rsplit(" ", 2)[-2]
            a, _, b = frac.partition("/")
            ok = a == b != ""
        if not ok:
            print(f"FRESH-FUZZ FAIL: {script} seed={seed}"
                  + (f"\nstderr: {r.stderr[-2000:]}" if r.stderr else ""))
            fails += 1
    return fails


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--shuffle-partitions", default="32")
    ap.add_argument("--only", default="")
    ap.add_argument("--close", action="store_true",
                    help="round-close mode: oracle sweep + fresh-seed fuzz")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(args.master)
             .config("spark.sql.shuffle.partitions", args.shuffle_partitions)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{args.sf}/{t}.parquet')")
        except Exception:
            pass

    sys.path.insert(0, ".")
    import __spark_entry__ as e
    queries, oracles = e.queries(), e.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_pass = n_fail = 0
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if not callable(fn):
            print(f"FAIL {name}: queries() entry is not callable "
                  f"({type(fn).__name__})")
            n_fail += 1
            failures.append(name)
            continue
        t0 = time.time()
        try:
            df = fn(spark, args.sf)
            snames = df.columns
            srows = df.collect()
        except Exception as ex:
            print(f"FAIL {name}: spark raised "
                  f"{type(ex).__name__}: {str(ex)[:200]}")
            n_fail += 1
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"pass {name}: rows-only ({len(srows)}) "
                  f"[no oracle] {time.time()-t0:.2f}s")
            n_pass += 1
            continue
        cur = con.execute(sql)
        onames = [d[0] for d in cur.description]
        orows = cur.fetchall()
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows {len(srows)} vs oracle {len(orows)}")
            n_fail += 1
            failures.append(name)
            continue
        if sorted(snames) != sorted(onames):
            print(f"FAIL {name}: columns {sorted(snames)} vs {sorted(onames)}")
            n_fail += 1
            failures.append(name)
            continue
        a = _rows_sorted(snames, srows)
        b = _rows_sorted(onames, orows)
        if a != b:
            bad = next(i for i in range(len(a)) if a[i] != b[i])
            print(f"FAIL {name}: value mismatch at sorted row {bad}:\n"
                  f"  spark : {a[bad]}\n  oracle: {b[bad]}")
            n_fail += 1
            failures.append(name)
            continue
        print(f"pass {name}: {len(srows)} rows exact {time.time()-t0:.2f}s")
        n_pass += 1

    print(f"\n{n_pass} pass / {n_fail} fail"
          + (f"  FAILURES: {failures}" if failures else ""))
    spark.stop()
    if args.close:
        fuzz_fails = fresh_fuzz()
        print(f"\nfresh-fuzz: {'OK' if not fuzz_fails else f'{fuzz_fails} FAILING RUNS'}")
        n_fail += fuzz_fails
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
