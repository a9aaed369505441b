"""Z-order layout (operators/layout.py): key correctness against a
brute-force Morton reference, and DIRECT data-skipping evidence — the
parquet footers of a z-ordered write must carry several-fold narrower
per-file min/max spans on BOTH dimensions than a random layout."""

import glob

import numpy as np
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from jsoup_spark.operators.layout import zorder_by, zvalue


def _morton(a, b):
    out = 0
    for i in range(16):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_matches_brute(spark):
    rng = np.random.default_rng(7)
    rows = [(int(a), int(b)) for a, b in
            rng.integers(0, 1 << 16, (200, 2))]
    df = spark.createDataFrame(rows, "a long, b long")
    out = zvalue(df, "a", "b").collect()
    for r in out:
        assert r["zvalue"] == _morton(r["a"], r["b"])


def _file_spans(path, col):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = min(_stat(md, i, col)[0]
                 for i in range(md.num_row_groups))
        hi = max(_stat(md, i, col)[1]
                 for i in range(md.num_row_groups))
        spans.append(hi - lo)
    return spans


def _stat(md, rg, col_name):
    row_group = md.row_group(rg)
    for c in range(row_group.num_columns):
        col = row_group.column(c)
        if col.path_in_schema == col_name:
            st = col.statistics
            return st.min, st.max
    raise KeyError(col_name)


def test_zorder_shrinks_file_spans(spark, tmp_path):
    rng = np.random.default_rng(11)
    n = 20_000
    rows = [(int(x), int(y)) for x, y in
            rng.integers(0, 1_000_000, (n, 2))]
    df = spark.createDataFrame(rows, "x long, y long")

    rand_path = str(tmp_path / "rand")
    df.repartition(64).write.parquet(rand_path)
    z_path = str(tmp_path / "zord")
    # 64 files: a contiguous 1/64 Morton range fixes ~3 top bits of
    # EACH dimension -> ~8x narrower per-file spans on both columns
    zorder_by(df, "x", "y", num_files=64).write.parquet(z_path)

    full = 1_000_000
    for col in ("x", "y"):
        rand_avg = np.mean(_file_spans(rand_path, col))
        z_avg = np.mean(_file_spans(z_path, col))
        # random layout: every file spans ~the whole domain;
        # z-order: both dimensions several-fold narrower
        assert rand_avg > 0.8 * full, (col, rand_avg)
        assert z_avg < rand_avg / 4, (col, rand_avg, z_avg)


def test_compact_small_files(spark, tmp_path):
    from jsoup_spark.operators.layout import compact, table_file_sizes
    src = str(tmp_path / "many")
    df = spark.range(20_000).selectExpr(
        "id", "repeat('x', 64) AS pad")
    df.repartition(64).write.parquet(src)
    sizes = table_file_sizes(spark, src)
    assert len(sizes) == 64
    total = sum(s for _, s in sizes)

    dst = str(tmp_path / "compacted")
    n = compact(spark, src, dst, target_bytes=total // 4 + 1)
    assert n == 4
    out_sizes = table_file_sizes(spark, dst)
    assert len(out_sizes) == 4
    # content equality
    a = sorted(r["id"] for r in spark.read.parquet(src).collect())
    b = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == b
