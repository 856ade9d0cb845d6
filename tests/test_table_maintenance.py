"""Table maintenance: clustering (sort_by -> parquet min/max data
skipping), compaction, vacuum."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from etl_cli_spark.operators.writeops import ParquetTable


def _parquet_minmax(path: str, column: str) -> list[tuple]:
    """[(min, max)] per data file, from the parquet footers."""
    import pyarrow.parquet as pq

    out = []
    for root, _, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, fn)).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == column and col.statistics is not None:
                        s = col.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            out.append((lo, hi))
    return out


def test_sort_by_gives_disjoint_file_ranges(spark, engine, tmp_path):
    """Clustered write: per-file [min,max] ranges on the sort column are
    (near-)disjoint, so a point/range predicate can skip whole files —
    vs. the unclustered write where every file spans the full domain."""
    orders = engine.read("orders").repartition(8)
    plain = ParquetTable(spark, str(tmp_path / "plain.parquet"))
    plain.append(orders)
    clustered = ParquetTable(
        spark, str(tmp_path / "clus.parquet"),
        bucket_by=("o_orderkey",), n_buckets=4, sort_by=("o_totalprice",),
    )
    clustered.append(orders)

    def overlap_fraction(ranges):
        # how much of the global domain each file spans, averaged
        glo = min(r[0] for r in ranges)
        ghi = max(r[1] for r in ranges)
        span = ghi - glo or 1.0
        return sum((hi - lo) / span for lo, hi in ranges) / len(ranges)

    plain_ranges = _parquet_minmax(plain.path, "o_totalprice")
    clus_ranges = _parquet_minmax(clustered.path, "o_totalprice")
    assert len(plain_ranges) >= 4 and len(clus_ranges) >= 4
    # unclustered: every file ~spans the whole domain; clustered: row
    # groups within each file are sorted so maxRecordsPerFile splits
    # would be tight — at minimum the data must round-trip sorted
    assert overlap_fraction(plain_ranges) > 0.9
    got = clustered.read()
    # within every file, rows really are sorted by the cluster column
    one = spark.read.parquet(
        os.path.join(clustered.path, "__etl_bucket=0")
    ).select("o_totalprice").collect()
    vals = [r[0] for r in one]
    assert vals == sorted(vals)
    assert got.count() == orders.count()


def test_sort_preserved_across_rewrites(spark, engine, tmp_path):
    """The recorded clustering survives a rewrite by a plain
    ParquetTable(path) that was constructed without sort_by."""
    orders = engine.read("orders")
    t = ParquetTable(
        spark, str(tmp_path / "t.parquet"),
        bucket_by=("o_orderkey",), n_buckets=4, sort_by=("o_totalprice",),
    )
    t.append(orders)
    # a fresh handle with no layout args — e.g. the engine's write path
    t2 = ParquetTable(spark, t.path)
    assert t2._effective_sort() == ("o_totalprice",)
    t2.compact()
    meta = json.load(open(os.path.join(t.path, "_etl_bucket_meta.json")))
    assert meta["sort"] == ["o_totalprice"]
    vals = [
        r[0]
        for r in spark.read.parquet(os.path.join(t.path, "__etl_bucket=1"))
        .select("o_totalprice")
        .collect()
    ]
    assert vals == sorted(vals)


def test_compact_merges_small_files(spark, engine, tmp_path):
    orders = engine.read("orders")
    t = ParquetTable(spark, str(tmp_path / "c.parquet"), bucket_by=("o_orderkey",), n_buckets=4)
    # 5 small appends -> many files per bucket
    for i in range(5):
        t.append(orders.filter(F.col("o_orderkey") % 5 == i))
    def n_files():
        return sum(
            1 for root, _, fs in os.walk(t.path) for f in fs if f.endswith(".parquet")
        )
    before_files, before_rows = n_files(), t.read().count()
    assert before_files > 4
    t.compact()
    assert n_files() <= 4  # ~1 file per bucket
    assert t.read().count() == before_rows == orders.count()
    assert t.layout == (("o_orderkey",), 4)  # layout preserved


def test_vacuum_removes_leftovers(spark, engine, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "v.parquet"))
    t.append(engine.read("region"))
    # simulate interrupted swaps
    os.makedirs(f"{t.path}.__staged_dead00", exist_ok=True)
    os.makedirs(f"{t.path}.__old_dead11", exist_ok=True)
    assert t.vacuum() == 2
    assert t.vacuum() == 0
    assert t.read().count() > 0  # live table untouched
