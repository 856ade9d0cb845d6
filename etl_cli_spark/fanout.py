"""Scale-adaptive fan-out for CPU-heavy per-row operators.

A parquet source parallelizes at row-group granularity, so a small or
badly-laid-out input (one file, one row group — every sf fixture table,
and any packed small-file drop) scans as ONE task and serializes every
downstream per-row computation on one core while the rest idle
(optimization guide §2.5, "input skew: one huge unsplittable file —
repartition immediately after the read"; measured round-14: the
gopher_repetition gram+md5 pass ran 8.8 s single-core vs 0.9 s fanned
at sf0.1).

The fan-out is applied INSIDE the operators whose per-row work is the
expensive part (tokenize + gram construction + hashing, media decode,
signature computation) — not at the generic read — because for light
shuffle-bound queries (windows, joins, small aggregates) the extra
exchange is pure overhead with nothing to amortize it (measured
round-14 A/B: +0.2-0.5 s per query at sf0.1 when applied globally,
1.5-2x on the smallest rows).

Scale-adaptive by construction: the trigger compares the input's REAL
split count to the session's ``defaultParallelism``, so a production
table with thousands of splits adds NO exchange, and a lower-core
session fans to proportionally fewer partitions (the knob is never a
constant). The redistribution is a deterministic round-robin
repartition of the under-fanned input — a one-time move of an input
that is by definition smaller than cores x maxPartitionBytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Narrow logical operators a scan-rooted plan may contain. Anything else
# (Join, Aggregate, Window, Sort, Repartition*, Deduplicate, ...) either
# introduces its own exchange — after which the input is already fanned
# to spark.sql.shuffle.partitions and a second redistribution is pure
# overhead — or makes the ``.rdd`` partition probe below UNSAFE: with
# AQE enabled, converting a plan that contains exchanges to an RDD
# eagerly submits every upstream shuffle-map job at operator-CONSTRUCTION
# time, and those materialized stages are not reused by the separately
# planned repartition query (round-14 ADVICE item #1 — upstream stages
# ran twice and the lazy API gained eager side effects).
_NARROW_NODES = (
    "Relation",
    "LogicalRDD",
    "LocalRelation",
    "Project",
    "Filter",
    "Generate",
    "SubqueryAlias",
    "View",
    "Union",
    "InMemoryRelation",
)


def _scan_rooted(df: DataFrame) -> bool:
    """True iff the analyzed logical plan contains only narrow nodes over
    its source relations — the only shape whose partition count can be
    probed without side effects and whose fan-out a shuffle hasn't
    already performed."""
    try:
        tree = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # pragma: no cover - exotic sources
        return False
    for line in tree.splitlines():
        node = line.lstrip(" :+-*")
        if not node:
            continue
        if not node.startswith(_NARROW_NODES):
            return False
    return True


def fan_out_for_compute(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session parallelism iff it is a
    scan-rooted plan that under-fans (see :func:`_scan_rooted`)."""
    if not _scan_rooted(df):
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - exotic sources
        return df
    return df.repartition(target) if nparts < target else df
