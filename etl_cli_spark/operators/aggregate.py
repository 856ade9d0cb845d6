"""Aggregation surface.

The reference's only aggregate is COUNT (``_count=1``, get_source_total
/root/reference/etl_cli/base.py:481-499). The engine exposes Spark's
full native aggregation machinery through a small declarative spec so
job specs can express group-bys the same way they express queries.
All of it is stock Catalyst (partial aggregation map-side, AQE
coalescing) — zero custom execution code.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate(
    df: DataFrame,
    group_by: Sequence[str] = (),
    aggs: Mapping[str, str] = (),
    mode: str = "groupby",
    having: str | None = None,
    pivot: tuple[str, Sequence[str]] | None = None,
) -> DataFrame:
    """Declarative aggregation.

    ``aggs``: output-name -> SQL aggregate expression, e.g.
    ``{"sum_qty": "sum(l_quantity)", "n": "count(*)"}``. ``mode`` is
    ``groupby`` | ``rollup`` | ``cube``. ``having`` filters post-agg.
    ``pivot=(col, values)`` pivots before aggregation.
    """
    exprs = [F.expr(e).alias(name) for name, e in dict(aggs).items()]
    if mode == "groupby":
        grouped = df.groupBy(*group_by)
    elif mode == "rollup":
        grouped = df.rollup(*group_by)
    elif mode == "cube":
        grouped = df.cube(*group_by)
    else:
        raise ValueError(f"mode must be groupby|rollup|cube, got {mode!r}")
    if pivot is not None:
        col, values = pivot
        grouped = grouped.pivot(col, list(values))
    out = grouped.agg(*exprs)
    if having:
        out = out.filter(F.expr(having))
    return out


def exact_sum(col: str, scale: int = 2) -> str:
    """SQL fragment for an engine-portable exact sum over a double column.

    Summing doubles is order-dependent (shuffle order varies run to run
    and engine to engine); routing through DECIMAL makes the sum exact
    and reproducible — this is what the oracle-differential tests use.
    """
    return f"cast(round(sum(cast({col} as decimal(30,{scale}))), {scale}) as double)"
