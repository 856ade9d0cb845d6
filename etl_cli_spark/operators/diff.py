"""Dataset diff — the reference's declared-but-never-wired operator.

``--diff`` / ``--diff-context`` exist in the reference's CLI surface
(/root/reference/etl_cli/etl.py:55-56) but are never compiled into a job
(SURVEY §2.8). We ship the natural semantics: symmetric multiset
difference with a side marker, optionally projected to context fields.

Spark-first: one tagged groupBy-over-all-columns aggregation yields BOTH
directions (``writeops._multiset_diff`` — two ``exceptAll`` calls would
shuffle the full-width union twice for the same answer; round-9). No
driver-side comparison, scales to any size. At 100 TB prefer supplying
``context`` so the compare shuffles only the columns that matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIFF_SIDE_COL = "_diff_side"


def diff(left: DataFrame, right: DataFrame, context: list[str] | None = None) -> DataFrame:
    """Rows in exactly one side (multiset semantics), tagged left/right."""
    from .writeops import _multiset_diff

    if context:
        left = left.select(*context)
        right = right.select(*context)
    only_right, only_left = _multiset_diff(left, right)
    return only_left.withColumn(DIFF_SIDE_COL, F.lit("left")).unionByName(
        only_right.withColumn(DIFF_SIDE_COL, F.lit("right"))
    )
