"""Skew mitigation: salted joins + hot-key detection.

AQE's skew-join handling (on by default in the engine session) splits
oversized sort-merge partitions automatically; salting is the explicit
fallback for when a replicated-dimension join must spread a hot key
across executors deterministically — e.g. a fact-fact join where one
side's key distribution is pathological.

Mechanics: the skewed (big) side gets a salt in [0, salt_factor) — keys
spread across salt_factor partitions instead of one; the other side is
replicated once per salt value (explode of a literal sequence, NOT a
cross join). Join keys become (key, salt). Row multiplicity and results
are identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__etl_salt"


def salted_join(
    big: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt_factor: int = 16,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over salt_factor.

    ``other`` is replicated salt_factor times — keep it the smaller side.
    Output columns match ``big.join(other, on, how)``.

    Only big-side-preserving join types are valid: for ``right``/``full``
    the unmatched rows of the replicated side would appear salt_factor
    times, silently breaking the results-identical contract.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
               "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only "
            f"(inner/left/semi/anti), got how={how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted_big = big.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor)).cast("int")
    )
    replicated = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<int>"))
    )
    return salted_big.join(replicated, on=keys + [_SALT], how=how).drop(_SALT)


def hot_keys(df: DataFrame, col: str, min_share: float = 0.01, top: int = 20) -> DataFrame:
    """Keys holding more than ``min_share`` of all rows — the salting /
    broadcast-isolation candidates. One aggregation pass."""
    total = df.count()
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(total))
        .filter(F.col("share") >= min_share)
        .orderBy(F.desc("n"))
        .limit(top)
    )
