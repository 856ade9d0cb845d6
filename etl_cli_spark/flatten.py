"""Flat <-> nested document utilities.

The reference round-trips flat dotted-key dicts and nested dicts
everywhere (slovar.flat/.unflat — /root/reference/etl_cli/base.py:298,
523, 636) and offers ``_flat=1`` rendering of datasets (base.py:545-546).
Spark's analogue operates on the schema: recursively expand StructType
columns into dotted top-level columns, and rebuild structs from dotted
names. Pure ``select`` — no shuffle, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """Expand nested struct columns into dotted flat columns (one select)."""
    cols: list[Column] = []

    def walk(prefix: str, dtype: T.DataType, path: str) -> None:
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f"{prefix}{sep}{f.name}", f.dataType, f"{path}.{f.name}")
        else:
            cols.append(F.col(path).alias(prefix))

    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            for sub in f.dataType.fields:
                walk(f"{f.name}{sep}{sub.name}", sub.dataType, f"`{f.name}`.{sub.name}")
        else:
            cols.append(F.col(f"`{f.name}`"))
    return df.select(*cols)


def unflatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """Rebuild nested structs from dotted flat column names (one select)."""
    tree: dict = {}
    for name in df.columns:
        parts = name.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = name

    def build(node, path: str) -> Column:
        if isinstance(node, str):
            return F.col(f"`{node}`")
        return F.struct(*[build(v, f"{path}.{k}").alias(k) for k, v in node.items()])

    cols = []
    for k, v in tree.items():
        cols.append(build(v, k).alias(k) if isinstance(v, dict) else F.col(f"`{v}`").alias(k))
    return df.select(*cols)
