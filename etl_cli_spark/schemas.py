"""Named-schema registry — the reference's ``--tmap`` mechanism.

The reference's only schema artifact is a mapping attached BY NAME at
write time (``target.mapping = 'smurfs.gazelle_es.<tmap>'``,
/root/reference/etl_cli/etl.py:71,237-238 — an Elasticsearch mapping
resolved from an external module). Spark-side the equivalent is a
``StructType`` registry: register a schema under a name, reference it
with ``tmap=<name>`` on the target, and the write conforms the outgoing
rows to it (field order, types via cast, missing fields as typed nulls).

Conforming is a single ``select`` of cast columns — pure Catalyst
projection, codegen'd, no extra pass or shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMAS: dict[str, T.StructType] = {}


def register_schema(name: str, schema: T.StructType | str) -> T.StructType:
    """Register a schema under ``name``; accepts a StructType or DDL string
    (``"a INT, b STRING"``)."""
    if isinstance(schema, str):
        parsed = T._parse_datatype_string(schema)
        if not isinstance(parsed, T.StructType):
            raise ValueError(f"tmap {name!r}: DDL must describe a struct, got {parsed}")
        schema = parsed
    _SCHEMAS[name] = schema
    return schema


def get_schema(name: str) -> T.StructType:
    if name not in _SCHEMAS:
        raise KeyError(f"unknown tmap {name!r}; registered: {sorted(_SCHEMAS)}")
    return _SCHEMAS[name]


def list_schemas() -> list[str]:
    return sorted(_SCHEMAS)


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` onto ``schema``: cast matching columns, emit typed
    nulls for missing ones, drop extras, in schema field order."""
    cols = []
    for f in schema.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
