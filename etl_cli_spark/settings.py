"""Engine settings store — the reference's ``get_etl_setting``.

The reference fetches named settings from its server
(``GET /settings/<name>``, /root/reference/etl_cli/base.py:563-566).
Here settings are themselves a dataset (parquet under
``<root>/etl/settings``), queryable with the same engine, written
append-only with a timestamp — ``get`` resolves the latest value, so
history is retained for free.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("value", T.StringType()),  # JSON-encoded
        T.StructField("set_at", T.DoubleType()),  # epoch seconds
    ]
)


class Settings:
    def __init__(self, spark: SparkSession, root: str, ns: str = "etl"):
        self.spark = spark
        self.path = os.path.join(root, ns, "settings")

    def set(self, name: str, value: Any) -> None:
        row = (name, json.dumps(value), time.time())
        self.spark.createDataFrame([row], _SCHEMA).coalesce(1).write.mode("append").parquet(
            self.path
        )

    def get(self, name: str, default: Any = None) -> Any:
        """Latest value for ``name`` (base.py:563-566), or ``default``."""
        if not os.path.exists(self.path):
            return default
        rows = (
            self.spark.read.schema(_SCHEMA).parquet(self.path)
            .filter(F.col("name") == name)
            .orderBy(F.desc("set_at"))
            .limit(1)
            .collect()
        )
        return json.loads(rows[0].value) if rows else default

    def all(self) -> dict[str, Any]:
        if not os.path.exists(self.path):
            return {}
        rows = (
            self.spark.read.schema(_SCHEMA).parquet(self.path)
            .withColumn(
                "rn",
                F.row_number().over(Window.partitionBy("name").orderBy(F.desc("set_at"))),
            )
            .filter("rn = 1")
            .collect()
        )
        return {r.name: json.loads(r.value) for r in rows}
