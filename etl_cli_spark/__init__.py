"""etl_cli_spark — a PySpark-native analytics/ETL engine.

Re-implements the declarative job language of the reference CLI
(vahana/etl_cli: datasets, query DSL, merger joins, write ops,
transformer pipelines, incremental loop) on stock PySpark, and extends
it with large-scale training-data operators (dedup, similarity search,
text analysis, event-time windows).
"""

from .engine import Engine, JobResult
from .session import get_spark
from .spec import JobSpec, MergerSpec, SourceSpec, TargetSpec, make_spec
from .uri import DatasetURI, parse_ds

__all__ = [
    "Engine",
    "JobResult",
    "get_spark",
    "JobSpec",
    "SourceSpec",
    "MergerSpec",
    "TargetSpec",
    "make_spec",
    "DatasetURI",
    "parse_ds",
]

__version__ = "0.1.0"
