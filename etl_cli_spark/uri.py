"""Dataset URIs: ``backend/ns/name`` -> storage location.

Re-expresses the reference's dataset addressing (parse_ds,
/root/reference/etl_cli/base.py:22-38: split on '/', first segment =
backend, last = name, middle = namespace) for a Spark catalog-of-paths
world. Also implements the ``%TODAY%`` macro (base.py:27-30 — broken in
the reference, the intent is a UTC date substitution) and ``*`` wildcard
expansion (ls_sources etl.py:364-377; target templating
build_target_from_source etl.py:300-312).
"""

from __future__ import annotations

import fnmatch
import os
from dataclasses import dataclass, replace
from datetime import datetime, timezone

KNOWN_BACKENDS = {"parquet", "csv", "json", "orc", "http", "memory", "mongo", "es", "s3"}
_FILE_BACKENDS = {"parquet", "csv", "json", "orc"}

# file extension stripped when templating a target name from a source name
# (reference strips '.csv': etl.py:307-308)
_STRIP_SUFFIXES = (".csv", ".parquet", ".json", ".orc")


@dataclass(frozen=True)
class DatasetURI:
    backend: str
    ns: str
    name: str

    @property
    def uri(self) -> str:
        return "/".join(p for p in (self.backend, self.ns, self.name) if p != "")

    def with_name(self, name: str) -> "DatasetURI":
        return replace(self, name=name)


def _today() -> str:
    return datetime.now(timezone.utc).strftime("%Y_%m_%d")


def parse_ds(uri: str, default_backend: str = "parquet") -> DatasetURI:
    """``backend/ns parts.../name`` -> DatasetURI.

    A bare ``name`` (no slash) gets the default backend and empty ns, so
    ``region`` resolves relative to the engine root. ``%TODAY%`` anywhere
    in the name becomes the current UTC date (YYYY_MM_DD).
    """
    if not uri:
        raise ValueError("empty dataset uri")
    parts = [p for p in uri.split("/")]
    if len(parts) == 1:
        ds = DatasetURI(default_backend, "", parts[0])
    elif parts[0] in KNOWN_BACKENDS:
        ds = DatasetURI(parts[0], "/".join(parts[1:-1]), parts[-1])
    else:
        ds = DatasetURI(default_backend, "/".join(parts[:-1]), parts[-1])
    if "%TODAY%" in ds.name:
        ds = ds.with_name(ds.name.replace("%TODAY%", _today()))
    return ds


def resolve_path(ds: DatasetURI, root: str) -> str:
    """Filesystem location for a file-backed dataset.

    Layout: ``<root>/<ns>/<name>.<backend>`` — one directory (or file) per
    dataset. Existing single-file fixtures like ``region.parquet`` resolve
    directly; engine-written datasets are directories of part files.
    """
    if ds.backend not in _FILE_BACKENDS:
        raise ValueError(f"backend {ds.backend!r} is not file-backed")
    base = os.path.join(root, ds.ns) if ds.ns else root
    return os.path.join(base, f"{ds.name}.{ds.backend}")


def expand_wildcard(ds: DatasetURI, root: str) -> list[DatasetURI]:
    """``*`` in a dataset name -> one DatasetURI per matching dataset.

    Mirrors ls_sources (etl.py:364-377): list the namespace, fnmatch on the
    name pattern.
    """
    if "*" not in ds.name:
        return [ds]
    base = os.path.join(root, ds.ns) if ds.ns else root
    if not os.path.isdir(base):
        return []
    suffix = f".{ds.backend}"
    names = sorted(
        fn[: -len(suffix)]
        for fn in os.listdir(base)
        if fn.endswith(suffix)
    )
    return [ds.with_name(n) for n in names if fnmatch.fnmatch(n, ds.name)]


def template_target(target: DatasetURI, source: DatasetURI) -> DatasetURI:
    """``*`` in a target name is replaced by the (suffix-stripped) source name.

    Mirrors build_target_from_source (etl.py:300-312).
    """
    if "*" not in target.name:
        return target
    src_name = source.name
    for suf in _STRIP_SUFFIXES:
        if src_name.endswith(suf):
            src_name = src_name[: -len(suf)]
            break
    return target.with_name(target.name.replace("*", src_name))
