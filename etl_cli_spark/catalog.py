"""Catalog operations: list / drop datasets and namespaces.

Mirrors ls_ns (/root/reference/etl_cli/base.py:541-561), get_datasets
(base.py:501-504), drop_ds (base.py:506-519) and --drop-ns
(base.py:612-630, interactive confirm) over the engine's path-backed
catalog. Destructive ops take a ``confirm`` callback instead of stdin
(non-interactive default refuses, matching the reference's gate).
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

_DATA_SUFFIXES = (".parquet", ".csv", ".json", ".orc")


def ls_ns(root: str, ns: str = "") -> list[str]:
    """List dataset names in a namespace (directory)."""
    base = os.path.join(root, ns) if ns else root
    if not os.path.isdir(base):
        return []
    out = []
    for fn in sorted(os.listdir(base)):
        for suf in _DATA_SUFFIXES:
            if fn.endswith(suf):
                out.append(fn[: -len(suf)])
                break
        else:
            if os.path.isdir(os.path.join(base, fn)):
                out.append(fn)  # sub-namespace
    return out


def drop_ds(root: str, ns: str, name: str, confirm: Callable[[str], bool] | None = None) -> bool:
    base = os.path.join(root, ns) if ns else root
    for suf in _DATA_SUFFIXES:
        path = os.path.join(base, f"{name}{suf}")
        if os.path.exists(path):
            if confirm is not None and not confirm(f"drop dataset {ns}/{name}?"):
                return False
            shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)
            return True
    return False


def drop_ns(root: str, ns: str, confirm: Callable[[str], bool] | None = None) -> bool:
    """Drop a whole namespace — always requires explicit confirmation."""
    if not ns:
        raise ValueError("refusing to drop the root namespace")
    base = os.path.join(root, ns)
    if not os.path.isdir(base):
        return False
    if confirm is None or not confirm(f"drop namespace {ns} and ALL its datasets?"):
        return False
    shutil.rmtree(base)
    return True
