"""Transformer registry: named DataFrame->DataFrame transforms with
``name:arg1,arg2`` binding and chaining.

The reference resolves transformer names through an external module
(MORPHER_MODULE, /root/reference/etl_cli/base.py:85-94) and attaches them
at lifecycle stages post_read / post_merge (base.py:96-108). It has no
built-in scalar function library at all — everything lives in that
external module. Our registry instead exposes Spark's native function
catalog (string/date/math/array/map/JSON — JVM-side, codegen'd) through
a handful of generic expression transformers, so the full scalar library
comes for free and stays on the fast path (no Python UDFs).

Note: the reference *parses* transformer args but drops them
(base.py:103-107 — latent bug, SURVEY §2.11); we honor them.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..flatten import flatten, unflatten

Transform = Callable[[DataFrame], DataFrame]
Factory = Callable[..., Transform]

_REGISTRY: dict[str, Factory] = {}


def register(name: str, factory: Factory | None = None):
    """Register a transformer factory: ``factory(*args) -> (df -> df)``."""
    if factory is not None:
        _REGISTRY[name] = factory
        return factory

    def deco(fn: Factory) -> Factory:
        _REGISTRY[name] = fn
        return fn

    return deco


def parse_name(spec: str) -> tuple[str, list[str]]:
    """``'name:arg1,arg2'`` -> (name, [args]) — trans_name, base.py:88-94."""
    name, _, argstr = spec.partition(":")
    args = [a for a in argstr.split(",") if a] if argstr else []
    return name.strip(), args


def resolve(spec: str) -> Transform:
    name, args = parse_name(spec)
    if name not in _REGISTRY:
        raise KeyError(f"unknown transformer {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name](*args)


def apply_chain(df: DataFrame, specs: tuple[str, ...] | list[str]) -> DataFrame:
    """Chain comma-separated transformer specs left-to-right."""
    for spec in specs:
        df = df.transform(resolve(spec))
    return df


# --- merge-rules registry (--mrules: custom merge policy by name) -------

# A merge-rules callable receives (joined_df, matched_col, src_cols,
# mrg_cols) — the raw aliased join — and returns the merged DataFrame.
# This mirrors the reference's external merge_rules module hook
# (etl.py:178-180) with the engine's registry instead of a module path.
_MERGE_RULES: dict[str, Callable] = {}


def register_merge_rules(name: str, fn: Callable | None = None):
    if fn is not None:
        _MERGE_RULES[name] = fn
        return fn

    def deco(f: Callable) -> Callable:
        _MERGE_RULES[name] = f
        return f

    return deco


def resolve_merge_rules(name: str) -> Callable:
    if name not in _MERGE_RULES:
        raise KeyError(f"unknown merge_rules {name!r}; registered: {sorted(_MERGE_RULES)}")
    return _MERGE_RULES[name]


@register_merge_rules("prefer_nonnull")
def _prefer_nonnull(joined, matched, src_cols, mrg_cols):
    """Example policy: per conflicting column, first non-null of
    (merger, source); merger-only columns appended."""
    out = []
    for c in src_cols:
        sv = F.col(f"__etl_src.{c}")
        if c in mrg_cols:
            out.append(F.when(matched, F.coalesce(F.col(f"__etl_mrg.{c}"), sv)).otherwise(sv).alias(c))
        else:
            out.append(sv.alias(c))
    out += [F.col(f"__etl_mrg.{c}").alias(c) for c in mrg_cols if c not in src_cols]
    return joined.select(*out)


# --- built-in generic transformers (expression-based, no Python UDFs) ---

@register("with_column")
def _with_column(name: str, *expr_parts: str) -> Transform:
    """``with_column:out,<sql expr>`` — any Spark SQL scalar expression."""
    expr = ",".join(expr_parts)  # expr may itself contain commas
    return lambda df: df.withColumn(name, F.expr(expr))


@register("select")
def _select(*cols: str) -> Transform:
    return lambda df: df.select(*cols)


@register("drop")
def _drop(*cols: str) -> Transform:
    return lambda df: df.drop(*cols)


@register("rename")
def _rename(*pairs: str) -> Transform:
    """``rename:old1,new1,old2,new2``"""
    if len(pairs) % 2:
        raise ValueError("rename needs old,new pairs")
    mapping = dict(zip(pairs[::2], pairs[1::2]))
    return lambda df: df.withColumnsRenamed(mapping)


@register("filter")
def _filter(*expr_parts: str) -> Transform:
    return lambda df: df.filter(F.expr(",".join(expr_parts)))


@register("upper")
def _upper(col: str) -> Transform:
    return lambda df: df.withColumn(col, F.upper(F.col(col)))


@register("lower")
def _lower(col: str) -> Transform:
    return lambda df: df.withColumn(col, F.lower(F.col(col)))


@register("trim")
def _trim(col: str) -> Transform:
    return lambda df: df.withColumn(col, F.trim(F.col(col)))


@register("cast")
def _cast(col: str, to_type: str) -> Transform:
    return lambda df: df.withColumn(col, F.col(col).cast(to_type))


@register("flatten")
def _flatten() -> Transform:
    return flatten


@register("unflatten")
def _unflatten() -> Transform:
    return unflatten


@register("json_extract")
def _json_extract(src_col: str, out_col: str, path: str) -> Transform:
    """Dynamic-schema path: pull a field out of a JSON string column."""
    return lambda df: df.withColumn(out_col, F.get_json_object(F.col(src_col), f"$.{path}"))


@register("repartition")
def _repartition(n: str, *cols: str) -> Transform:
    return lambda df: df.repartition(int(n), *cols) if cols else df.repartition(int(n))


@register("canonicalize_url")
def _canonicalize_url_t(col: str, out: str | None = None) -> Transform:
    """``canonicalize_url:url[,out]`` — canonical URL form (see
    operators/urls.py): case-folded scheme/host, default ports and
    fragments dropped, tracking params stripped, query sorted."""
    from etl_cli_spark.operators.urls import canonicalize_url

    return lambda df: df.withColumn(out or col, canonicalize_url(col))


@register("url_domain")
def _url_domain_t(col: str, out: str = "domain") -> Transform:
    """``url_domain:url[,out]`` — registrable domain (eTLD+1) of a URL."""
    from etl_cli_spark.operators.urls import registrable_domain

    return lambda df: df.withColumn(out, registrable_domain(col))
