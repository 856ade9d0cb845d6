"""Query-DSL compiler: ``field__op=value`` strings -> Catalyst Columns.

Re-expresses the reference's query language — repeatable ``k=v`` items
parsed by qs2dict/qlsit2query (/root/reference/etl_cli/base.py:216-230)
in the mongoengine operator dialect (requirements.txt:4-5; ``__ne`` usage
at etl.py:327) plus the reserved ``_limit/_sort/_fields/_count/_flat``
controls (base.py:482-484, 353-354, 221-228, 545-546).

Everything compiles to stock Column predicates, so Catalyst gives filter
pushdown / column pruning / limit pushdown for free — at 100 TB the
predicates reach the parquet scan (check ``PushedFilters`` in explain).

Mongo null semantics are preserved deliberately (SURVEY §7 hard-part b):
``__ne`` and ``__nin`` match documents where the field is missing/null,
so they compile to ``(col != v) | col.isNull()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .flatten import flatten as _flatten_df

# operator suffixes (mongoengine dialect); the compiler recognizes the
# last ``__token`` of a key when the token is one of these.
_OPS = {
    "eq", "ne", "gt", "gte", "lt", "lte", "in", "nin", "exists",
    "regex", "iregex", "startswith", "istartswith", "endswith",
    "iendswith", "contains", "icontains", "size", "mod",
}

_RESERVED = {"_limit", "_sort", "_fields", "_count", "_flat", "_url", "_pagination", "_start", "_page"}


def coerce_value(raw: Any) -> Any:
    """qs-style scalar coercion: int -> float -> bool -> null -> string."""
    if not isinstance(raw, str):
        return raw
    s = raw.strip()
    low = s.lower()
    if low in ("null", "none"):
        return None
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def _coerce_list(raw: Any) -> list[Any]:
    if isinstance(raw, (list, tuple)):
        return [coerce_value(v) for v in raw]
    return [coerce_value(v) for v in str(raw).split(",")]


def split_key(key: str) -> tuple[str, str]:
    """``path__op`` -> (dotted path, op); ``__`` also nests (mongoengine).

    ``country__code`` (no trailing op token) is a nested path ->
    ``country.code``; ``price__gte`` -> (``price``, ``gte``).
    """
    parts = key.split("__")
    if len(parts) > 1 and parts[-1] in _OPS:
        op = parts[-1]
        path = ".".join(p for p in parts[:-1] if p)
    else:
        op = "eq"
        path = ".".join(p for p in parts if p)
    return path, op


def compile_predicate(path: str, op: str, value: Any) -> Column:
    """One ``field__op=value`` term -> a Column predicate."""
    c = F.col(path)
    if op == "eq":
        v = coerce_value(value)
        if v is None:
            return c.isNull()
        return c == F.lit(v)
    if op == "ne":
        v = coerce_value(value)
        if v is None:
            return c.isNotNull()
        # Mongo $ne matches missing/null fields too
        return (c != F.lit(v)) | c.isNull()
    if op in ("gt", "gte", "lt", "lte"):
        v = coerce_value(value)
        return {"gt": c > v, "gte": c >= v, "lt": c < v, "lte": c <= v}[op]
    if op == "in":
        return c.isin(_coerce_list(value))
    if op == "nin":
        return (~c.isin(_coerce_list(value))) | c.isNull()
    if op == "exists":
        want = bool(coerce_value(value))
        return c.isNotNull() if want else c.isNull()
    if op == "regex":
        return c.rlike(str(value))
    if op == "iregex":
        return c.rlike(f"(?i){value}")
    if op == "startswith":
        return c.startswith(str(value))
    if op == "istartswith":
        return F.lower(c).startswith(str(value).lower())
    if op == "endswith":
        return c.endswith(str(value))
    if op == "iendswith":
        return F.lower(c).endswith(str(value).lower())
    if op == "contains":
        return c.contains(str(value))
    if op == "icontains":
        return F.lower(c).contains(str(value).lower())
    if op == "size":
        return F.size(c) == int(coerce_value(value))
    if op == "mod":
        div, rem = _coerce_list(value)
        return c % int(div) == int(rem)
    raise ValueError(f"unsupported query operator: {op!r}")


@dataclass
class CompiledQuery:
    """Result of compiling a query item list; apply with :meth:`apply`."""

    predicates: list[Column] = field(default_factory=list)
    limit: int | None = None
    sort: list[tuple[str, bool]] = field(default_factory=list)  # (path, desc)
    fields_include: list[str] = field(default_factory=list)
    fields_exclude: list[str] = field(default_factory=list)
    count: bool = False
    flat: bool = False
    url: str | None = None
    options: dict[str, Any] = field(default_factory=dict)

    @property
    def predicate(self) -> Column | None:
        p = None
        for term in self.predicates:
            p = term if p is None else (p & term)
        return p

    def apply(self, df: DataFrame) -> DataFrame:
        """filter -> project -> flatten -> sort -> limit -> count."""
        if self.predicates:
            df = df.filter(self.predicate)
        if self.fields_include:
            df = df.select(*self.fields_include)
        if self.fields_exclude:
            df = df.drop(*self.fields_exclude)
        if self.flat:
            df = _flatten_df(df)
        if self.sort:
            df = df.orderBy(*[F.col(p).desc() if d else F.col(p).asc() for p, d in self.sort])
        if self.limit is not None:
            df = df.limit(self.limit)
        if self.count:
            df = df.agg(F.count(F.lit(1)).alias("cnt"))
        return df


def _parse_item(key: str, value: Any, out: CompiledQuery) -> None:
    if key == "_limit":
        out.limit = int(coerce_value(value))
    elif key == "_sort":
        for f_ in str(value).split(","):
            f_ = f_.strip()
            if not f_:
                continue
            desc = f_.startswith("-")
            out.sort.append((f_.lstrip("+-"), desc))
    elif key == "_fields":
        # accumulates across repeated items, comma-joined (base.py:221-228);
        # leading '-' = exclusion, '__' = nested path
        for f_ in str(value).split(","):
            f_ = f_.strip()
            if not f_:
                continue
            if f_.startswith("-"):
                out.fields_exclude.append(f_[1:].replace("__", "."))
            else:
                out.fields_include.append(f_.replace("__", "."))
    elif key == "_count":
        out.count = bool(coerce_value(value))
    elif key == "_flat":
        out.flat = bool(coerce_value(value))
    elif key == "_url":
        out.url = str(value)
    elif key.startswith("_"):
        out.options[key] = coerce_value(value)
    else:
        path, op = split_key(key)
        out.predicates.append(compile_predicate(path, op, value))


def compile_query(query: Iterable[str] | Mapping[str, Any] | str | None) -> CompiledQuery:
    """Compile query items into a :class:`CompiledQuery`.

    Accepts a list of ``"k=v"`` strings (the CLI form), a mapping, or a
    single string. Values keep their raw string form for regex-ish ops and
    are coerced for comparisons.
    """
    out = CompiledQuery()
    if query is None:
        return out
    if isinstance(query, str):
        query = [query]
    if isinstance(query, Mapping):
        items = list(query.items())
    else:
        items = []
        for raw in query:
            if "=" not in raw:
                raise ValueError(f"query item {raw!r} is not k=v")
            k, v = raw.split("=", 1)
            items.append((k.strip(), v))
    for k, v in items:
        _parse_item(k, v, out)
    return out
