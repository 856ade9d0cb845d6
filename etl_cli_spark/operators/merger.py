"""The merger: the reference's join operator, Spark-first.

Semantics recovered from /root/reference/etl_cli/etl.py:148-187 (knob
compilation) + etl.py:39-53 (flags): for each source record, look up
matching merger records by equi-keys (``merger.query.<k> = '#<k>#'``,
etl.py:182-183) and merge fields. Expressed as a single Catalyst join so
the optimizer picks broadcast/sort-merge/shuffled-hash and AQE handles
skew — at 100 TB a dimension-sized merger broadcasts (no shuffle of the
fact side) and a fact-fact merge sort-merge-joins on the shuffled keys.

Match-mode -> join-type mapping (SURVEY §2.4):
- default                  -> left outer (unmatched source rows pass through)
- require_match (--mrm)    -> inner
- require_no_match(--mrnm) -> left anti (source columns only)
- match_one (--mmo)        -> merger deduped to one row per key pre-join
                              (row_number window; deterministic via order)
- unwind (--munwind)       -> natural join multiplicity (one row per match)
- strict_match (--mstrict) -> null-safe key equality (eqNullSafe)

Field-merge policy on conflicting column names (merge_direction, --mmd,
mandatory in the reference etl.py:159-160): dict-update semantics — the
winning side's value replaces the loser's *when present*; a null/missing
winner falls back to the loser (Mongo documents simply lack the field):
- m2s (merger-into-source): matched -> coalesce(merger.c, source.c)
- s2m (source-into-merger): matched -> coalesce(source.c, merger.c)
Unmatched rows always keep the source value.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..dsl import compile_query
from ..spec import MergerSpec

_MATCH_FLAG = "__etl_matched"
_SRC, _MRG = "__etl_src", "__etl_mrg"


def parse_keys(keys: tuple[str, ...]) -> list[tuple[str, str]]:
    """``'k'`` -> (k, k); ``'src_col:mrg_col'`` -> (src_col, mrg_col)."""
    if not keys:
        raise ValueError("merger requires at least one match key (--mkeys)")
    out = []
    for k in keys:
        if ":" in k:
            s, _, m = k.partition(":")
            out.append((s.strip(), m.strip()))
        else:
            out.append((k.strip(), k.strip()))
    return out


def _dedupe_one_match(mrg: DataFrame, mkeys: list[str], order: tuple[str, ...]) -> DataFrame:
    """match_one: keep a single merger row per key, deterministically."""
    if order:
        order_cols = [
            F.col(c.lstrip("-")).desc() if c.startswith("-") else F.col(c).asc()
            for c in order
        ]
    else:
        # no explicit order -> order by every non-key column for determinism
        order_cols = [F.col(c).asc_nulls_last() for c in mrg.columns if c not in mkeys] or [F.lit(1)]
    w = Window.partitionBy(*mkeys).orderBy(*order_cols)
    return mrg.withColumn("__etl_rn", F.row_number().over(w)).filter(F.col("__etl_rn") == 1).drop("__etl_rn")


def merge(
    src: DataFrame,
    mrg: DataFrame,
    spec: MergerSpec,
    merge_rules_fn: Callable[[DataFrame, Column, list[str], list[str]], DataFrame] | None = None,
) -> DataFrame:
    key_pairs = parse_keys(spec.keys)
    src_keys = [s for s, _ in key_pairs]
    mrg_keys = [m for _, m in key_pairs]

    # pre-join filter on the merger side (--mq); Catalyst pushes it to the scan
    q = compile_query(spec.query)
    if q.predicates:
        mrg = mrg.filter(q.predicate)

    if spec.require_no_match:
        # anti-join: keep only source rows with NO match; source columns only
        cond = _join_cond(src.alias(_SRC), mrg.alias(_MRG), key_pairs, spec.strict_match)
        return src.alias(_SRC).join(mrg.alias(_MRG), cond, "left_anti")

    if spec.match_one:
        mrg = _dedupe_one_match(mrg, mrg_keys, spec.match_one_order)

    if spec.broadcast:
        mrg = F.broadcast(mrg)

    mrg = mrg.withColumn(_MATCH_FLAG, F.lit(True))
    s, m = src.alias(_SRC), mrg.alias(_MRG)
    cond = _join_cond(s, m, key_pairs, spec.strict_match)
    how = "inner" if spec.require_match else "left"
    joined = s.join(m, cond, how)
    matched = F.col(f"{_MRG}.{_MATCH_FLAG}").isNotNull()

    src_cols = src.columns
    mrg_cols = [c for c in mrg.columns if c != _MATCH_FLAG]

    if merge_rules_fn is not None:
        # custom merge policy (--mrules): full control over the joined frame
        return merge_rules_fn(joined, matched, src_cols, mrg_cols)

    if spec.merge_as:
        # nest the matched record under a named struct field (--mma)
        nested = F.when(
            matched,
            F.struct(*[F.col(f"{_MRG}.{c}").alias(c) for c in mrg_cols]),
        ).otherwise(F.lit(None))
        out = [F.col(f"{_SRC}.{c}").alias(c) for c in src_cols]
        out.append(nested.alias(spec.merge_as))
        return joined.select(*out)

    merger_wins = spec.merge_direction == "m2s"
    out: list[Column] = []
    for c in src_cols:
        if c in mrg_cols and c not in src_keys:
            sv, mv = F.col(f"{_SRC}.{c}"), F.col(f"{_MRG}.{c}")
            winner = F.coalesce(mv, sv) if merger_wins else F.coalesce(sv, mv)
            out.append(F.when(matched, winner).otherwise(sv).alias(c))
        else:
            out.append(F.col(f"{_SRC}.{c}").alias(c))
    for c in mrg_cols:
        if c not in src_cols and c not in mrg_keys:
            out.append(F.col(f"{_MRG}.{c}").alias(c))
    return joined.select(*out)


def _join_cond(s: DataFrame, m: DataFrame, key_pairs: list[tuple[str, str]], strict: bool) -> Column:
    cond = None
    for sk, mk in key_pairs:
        sc, mc = F.col(f"{_SRC}.{sk}"), F.col(f"{_MRG}.{mk}")
        term = sc.eqNullSafe(mc) if strict else (sc == mc)
        cond = term if cond is None else (cond & term)
    return cond
