"""Plan-shape invariants for the scale-critical query surface.

These assert the properties the 100 TB design depends on, so a refactor
that silently degrades a plan (a filter that stops pushing down, a join
that falls back to cartesian) fails CI instead of failing at deploy:

- NO CartesianProduct anywhere in the flagship read surface;
- DSL predicates reach the parquet scan (PushedFilters);
- `_fields` projection prunes the read schema;
- small-dimension joins broadcast.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

# read-only queries() entries (no table writes, no servers, no tempdir
# index builds) spanning every plan family
READ_QUERIES = [
    "dsl_eq_project",
    "dsl_sort_limit",
    "flatten_struct",
    "sql_q3_shape",
    "sql_q7_shape",
    "sql_q17_shape",
    "sql_q21_shape",
    "agg_q1",
    "merger_left",
    "merger_anti",
    "asof_join",
    "interval_join",
    "window_topk_per_group",
    "events_funnel",
    "events_retention",
    "dedup_exact",
    "dedup_minhash",
    "decontaminate",
    "bloom_decontaminate",
    "quota_sample",
    "rank_scores",
    "sketch_topk_cms",
    "text_stats_by_lang",
    "similarity_topk",
    # round-4 operators
    "paragraph_dedup",
    "token_budget_sample",
    "semantic_dedup",
    "dsir_select",
    "sql_q8_shape",
    "sql_q13_shape",
    "url_canonicalize",
    "url_domain_cap",
    "sketch_distinct_hll",
    "ts_gap_fill",
    "weighted_sample",
    "events_attribution",
    # round-5 operators
    "bpe_encode",
    "quality_classifier",
    "fuzzy_join",
    "leakage_split",
    # round-10 operators
    "kmeans_refine",
    # round-13 operators (fingerprint near-dup joins must stay banded
    # equi-joins — a cartesian here is the exact failure the pigeonhole
    # design exists to avoid; gopher is one projection)
    "multimodal_phash",
    "image_neardup",
    "audio_fingerprint",
    "audio_neardup",
    "gopher_quality",
    "video_phash",
    "video_neardup",
    "perplexity_buckets",
    "gopher_repetition",
    "alpha_rebalance",
    "semantic_cross_dedup",
    "url_blocklist",
    # round-14 operators (the quality filters are single projections;
    # pdf_extract is one MapInPandas pass with no join at all)
    "c4_quality",
    "script_profile",
    "pdf_extract",
    "image_text_pairs",
]


def _optimized(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.mark.parametrize("name", READ_QUERIES)
def test_no_cartesian_product(spark, name):
    """A CartesianProduct in any of these is a 100 TB outage. (Broadcast
    nested-loop joins of scalar aggregates — corpus totals, avgdl — are
    fine and expected; `Join Cross` with a non-broadcast side is not.)"""
    plan = _optimized(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_dsl_filters_reach_the_scan(spark, engine):
    df = engine.read("orders", ["o_orderstatus=F", "o_totalprice__gt=100000"])
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in physical
    assert "IsNotNull(o_orderstatus)" in physical or "EqualTo(o_orderstatus,F)" in physical


def test_dsl_fields_prune_read_schema(spark, engine):
    df = engine.read("lineitem", ["_fields=l_orderkey,l_quantity"])
    physical = df._jdf.queryExecution().executedPlan().toString()
    # the parquet scan must read exactly the two requested columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in physical


def test_small_dimension_joins_broadcast(spark, engine):
    df = engine.sql(
        "SELECT n_name, count(*) AS n FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    )
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in physical


def test_decontaminate_shuffles_hashes_not_text(spark, engine):
    """The decontamination join must move 64-bit gram hashes, never the
    document text: no plan operator above the scan carries `text`."""
    from etl_cli_spark.operators.pipeline import decontaminate

    d = engine.read("documents")
    out = decontaminate(d, d.filter("doc_id % 97 = 0"), n=8).select("doc_id")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    assert joins and all("text#" not in ln for ln in joins)


def test_paragraph_dedup_winner_is_hash_aggregate(spark, engine):
    """The first-occurrence winner per segment must be an aggregate
    (partial/map-side combine absorbs hot boilerplate), not a window
    over a hash-partitioned sort — a window would serialize every copy
    of a repeated paragraph onto one task."""
    from etl_cli_spark.operators.pipeline import paragraph_dedup

    docs = engine.read("documents")
    plan = paragraph_dedup(
        docs, window_words=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "min(" in plan or "HashAggregate" in plan
    # reassembly aside, no global Window over the segment hash
    import re

    assert not re.search(r"Window .*__h", plan), "winner pick must not be a window"


def test_dsir_model_broadcasts(spark, engine):
    """The m-bucket model is corpus-independent and must broadcast —
    the scoring join shuffling the corpus against a 10k-row model would
    be the classic avoidable-exchange mistake."""
    from etl_cli_spark.operators.rank import importance_weights

    d = engine.read("documents")
    plan = importance_weights(
        d, d.filter("lang = 'en'"), eager=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_bpe_encode_broadcasts_the_pieces_side(spark):
    """The word->pieces join must build on the vocabulary-sized pieces
    table; without the explicit hint Spark's file-size estimate can
    pick the exploded CORPUS as the build side (round-5 audit find)."""
    df = entry.queries()["bpe_encode"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [word" in plan and "BuildRight" in plan


def test_classifier_features_use_window_not_total_join(spark):
    """L1 normalization must come from a window over doc_id, not a join
    against a per-doc aggregate (corpus-sized — Spark happily broadcast
    it before the round-5 fix)."""
    from etl_cli_spark.operators.classifier import hashed_features

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = hashed_features(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert plan.count("BroadcastExchange") == 0


def test_strip_repeated_spans_shuffles_hashes_not_text(spark, engine):
    """Span discovery must move (id, pos, 64-bit gram hash) rows, never
    document text: no join or exchange operator above the scans carries
    `text`, and no cartesian product appears anywhere (round-7)."""
    from etl_cli_spark.operators.pipeline import strip_repeated_spans

    d = engine.read("documents")
    out = strip_repeated_spans(d, n=8, min_docs=2).select("doc_id", "n_stripped")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    # the final starts-array join back to docs legitimately carries
    # text (it rebuilds it); the DISCOVERY joins (on gh) must not
    gh_joins = [ln for ln in joins if "gh#" in ln]
    assert gh_joins and all("text#" not in ln for ln in gh_joins)
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical
