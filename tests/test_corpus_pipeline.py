"""Declarative corpus-pipeline runner (plans/corpus.py)."""

from __future__ import annotations

import pytest

from etl_cli_spark.plans.corpus import run_corpus_pipeline


def test_pipeline_equals_manual_composition(spark, engine):
    from etl_cli_spark.operators.dedup import exact_text_dedup
    from etl_cli_spark.operators.pipeline import decontaminate, deterministic_split
    from etl_cli_spark.operators.text import token_count

    docs = engine.read("documents")
    stages = [
        {"stage": "quality_filter", "min_tokens": 20},
        {"stage": "dedup_exact"},
        {"stage": "decontaminate", "benchmark_filter": "doc_id % 97 = 0", "n": 8},
        {"stage": "split", "weights": {"train": 0.9, "val": 0.05, "test": 0.05}},
    ]
    declared = run_corpus_pipeline(docs, stages)
    manual = deterministic_split(
        decontaminate(
            exact_text_dedup(docs.filter(token_count("text") >= 20)),
            docs.filter("doc_id % 97 = 0"),
            n=8,
        ),
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    )
    assert sorted((r.doc_id, r.split) for r in declared.select("doc_id", "split").collect()) == \
        sorted((r.doc_id, r.split) for r in manual.select("doc_id", "split").collect())


def test_pipeline_validate_and_tokenize_stages(spark, engine):
    docs = engine.read("documents")
    out = run_corpus_pipeline(
        docs,
        [
            {"stage": "validate", "rules": {"has_text": "length(text) > 0"}},
            {"stage": "quota", "group_cols": ["lang"], "quotas": {"en": 5}, "default": 2},
            {"stage": "tokenize", "top_k": 10},
            {"stage": "transform", "exprs": {"n_ids": "size(token_ids)"}},
        ],
    )
    rows = out.select("doc_id", "lang", "token_ids", "n_ids").collect()
    assert rows and all(r.n_ids == len(r.token_ids) for r in rows)
    per_lang = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    assert per_lang.get("en", 0) <= 5 and all(
        v <= 5 if k == "en" else v <= 2 for k, v in per_lang.items()
    )


def test_pipeline_unknown_stage_fails_fast(spark, engine):
    with pytest.raises(ValueError, match="unknown stage 'dedupe'"):
        run_corpus_pipeline(engine.read("documents"), [{"stage": "dedupe"}])


def test_pipeline_is_lazy_one_plan(spark, engine):
    """Composition must not trigger jobs: the runner returns a lazy frame
    whose optimized plan spans all stages (cross-stage optimization)."""
    docs = engine.read("documents")
    df = run_corpus_pipeline(
        docs,
        [
            {"stage": "filter", "expr": "n_chars > 10"},
            {"stage": "quality_filter", "min_tokens": 5},
            {"stage": "split"},
        ],
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # both filters collapse into the scan-adjacent Filter of one plan
    assert plan.count("Scan") <= 2 and "split" in df.columns
