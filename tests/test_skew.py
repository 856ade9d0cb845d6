"""Skew hardening (round-6): adversarial hot-key fixtures for the
banded/bucketed operators.

Three layers of defense, each pinned here:
1. AQE skew-join splitting (session default) parallelizes a moderately
   hot LSH bucket's self-join partition — plan-asserted (``skew=true``
   on the SortMergeJoin) under production-shaped thresholds scaled to
   test data.
2. The ``max_bucket_size`` clique->star guard bounds the CANDIDATE
   COUNT for degenerate buckets, which AQE cannot do (it parallelizes
   m^2 work, it doesn't shrink it).
3. Salting (per_domain_cap, salted_join, funnel) spreads hot keys
   deterministically where a window/join can't be split by AQE.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F


def _hot_corpus(spark, n_total=2000, n_hot=600):
    """n_hot documents with IDENTICAL text (one degenerate LSH bucket
    per band) + benign distinct tail. The hot share is 30%, the
    VERDICT's adversarial shape."""
    hot = spark.range(n_hot).select(
        F.col("id").cast("long").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again and again and again").alias("text"),
    )
    cold = spark.range(n_hot, n_total).select(
        F.col("id").cast("long").alias("doc_id"),
        F.concat(
            F.lit("unique document body number "),
            F.col("id").cast("string"),
            F.lit(" with entirely distinct content token"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    return hot.unionByName(cold)


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_bucket_cap_bounds_candidates_linearly(spark):
    """A degenerate bucket of m docs must emit O(m) candidates under
    the cap, not m^2/2: with 600 identical docs the clique would be
    179,700 pairs; the star is exactly 599."""
    from etl_cli_spark.operators.dedup import _minhash_base, _pairs_from_base

    d = _hot_corpus(spark)
    base = _minhash_base(d, "doc_id", "text", 3, 64, 16).persist()
    capped = _pairs_from_base(base, threshold=0.7, max_bucket_size=50)
    rows = capped.filter("b_id < 600").collect()
    # every hot doc pairs with the hub (doc 0) once, jaccard 1.0
    assert len(rows) == 599
    assert all(r.a_id == 0 and r.jaccard == 1.0 for r in rows)
    base.unpersist()


def test_bucket_cap_preserves_dedup_result_on_degenerate_bucket(spark):
    """Greedy dedup through the star reaches the same survivors as the
    clique when the oversized bucket is truly degenerate (identical
    docs): every member pairs with the hub at jaccard 1.0, so all but
    doc 0 are removed either way — and the cold tail is untouched."""
    from etl_cli_spark.operators.dedup import minhash_dedup

    d = _hot_corpus(spark)
    plain = sorted(
        r.doc_id for r in minhash_dedup(d, threshold=0.8).select("doc_id").collect()
    )
    capped = sorted(
        r.doc_id
        for r in minhash_dedup(d, threshold=0.8, max_bucket_size=50)
        .select("doc_id")
        .collect()
    )
    assert capped == plain
    assert 0 in capped and not any(1 <= i < 600 for i in capped)
    assert sum(1 for i in capped if i >= 600) == 2000 - 600


def test_bucket_cap_off_by_default_keeps_clique(spark):
    """Oracle-replayed semantics unchanged: without the cap, the hot
    bucket yields the full clique."""
    from etl_cli_spark.operators.dedup import _minhash_base, _pairs_from_base

    d = _hot_corpus(spark, n_total=260, n_hot=60)
    base = _minhash_base(d, "doc_id", "text", 3, 64, 16)
    pairs = _pairs_from_base(base, threshold=0.7)
    assert pairs.filter("b_id < 60").count() == 60 * 59 // 2


def test_aqe_skew_split_fires_on_hot_bucket_join(spark):
    """Moderate skew path: with thresholds scaled to test-sized data
    (production defaults are 256 MB / factor 5 — same machinery), the
    LSH bucket self-join's hot partition must be split by AQE: the
    executed SortMergeJoin carries ``skew=true``. This is the evidence
    that the engine session's shape (sort-merge + AQE on) lets Spark
    absorb a hot bucket without any operator change."""
    from etl_cli_spark.operators.dedup import _minhash_base

    d = _hot_corpus(spark, n_total=3000, n_hot=900)
    with _confs(
        spark,
        **{
            # enough map partitions that a hot (band, bucket) key
            # isolates into its own reduce partition — with only 4,
            # the 16 hot keys spread and no partition looks skewed
            # (skew detection is per-partition, not per-key)
            "spark.sql.shuffle.partitions": "64",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4096",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2048",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1024",
        },
    ):
        base = _minhash_base(d, "doc_id", "text", 3, 64, 16).persist()
        buckets = base.select("id", F.posexplode("bh").alias("band", "bucket"))
        joined = (
            buckets.join(
                buckets.select(F.col("id").alias("b_id"), "band", "bucket"),
                on=["band", "bucket"],
            )
            .filter(F.col("id") < F.col("b_id"))
        )
        # execute THIS plan object (count() would build a separate
        # query execution and leave this one isFinalPlan=false)
        qe = joined._jdf.queryExecution()
        n = qe.executedPlan().execute().count()
        assert n >= 900 * 899 // 2  # the clique really is there
        plan = qe.executedPlan().toString()
        base.unpersist()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:2000]
    assert "AQEShuffleRead skewed" in plan


def test_salted_join_on_30pct_hot_key_matches_plain(spark):
    """30% of the fact side on one key: salted_join must return exactly
    the plain join's multiset, and its join keys include the salt (the
    key-spreading is structural, not best-effort)."""
    from etl_cli_spark.operators.skew import salted_join

    fact = spark.range(10000).select(
        F.when(F.col("id") < 3000, F.lit(7)).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(97).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = fact.join(dim, "k").groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    salted = (
        salted_join(fact, dim, "k").groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_per_domain_cap_salted_equals_unsalted_on_hot_domain(spark):
    """30%-hot domain: the salted two-stage rank must pick exactly the
    unsalted winners (the salted pre-stage only ever drops rows that
    provably can't make the global top-cap)."""
    from etl_cli_spark.operators.urls import per_domain_cap

    rows = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1500, F.lit("https://hot.example.com/p/"))
        .otherwise(
            F.concat(F.lit("https://site"), (F.col("id") % 40).cast("string"), F.lit(".example.org/p/"))
        )
        .alias("stem"),
    ).select("doc_id", F.concat("stem", F.col("doc_id").cast("string")).alias("url"))
    unsalted = sorted(
        r.doc_id for r in per_domain_cap(rows, "url", cap=100).select("doc_id").collect()
    )
    salted = sorted(
        r.doc_id
        for r in per_domain_cap(rows, "url", cap=100, salt_buckets=8).select("doc_id").collect()
    )
    assert salted == unsalted
