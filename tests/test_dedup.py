from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cli_spark.operators.dedup import (
    exact_dedup,
    exact_text_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),  # near dup of 1
        (4, "completely different text about spark catalyst optimizer and shuffle exchange plans"),
        (5, "another unrelated document mentioning parquet files and arrow batches only"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_deterministic(spark):
    df = spark.createDataFrame([(2, "a"), (1, "a"), (5, "b")], ["id", "k"])
    out = exact_dedup(df, ["k"], ["id"])
    assert sorted(r.id for r in out.collect()) == [1, 5]


def test_exact_text_dedup(docs):
    out = exact_text_dedup(docs)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3, 4, 5]  # 2 dropped (exact dup of 1, keeps min id)


def test_minhash_pairs_find_near_dup(docs):
    pairs = minhash_lsh_pairs(docs, threshold=0.5, num_hashes=32, bands=16)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup always caught
    assert (1, 3) in got or (2, 3) in got  # near dup
    assert not any(4 in p or 5 in p for p in got)


def test_minhash_dedup_keeps_min_id(docs):
    out = minhash_dedup(docs, threshold=0.5, num_hashes=32, bands=16)
    ids = sorted(r.doc_id for r in out.collect())
    assert 1 in ids and 2 not in ids
    assert 4 in ids and 5 in ids


def test_simhash_properties(spark, docs):
    sh = docs.select("doc_id", simhash(F.col("text")).alias("sh")).collect()
    by_id = {r.doc_id: r.sh for r in sh}
    assert by_id[1] == by_id[2]  # identical text -> identical simhash
    assert by_id[1] != by_id[4]


def test_simhash_pairs(docs):
    pairs = simhash_pairs(docs, max_distance=8)
    got = {(r.a_id, r.b_id): r.distance for r in pairs.collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) in got


def test_ngram_jaccard_pairs(docs):
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    got = {(r.a_id, r.b_id): r.jaccard for r in pairs.collect()}
    assert got.get((1, 2)) == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0
    assert (4, 5) not in got


def test_lsh_scales_without_cross_join(docs):
    # plan must join on (band, bucket) hash keys, not a cartesian product
    pairs = minhash_lsh_pairs(docs, threshold=0.9)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_impls_agree(docs):
    kw = dict(threshold=0.5, num_hashes=32, bands=16)
    expr = {(r.a_id, r.b_id) for r in minhash_lsh_pairs(docs, impl="expr", **kw).collect()}
    pandas_ = {(r.a_id, r.b_id) for r in minhash_lsh_pairs(docs, impl="pandas", **kw).collect()}
    # different hash families, same verified dups on this corpus
    assert (1, 2) in expr and (1, 2) in pandas_
    assert expr == pandas_


def test_connected_components_chain(spark):
    from etl_cli_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "a_id long, b_id long",
    )
    got = {r.node: r.cluster for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_minhash_dedup_cc_transitive(spark):
    """A~B and B~C but not A~C: greedy keeps {A, C}; transitive CC keeps
    only A — the chain is one cluster."""
    from etl_cli_spark.operators.dedup import minhash_dedup, minhash_dedup_cc

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    mid = base.replace("gamma", "XgammaX")          # ~ both ends
    far = base.replace("gamma", "XgammaX").replace("kappa", "XkappaX").replace(
        "beta", "XbetaX"
    )
    df = spark.createDataFrame(
        [(1, base), (2, mid), (3, far)], "doc_id long, text string"
    )
    greedy = {r.doc_id for r in minhash_dedup(df, threshold=0.55).collect()}
    cc = {r.doc_id for r in minhash_dedup_cc(df, threshold=0.55).collect()}
    assert 1 in cc
    assert cc <= greedy
    # the crafted chain: 1~2 and 2~3 hold but 1~3 does not
    if greedy == {1, 3}:
        assert cc == {1}


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 64-node path graph has diameter 63; pointer jumping must collapse
    it to one cluster in O(log n) rounds (10 is generous), where plain
    one-hop propagation would need 63."""
    from etl_cli_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "a_id long, b_id long"
    )
    comp = connected_components(pairs, max_iter=10)
    rows = comp.collect()
    assert len(rows) == 64
    assert {r.cluster for r in rows} == {0}


def test_connected_components_nonconvergence_raises(spark):
    from etl_cli_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "a_id long, b_id long"
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)
    # strict=False returns the partial labels instead
    part = connected_components(pairs, max_iter=2, strict=False)
    assert part.count() == 64


def test_canonical_per_cluster_picks_best(spark):
    from etl_cli_spark.operators.dedup import canonical_per_cluster

    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 30), (3, "c", 20), (9, "solo", 5)],
        "doc_id long, text string, n_chars long",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "node long, cluster long"
    )
    kept = canonical_per_cluster(docs, clusters, "n_chars")
    ids = sorted(r.doc_id for r in kept.collect())
    # cluster {1,2,3}: doc 2 has max n_chars; singleton 9 survives
    assert ids == [2, 9]
    assert "cluster" not in kept.columns and "__grp" not in kept.columns


def test_canonical_per_cluster_tiebreak_min_id(spark):
    from etl_cli_spark.operators.dedup import canonical_per_cluster

    docs = spark.createDataFrame(
        [(5, "x", 7), (3, "y", 7)], "doc_id long, text string, n_chars long"
    )
    clusters = spark.createDataFrame([(5, 3), (3, 3)], "node long, cluster long")
    kept = canonical_per_cluster(docs, clusters, "n_chars").collect()
    assert [r.doc_id for r in kept] == [3]


def test_minhash_dedup_canonical_keeps_best_of_chain(spark):
    from etl_cli_spark.operators.dedup import minhash_dedup_canonical

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base + " v1"),
            (2, base + " v1 plus extra tail words"),
            (3, base + " v1x"),
            (50, "entirely different content with no overlap whatsoever in grams"),
        ],
        "doc_id long, text string",
    )
    docs = docs.withColumn("n_chars", F.length("text"))
    kept = minhash_dedup_canonical(docs, "n_chars", threshold=0.5)
    ids = sorted(r.doc_id for r in kept.collect())
    assert 50 in ids  # unrelated doc untouched
    assert 2 in ids   # longest variant is the cluster representative
    assert 1 not in ids and 3 not in ids
