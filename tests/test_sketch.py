"""KMV distinct sketches (operators/sketch.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cli_spark.operators.sketch import (
    kmv_distinct,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def values(spark):
    # 5000 distinct values, each duplicated 3x, two groups
    df = spark.range(5000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    return df.unionByName(df).unionByName(df).cache()


def test_kmv_accuracy_global(values):
    est = kmv_distinct(values, "v", k=256).collect()[0].est_distinct
    assert abs(est - 5000) / 5000 < 0.2  # ~6% expected at k=256


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    est = kmv_distinct(df, "v", k=256).collect()[0].est_distinct
    assert est == 100.0  # fewer than k distinct -> exact


def test_kmv_grouped(values):
    rows = {r.g: r.est_distinct for r in kmv_distinct(values, "v", by=["g"], k=256).collect()}
    assert set(rows) == {0, 1}
    for g, est in rows.items():
        assert abs(est - 2500) / 2500 < 0.2


def test_kmv_sketch_merge_equals_direct(spark):
    """Sketch(A) merged with Sketch(B) must equal Sketch(A union B) —
    the mergeability contract that makes per-shard sketch tables valid."""
    a = spark.range(0, 3000).select(F.col("id").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").alias("v"))  # overlap 2000-3000
    sk_a, sk_b = kmv_sketch(a, "v", k=128), kmv_sketch(b, "v", k=128)
    merged = kmv_merge(sk_a.unionByName(sk_b), k=128)
    direct = kmv_sketch(a.unionByName(b), "v", k=128)
    assert merged.collect()[0].kmv == direct.collect()[0].kmv
    est = kmv_estimate(merged, k=128).collect()[0].est_distinct
    assert abs(est - 6000) / 6000 < 0.3


def test_kmv_estimate_matches_distinct(values):
    via_sketch = kmv_estimate(kmv_sketch(values, "v", by=["g"], k=64), by=["g"], k=64)
    direct = kmv_distinct(values, "v", by=["g"], k=64)
    a = {r.g: r.est_distinct for r in via_sketch.collect()}
    b = {r.g: r.est_distinct for r in direct.collect()}
    assert a == b


def test_kmv_rejects_tiny_k(values):
    with pytest.raises(ValueError, match="k >= 2"):
        kmv_distinct(values, "v", k=1)


def test_kmv_min_k_is_salted(values):
    """Plan evidence for the skew guard: the first window partitions by
    (group, salt), so no single task ranks a whole group's hashes."""
    plan = kmv_distinct(values, "v", by=["g"], k=64)._jdf.queryExecution().optimizedPlan().toString()
    assert "pmod" in plan


# -- count-min sketch -------------------------------------------------------


@pytest.fixture(scope="module")
def zipfy(spark):
    # skewed frequencies: item i appears (50 - i) times, i in 0..49
    df = spark.range(50).select(F.col("id").alias("i"))
    rep = df.select("i", F.explode(F.sequence(F.lit(1), 50 - F.col("i"))).alias("_"))
    return rep.select(F.concat(F.lit("item"), F.col("i")).alias("v")).cache()


def test_cms_overestimates_only_and_tight(zipfy):
    from etl_cli_spark.operators.sketch import cms_estimate, cms_sketch

    sk = cms_sketch(zipfy, "v", width=2048, depth=3)
    est = {
        r.value: r.est_count
        for r in cms_estimate(sk, [f"item{i}" for i in range(50)], width=2048).collect()
    }
    for i in range(50):
        true = 50 - i
        assert est[f"item{i}"] >= true  # CMS never under-counts
        assert est[f"item{i}"] <= true + 10  # 1275 items in 2048 cells: tiny overshoot
    # absent item estimates ~0 (may collide, still bounded)
    ghost = cms_estimate(sk, ["never-seen"], width=2048).collect()[0].est_count
    assert ghost <= 10


def test_cms_merge_equals_direct(spark):
    from etl_cli_spark.operators.sketch import cms_estimate, cms_merge, cms_sketch

    a = spark.range(1000).select((F.col("id") % 7).cast("string").alias("v"))
    b = spark.range(500).select((F.col("id") % 3).cast("string").alias("v"))
    merged = cms_merge(cms_sketch(a, "v").unionByName(cms_sketch(b, "v")))
    direct = cms_sketch(a.unionByName(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    est = {r.value: r.est_count for r in cms_estimate(merged, ["0", "1", "2"]).collect()}
    # value "0": 143 in a (ids 0,7,...,994) + 167 in b -> >= 310
    assert est["0"] >= 310


def test_cms_grouped_sketch_bounded(zipfy):
    """The sketch never exceeds depth*width rows per group, whatever the
    input size — the property that makes the exchange narrow at scale."""
    from etl_cli_spark.operators.sketch import cms_sketch

    g = zipfy.withColumn("g", F.lit("g0"))
    sk = cms_sketch(g, "v", by=["g"], width=64, depth=2)
    assert sk.count() <= 64 * 2
    assert set(sk.columns) == {"g", "d", "pos", "c", "__w", "__d"}


# -- histogram quantile sketch ----------------------------------------------


def test_hist_quantile_exact_on_uniform(spark):
    from etl_cli_spark.operators.sketch import hist_quantile, hist_sketch

    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    sk = hist_sketch(df, "v", lo=0.0, hi=100.0, bins=10)
    got = {r.q: r.est for r in hist_quantile(sk, [0.5, 0.9], 0.0, 100.0, bins=10).collect()}
    # N=100, r=50: bins of 10, cum(bin4)=50 -> est = 10*(4 + 10/10) = 50
    assert got[0.5] == 50.0
    assert got[0.9] == 90.0


def test_hist_quantile_within_bin_width(spark):
    from etl_cli_spark.operators.sketch import hist_quantile, hist_sketch

    df = spark.range(5000).select(((F.col("id") * 37) % 1000).cast("double").alias("v"))
    sk = hist_sketch(df, "v", lo=0.0, hi=1000.0, bins=100)
    exact = df.selectExpr("percentile(v, 0.25) AS p").collect()[0].p
    est = hist_quantile(sk, [0.25], 0.0, 1000.0, bins=100).collect()[0].est
    assert abs(est - exact) <= 10.0  # one bin width


def test_hist_merge_equals_direct(spark):
    from etl_cli_spark.operators.sketch import hist_merge, hist_quantile, hist_sketch

    a = spark.range(0, 600).select(F.col("id").cast("double").alias("v"))
    b = spark.range(600, 1000).select(F.col("id").cast("double").alias("v"))
    merged = hist_merge(hist_sketch(a, "v", 0.0, 1000.0).unionByName(hist_sketch(b, "v", 0.0, 1000.0)))
    direct = hist_sketch(a.unionByName(b), "v", 0.0, 1000.0)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    q_m = hist_quantile(merged, [0.5], 0.0, 1000.0).collect()[0].est
    q_d = hist_quantile(direct, [0.5], 0.0, 1000.0).collect()[0].est
    assert q_m == q_d


def test_hist_clamps_out_of_range(spark):
    from etl_cli_spark.operators.sketch import hist_sketch

    df = spark.createDataFrame([(-5.0,), (0.0,), (99.0,), (500.0,)], "v double")
    rows = {r.bin: r.c for r in hist_sketch(df, "v", lo=0.0, hi=100.0, bins=10).collect()}
    assert rows[0] == 2  # -5 clamps into bin 0
    assert rows[9] == 2  # 500 clamps into the top bin


# -- embedded build-parameter metadata (round-3 review item) ----------------


def test_sketch_metadata_derived_on_probe(spark):
    """Probes with omitted parameters read the embedded metadata and
    match an explicit-parameter probe exactly."""
    from etl_cli_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
        hist_quantile,
        hist_sketch,
        kmv_estimate,
        kmv_sketch,
    )

    df = spark.range(500).select((F.col("id") % 37).cast("string").alias("v"))
    sk = cms_sketch(df, "v", width=128, depth=2)
    imp = {r.value: r.est_count for r in cms_estimate(sk, ["0", "1"]).collect()}
    exp = {
        r.value: r.est_count
        for r in cms_estimate(sk, ["0", "1"], width=128, depth=2).collect()
    }
    assert imp == exp

    dv = spark.range(100).select(F.col("id").cast("double").alias("v"))
    hs = hist_sketch(dv, "v", lo=0.0, hi=100.0, bins=10)
    assert (
        hist_quantile(hs, [0.5]).collect()[0].est
        == hist_quantile(hs, [0.5], 0.0, 100.0, bins=10).collect()[0].est
    )

    ks = kmv_sketch(df, "v", k=32)
    assert (
        kmv_estimate(ks).collect()[0].est_distinct
        == kmv_estimate(ks, k=32).collect()[0].est_distinct
    )


def test_sketch_metadata_mismatch_fails_job(spark):
    """An explicit probe parameter that disagrees with the embedded
    build parameter fails the job instead of returning wrong numbers."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from etl_cli_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
        hist_quantile,
        hist_sketch,
        kmv_estimate,
        kmv_sketch,
    )

    df = spark.range(100).select((F.col("id") % 7).cast("string").alias("v"))
    sk = cms_sketch(df, "v", width=128, depth=2)
    with pytest.raises(Exception):
        cms_estimate(sk, ["0"], width=64, depth=2).collect()

    dv = spark.range(100).select(F.col("id").cast("double").alias("v"))
    hs = hist_sketch(dv, "v", lo=0.0, hi=100.0, bins=10)
    with pytest.raises(Exception):
        hist_quantile(hs, [0.5], 0.0, 200.0, bins=10).collect()

    ks = kmv_sketch(df, "v", k=32)
    with pytest.raises(Exception):
        kmv_estimate(ks, k=64).collect()


def test_sketch_merge_mixed_geometry_fails(spark):
    """Merging shards built with differing geometry fails the merge job."""
    import pytest
    from etl_cli_spark.operators.sketch import cms_merge, cms_sketch, hist_merge, hist_sketch

    df = spark.range(100).select((F.col("id") % 7).cast("string").alias("v"))
    mixed = cms_sketch(df, "v", width=64, depth=2).unionByName(
        cms_sketch(df, "v", width=128, depth=2)
    )
    with pytest.raises(Exception):
        cms_merge(mixed).collect()

    dv = spark.range(100).select(F.col("id").cast("double").alias("v"))
    hmixed = hist_sketch(dv, "v", 0.0, 100.0, bins=10).unionByName(
        hist_sketch(dv, "v", 0.0, 200.0, bins=10)
    )
    with pytest.raises(Exception):
        hist_merge(hmixed).collect()


# ---------------------------------------------------------------------------
# HyperLogLog


def test_hll_accuracy(spark):
    """Relative error within 4 standard errors (1.04/sqrt(m)) of the
    true cardinality for a range of cardinalities."""
    from etl_cli_spark.operators.sketch import hll_distinct

    for n in (300, 3000, 20000):
        df = spark.range(n).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
        est = hll_distinct(df, "v", p=8).first()["est_distinct"]
        assert abs(est / n - 1.0) < 4 * 1.04 / (256 ** 0.5), (n, est)


def test_hll_merge_equals_whole(spark):
    """Sharded sketches merged == sketch of the union, estimate
    included — the mergeability contract."""
    from etl_cli_spark.operators.sketch import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    df = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("u"), (F.col("id") * 7919) % 2600).alias("v"),
    )
    whole = {
        r["g"]: r["est_distinct"]
        for r in hll_distinct(df, "v", by=["g"], p=6).collect()
    }
    a = hll_sketch(df.filter("v like 'u1%'"), "v", by=["g"], p=6)
    b = hll_sketch(df.filter("v not like 'u1%'"), "v", by=["g"], p=6)
    merged = {
        r["g"]: r["est_distinct"]
        for r in hll_estimate(
            hll_merge(a.unionByName(b), by=["g"]), by=["g"]
        ).collect()
    }
    assert merged == whole


def test_hll_duplicates_do_not_move_estimate(spark):
    """The estimate is a function of the distinct value set only."""
    from etl_cli_spark.operators.sketch import hll_distinct

    base = spark.range(1000).select(F.concat(F.lit("d"), F.col("id")).alias("v"))
    dup = base.unionAll(base).unionAll(base)
    assert (
        hll_distinct(base, "v", p=7).first()["est_distinct"]
        == hll_distinct(dup, "v", p=7).first()["est_distinct"]
    )


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities take the linear-counting branch and stay
    accurate (raw HLL would bias high here)."""
    from etl_cli_spark.operators.sketch import hll_distinct

    df = spark.range(30).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    est = hll_distinct(df, "v", p=8).first()["est_distinct"]
    assert abs(est - 30) <= 5


def test_hll_meta_mismatch_fails(spark):
    import pytest
    from etl_cli_spark.operators.sketch import hll_estimate, hll_merge, hll_sketch

    df = spark.range(100).select(F.col("id").cast("string").alias("v"))
    sk = hll_sketch(df, "v", p=6)
    with pytest.raises(Exception):
        hll_estimate(sk, p=8).collect()
    mixed = sk.unionByName(hll_sketch(df, "v", p=8))
    with pytest.raises(Exception):
        hll_merge(mixed).collect()


def test_hll_rejects_bad_p(spark):
    import pytest
    from etl_cli_spark.operators.sketch import hll_sketch

    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        hll_sketch(df, "v", p=2)
