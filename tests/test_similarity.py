from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_cli_spark.operators.similarity import (
    ann_topk,
    brute_force_all_pairs_topk,
    cosine,
    cosine_topk,
    embedding_neardup_pairs,
)


@pytest.fixture(scope="module")
def emb(engine):
    return engine.read("embeddings")


def _py_cosine(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_cosine_matches_python(spark):
    a, b = [1.0, 2.0, 3.0], [0.5, -1.0, 2.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0].c
    assert abs(got - _py_cosine(a, b)) < 1e-12


def test_cosine_topk_exact(emb):
    qvec = emb.filter("vec_id = 0").collect()[0].embedding
    top = cosine_topk(emb, [float(x) for x in qvec], k=5, exclude_ids=[0]).collect()
    assert len(top) == 5
    scores = [r.score for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in scores)
    # verify against python brute force
    rows = emb.collect()
    ranked = sorted(
        ((r.vec_id, _py_cosine(qvec, r.embedding)) for r in rows if r.vec_id != 0),
        key=lambda t: (-t[1], t[0]),
    )
    assert [r.vec_id for r in top] == [v for v, _ in ranked[:5]]


def test_ann_recall(emb):
    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0].embedding]
    exact = {r.vec_id for r in cosine_topk(emb, qvec, k=10, exclude_ids=[0]).collect()}
    approx = {r.vec_id for r in ann_topk(emb, qvec, k=10).collect()} - {0}
    # LSH with 4 bands should recover a reasonable share of the true top-10
    assert len(exact & approx) >= 3


def test_neardup_pairs_self_similarity(spark):
    # construct two nearly-identical vectors and one orthogonal
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0] * 4),
        (2, [0.99, 0.01, 0.0, 0.0] * 4),
        (3, [0.0, 0.0, 1.0, 0.0] * 4),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_neardup_pairs(df, threshold=0.95, n_planes=8, bands=4)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got


def test_neardup_pairs_recall_vs_exact(spark, emb):
    """Pin the driver query's parameters (threshold=0.4, bands=8) against
    exact ground truth on the fixture: precision must be 1.0 (candidates
    are exact-verified) and recall >= 0.9 — so the `embedding_neardup`
    rows-only driver entry can't silently degrade to near-empty."""
    a, b = emb.alias("a"), emb.alias("b")
    exact_df = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cosine(F.col("a.embedding"), F.col("b.embedding")) >= 0.4)
        .select(F.col("a.vec_id").alias("x"), F.col("b.vec_id").alias("y"))
    )
    exact = {(r.x, r.y) for r in exact_df.collect()}
    got = {
        (min(r.a_id, r.b_id), max(r.a_id, r.b_id))
        for r in embedding_neardup_pairs(emb, threshold=0.4, bands=8).collect()
    }
    assert exact, "fixture must contain real pairs at this threshold"
    assert got <= exact  # precision 1.0: every reported pair is a true pair
    assert len(got) / len(exact) >= 0.9


def test_brute_force_guard(spark):
    df = spark.range(200_000).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0)).alias("embedding")
    )
    with pytest.raises(ValueError, match="brute-force"):
        brute_force_all_pairs_topk(df)


def test_ivf_topk_recall(spark, engine):
    from etl_cli_spark.operators.similarity import cosine_topk, ivf_topk

    emb = engine.read("embeddings")
    q = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    exact = [r.vec_id for r in cosine_topk(emb, q, k=10).collect()]
    approx = [r.vec_id for r in ivf_topk(emb, q, k=10, n_centroids=8, n_probe=4).collect()]
    # probing half the cells must recover most of the true top-10
    assert len(set(exact) & set(approx)) >= 6
    # scores on the overlap agree with exact scoring
    assert approx == sorted(approx, key=lambda i: approx.index(i))


def test_ivf_index_partitions_all_rows(spark, engine):
    from etl_cli_spark.operators.similarity import ivf_index

    emb = engine.read("embeddings")
    indexed, cent = ivf_index(emb, n_centroids=8)
    assert indexed.count() == emb.count()
    cells = {r[0] for r in indexed.select("__cell").distinct().collect()}
    assert cells.issubset(set(range(8))) and len(cells) > 1
    assert len(cent) == 8


def test_persisted_ivf_index_probe(spark, emb, tmp_path):
    from etl_cli_spark.operators.similarity import build_ivf_index, ivf_topk, ivf_topk_indexed

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8, seed=7)
    qvec = [float(x) for x in emb.filter("vec_id = 0").first().embedding]

    got = ivf_topk_indexed(spark, path, qvec, k=10, n_probe=3)
    # probe plan must partition-prune to the probed cells — no full scan
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "__cell" in plan

    # same structure in-memory (same seed/sample) must agree exactly
    mem = ivf_topk(emb, qvec, k=10, n_centroids=8, n_probe=3, seed=7)
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]


def test_persisted_ivf_recall(spark, emb, tmp_path):
    from etl_cli_spark.operators.similarity import build_ivf_index, ivf_topk_indexed

    path = str(tmp_path / "ivf_r")
    build_ivf_index(emb, path, n_centroids=8)
    qvec = [float(x) for x in emb.filter("vec_id = 3").first().embedding]
    exact = {r.vec_id for r in cosine_topk(emb, qvec, k=10).collect()}
    probed = {r.vec_id for r in ivf_topk_indexed(spark, path, qvec, k=10, n_probe=4).collect()}
    assert len(exact & probed) >= 5


def test_persisted_ann_index_probe(spark, emb, tmp_path):
    from etl_cli_spark.operators.similarity import ann_topk_indexed, build_ann_index

    path = str(tmp_path / "ann")
    build_ann_index(emb, path, n_planes=16, bands=4, seed=42)
    qvec = [float(x) for x in emb.filter("vec_id = 0").first().embedding]

    got = ann_topk_indexed(spark, path, qvec, k=10)
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "__band" in plan and "__bucket" in plan

    # identical candidates/result as the one-shot ann_topk (same planes)
    mem = ann_topk(emb, qvec, k=10, n_planes=16, bands=4, seed=42)
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in mem.collect()]


def test_append_to_ann_index_equals_rebuild(spark, emb, tmp_path):
    """Incremental append is bit-identical to a full rebuild: signatures
    are a pure function of (seeded planes, vector)."""
    from etl_cli_spark.operators.similarity import (
        ann_topk_indexed,
        append_to_ann_index,
        build_ann_index,
    )

    half_a, half_b = emb.filter("vec_id % 2 = 0"), emb.filter("vec_id % 2 = 1")
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_ann_index(half_a, inc, n_planes=16, bands=4, seed=42)
    append_to_ann_index(half_b, inc)
    build_ann_index(emb, full, n_planes=16, bands=4, seed=42)

    n_inc = spark.read.parquet(f"{inc}/buckets").count()
    assert n_inc == spark.read.parquet(f"{full}/buckets").count()
    qvec = [float(x) for x in emb.filter("vec_id = 1").first().embedding]
    got_inc = [r.vec_id for r in ann_topk_indexed(spark, inc, qvec, k=10).collect()]
    got_full = [r.vec_id for r in ann_topk_indexed(spark, full, qvec, k=10).collect()]
    assert got_inc == got_full
    # appended-half vectors are actually reachable (not just present)
    assert any(v % 2 == 1 for v in got_inc)


def test_append_to_ivf_index(spark, emb, tmp_path):
    """Append assigns to the EXISTING centroids: every vector lands in
    exactly one cell and probes see old + new immediately."""
    from etl_cli_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_topk_indexed,
    )

    half_a, half_b = emb.filter("vec_id % 2 = 0"), emb.filter("vec_id % 2 = 1")
    path = str(tmp_path / "ivf_inc")
    build_ivf_index(half_a, path, n_centroids=8, seed=7)
    append_to_ivf_index(half_b, path)

    vecs = spark.read.parquet(f"{path}/vectors")
    assert vecs.count() == emb.count()
    assert vecs.select("vec_id").distinct().count() == emb.count()
    # querying an appended vector's own embedding must surface it
    qvec = [float(x) for x in emb.filter("vec_id = 1").first().embedding]
    top = [r.vec_id for r in ivf_topk_indexed(spark, path, qvec, k=5, n_probe=8).collect()]
    assert top[0] == 1


# -- semantic dedup (round-4, SemDeDup-style) --------------------------------


def test_semantic_dedup_drops_higher_id_of_close_pairs(engine):
    """Every dropped id has a kept lower-id neighbor at cosine >= tau
    in ITS OWN cluster... more precisely: the drop set equals exactly
    {b : exists a < b in same cluster, cos(a,b) >= tau} — verified
    against a brute-force recomputation."""
    from etl_cli_spark.operators.similarity import (
        _as_double,
        cosine,
        ivf_index,
        semantic_dedup,
    )

    emb = engine.read("embeddings")
    kept = semantic_dedup(emb, n_clusters=16, threshold=0.4)
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    # brute-force expected drop set from the same deterministic cells
    cells, _ = ivf_index(emb, n_centroids=16)
    a = cells.select(
        F.col("__cell"), F.col("vec_id").alias("a_id"),
        _as_double(F.col("embedding")).alias("a_v"),
    )
    b = cells.select(
        F.col("__cell"), F.col("vec_id").alias("b_id"),
        _as_double(F.col("embedding")).alias("b_v"),
    )
    drops = {
        r.b_id
        for r in a.join(b, "__cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.round(cosine(F.col("a_v"), F.col("b_v")), 6) >= 0.4)
        .select("b_id").distinct().collect()
    }
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    assert kept_ids == all_ids - drops
    assert drops, "fixture should contain semantic near-dups"


def test_semantic_dedup_deterministic_and_keeps_cell(engine):
    from etl_cli_spark.operators.similarity import semantic_dedup

    emb = engine.read("embeddings")
    k1 = semantic_dedup(emb, n_clusters=8, threshold=0.4)
    k2 = semantic_dedup(emb, n_clusters=8, threshold=0.4)
    assert sorted(r.vec_id for r in k1.collect()) == sorted(
        r.vec_id for r in k2.collect()
    )
    assert "__cell" in k1.columns
    # impossible threshold keeps everything
    assert semantic_dedup(emb, n_clusters=8, threshold=1.1).count() == emb.count()


# -- product quantization (round-5) -------------------------------------------


def test_pq_encode_shapes_and_determinism(emb):
    from etl_cli_spark.operators.similarity import pq_encode, pq_train

    books = pq_train(emb, m=8, nbits=4, iters=4)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    enc = pq_encode(emb, books)
    rows = enc.select("vec_id", "pq_code").orderBy("vec_id").limit(5).collect()
    assert all(len(r.pq_code) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r.pq_code)
    again = pq_encode(emb, books).select("vec_id", "pq_code").orderBy("vec_id").limit(5).collect()
    assert [r.pq_code for r in rows] == [r.pq_code for r in again]


def test_pq_rescored_recall_vs_exact(emb):
    """ADC shortlist + exact rescore recovers most of the true top-10 —
    and the rescored scores are EXACT cosine, so every returned hit that
    is in the true top-10 carries the true score."""
    from etl_cli_spark.operators.similarity import (
        cosine_topk,
        pq_topk_rescored,
        pq_train,
    )

    q = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    exact = {r.vec_id: r.score for r in cosine_topk(emb, q, k=10, exclude_ids=[0]).collect()}
    books = pq_train(emb, m=8, nbits=4, iters=4)
    got = {r.vec_id: r.score for r in
           pq_topk_rescored(emb, books, q, k=10, shortlist=100, exclude_ids=[0]).collect()}
    hits = set(exact) & set(got)
    assert len(hits) >= 6  # worst-case synthetic embeddings
    for v in hits:
        assert got[v] == exact[v]


def test_pq_scoring_is_jvm_side_on_encoded_frame(emb, tmp_path):
    """The persisted-index shape: once codes are materialized, the ADC
    query path is pure JVM (LUT literals + element_at) — no Python
    worker in the plan, and the scan reads only (id, code)."""
    from etl_cli_spark.operators.similarity import pq_encode, pq_topk, pq_train

    books = pq_train(emb, m=8, nbits=4, iters=4)
    path = str(tmp_path / "pq.parquet")
    pq_encode(emb, books).select("vec_id", "pq_code").write.parquet(path)
    codes = emb.sparkSession.read.parquet(path)
    q = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    top = pq_topk(codes, books, q, k=5, code_col="pq_code")
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "PythonUDF" not in plan
    assert "TakeOrderedAndProject" in plan
    assert top.count() == 5


def test_pq_rejects_bad_dims(emb):
    import pytest as _pt

    from etl_cli_spark.operators.similarity import pq_topk, pq_train

    with _pt.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7)
    books = pq_train(emb, m=8, nbits=2, iters=2)
    with _pt.raises(ValueError, match="query dim"):
        pq_topk(emb, books, [0.0] * 10, k=3)


def test_ivfpq_index_probe_prunes_and_recalls(spark, emb, tmp_path):
    """The composed index (FAISS IVFPQ layout, non-residual variant):
    the probe must partition-prune to the probed cells, shortlist in
    the compressed domain JVM-side, and its rescored top-k should
    recover most of the exact top-k."""
    from etl_cli_spark.operators.similarity import (
        build_ivfpq_index,
        cosine_topk,
        ivfpq_topk_indexed,
    )

    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, n_centroids=8, m=8, nbits=4, pq_iters=4)
    qvec = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    got = ivfpq_topk_indexed(spark, path, qvec, k=10, n_probe=4,
                             shortlist=100, exclude_ids=[0])
    plan = got._jdf.queryExecution().executedPlan().toString()
    # partition-pruned scan of the probed cells, not a full read
    assert "PartitionFilters" in plan and "__cell" in plan
    # ADC + rescore stay JVM-side once codes are materialized
    assert "MapInPandas" not in plan and "PythonUDF" not in plan
    approx = {r.vec_id for r in got.collect()}
    exact = {r.vec_id for r in
             cosine_topk(emb, qvec, k=10, exclude_ids=[0]).collect()}
    assert len(approx) == 10
    assert len(approx & exact) >= 6


def test_ivfpq_scores_exact_for_returned_ids(spark, emb, tmp_path):
    """Whatever ids the compressed shortlist surfaces, their returned
    scores are EXACT cosines (the rescore reads the stored vectors) —
    approximation only affects membership, never the reported score."""
    from etl_cli_spark.operators.similarity import (
        build_ivfpq_index,
        cosine,
        ivfpq_topk_indexed,
    )

    path = str(tmp_path / "ivfpq_s")
    build_ivfpq_index(emb, path, n_centroids=8, m=8, nbits=4)
    qvec = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    rows = ivfpq_topk_indexed(spark, path, qvec, k=5, n_probe=8).collect()
    by_id = {r.vec_id: r.score for r in rows}
    check = (
        emb.filter(F.col("vec_id").isin(list(by_id)))
        .select("vec_id",
                F.round(cosine(F.col("embedding").cast("array<double>"),
                               F.array(*[F.lit(x) for x in qvec])), 6)
                .alias("s"))
        .collect()
    )
    for r in check:
        assert abs(by_id[r.vec_id] - r.s) < 1e-9


def test_append_to_ivfpq_index(spark, emb, tmp_path):
    """Appended vectors land in the correct cells with codes
    bit-identical to encoding under the frozen artifacts, and probes
    see them immediately."""
    import json

    from etl_cli_spark.operators.similarity import (
        _assign_cells,
        append_to_ivfpq_index,
        build_ivfpq_index,
        ivfpq_topk_indexed,
        pq_encode,
    )

    half_a = emb.filter("vec_id % 2 = 0")
    half_b = emb.filter("vec_id % 2 = 1")
    path = str(tmp_path / "ivfpq_inc")
    build_ivfpq_index(half_a, path, n_centroids=8, m=8, nbits=4)
    append_to_ivfpq_index(half_b, path)
    idx = spark.read.parquet(f"{path}/vectors")
    assert idx.count() == emb.count()
    with open(f"{path}/_ivfpq_meta.json") as f:
        meta = json.load(f)
    # frozen-artifact bit-identity for the appended rows (residual
    # indexes encode v - centroid[cell] — same artifacts, same codes)
    direct = pq_encode(
        _assign_cells(half_b, meta["centroids"], "embedding"),
        meta["codebooks"], vec_col="embedding", out_col="pq_code",
        centroids=meta["centroids"] if meta.get("residual") else None,
        cell_col="__cell",
    ).select("vec_id", F.col("__cell").cast("int").alias("cell"), "pq_code")
    stored = idx.filter("vec_id % 2 = 1").select(
        "vec_id", F.col("__cell").cast("int").alias("cell"), "pq_code"
    )
    a = {r.vec_id: (r.cell, list(r.pq_code)) for r in direct.collect()}
    b = {r.vec_id: (r.cell, list(r.pq_code)) for r in stored.collect()}
    assert a == b
    # a probe for an appended (odd) vector finds it as its own top hit
    q = [float(x) for x in emb.filter("vec_id = 1").first().embedding]
    top = ivfpq_topk_indexed(spark, path, q, k=3, n_probe=8).collect()
    assert top[0].vec_id == 1 and top[0].score == 1.0


def test_ann_recall_floors_at_documented_operating_points(spark):
    """Regression gates for the ANN_EVAL.md production operating
    points (round-7, VERDICT r6 item 4): the measured recall@10 curves
    become pytest floors, so an index regression fails CI instead of
    silently drifting a doc. Same protocol as scripts/ann_eval.py —
    sf0.1 embeddings (2,000 vectors), first-20-by-vec_id queries,
    exact cosine ground truth. Floors sit just under the committed
    measurements: lsh(16,8)=0.985, ivf(16,probe=2)=0.815,
    pq(8,4,shortlist=100)=0.670, and the round-8 RESIDUAL IVF-PQ
    points — ivfpq(probe=8,shortlist=200)=0.915 and the two cheap
    (<=5% exact-scored) operating points the round-7 verdict flagged:
    nbits=4 (probe=8,shortlist=100)=0.845 and nbits=8
    (probe=8,shortlist=100)=0.920."""
    import os
    import tempfile

    from etl_cli_spark.operators.similarity import (
        ann_topk_indexed,
        build_ann_index,
        build_ivf_index,
        build_ivfpq_index,
        cosine_topk,
        ivf_topk_indexed,
        ivfpq_topk_indexed,
        pq_topk_rescored,
        pq_train,
    )

    sf = "/root/testdata/sf0.1"
    if not os.path.exists(f"{sf}/embeddings.parquet"):
        pytest.skip("sf0.1 embeddings not present")
    emb10 = spark.read.parquet(f"{sf}/embeddings.parquet")
    k = 10
    queries = [
        (int(r[0]), [float(v) for v in r[1]])
        for r in emb10.orderBy("vec_id").limit(20).collect()
    ]
    truth = {
        qid: {int(r[0]) for r in cosine_topk(emb10, q, k=k).collect()}
        for qid, q in queries
    }

    def recall(probe_fn):
        hits = 0
        for qid, q in queries:
            got = {int(r[0]) for r in probe_fn(q).collect()}
            hits += len(got & truth[qid])
        return hits / (k * len(queries))

    tmp = tempfile.mkdtemp(prefix="ann_gate_")

    build_ann_index(emb10, f"{tmp}/lsh", n_planes=16, bands=8)
    r = recall(lambda q: ann_topk_indexed(spark, f"{tmp}/lsh", q, k=k))
    assert r >= 0.95, f"lsh(16 planes, 8 bands) recall@10 regressed: {r:.3f}"

    build_ivf_index(emb10, f"{tmp}/ivf", n_centroids=16)
    r = recall(lambda q: ivf_topk_indexed(spark, f"{tmp}/ivf", q, k=k, n_probe=2))
    assert r >= 0.80, f"ivf(16 centroids, n_probe=2) recall@10 regressed: {r:.3f}"

    books = pq_train(emb10, m=8, nbits=4)
    r = recall(lambda q: pq_topk_rescored(emb10, books, q, k=k, shortlist=100))
    assert r >= 0.62, f"pq(m=8, nbits=4, shortlist=100) recall@10 regressed: {r:.3f}"

    # residual IVF-PQ (the round-8 default layout)
    build_ivfpq_index(emb10, f"{tmp}/ivfpq", n_centroids=16, m=8, nbits=4)
    r = recall(
        lambda q: ivfpq_topk_indexed(
            spark, f"{tmp}/ivfpq", q, k=k, n_probe=8, shortlist=200
        )
    )
    assert r >= 0.88, f"ivfpq(n_probe=8, shortlist=200) recall@10 regressed: {r:.3f}"
    # the cheap operating point the round-7 verdict flagged: >=0.8
    # recall at <=5% exact-scored (shortlist 100 of 2,000). n_probe
    # widens only the byte-sized CODE scan, not the exact-rescore set
    r = recall(
        lambda q: ivfpq_topk_indexed(
            spark, f"{tmp}/ivfpq", q, k=k, n_probe=8, shortlist=100
        )
    )
    assert r >= 0.80, f"ivfpq(n_probe=8, shortlist=100) recall@10 regressed: {r:.3f}"

    # nbits=8 residual (FAISS's default code width): 1-byte codes,
    # recall at the same <=5% budget
    build_ivfpq_index(emb10, f"{tmp}/ivfpq8", n_centroids=16, m=8, nbits=8)
    r = recall(
        lambda q: ivfpq_topk_indexed(
            spark, f"{tmp}/ivfpq8", q, k=k, n_probe=8, shortlist=100
        )
    )
    assert r >= 0.85, f"ivfpq8(n_probe=8, shortlist=100) recall@10 regressed: {r:.3f}"

    # round-9 DEFAULT operating point (nbits=8 build, scale-aware probe:
    # n_probe=16//4=4, shortlist=max(100, 1% of 2000)=100) — measured
    # 0.865 at sf0.1 and 0.870 at the harder sf1 clone-excluded tier;
    # floor just under
    build_ivfpq_index(emb10, f"{tmp}/ivfpq_def", n_centroids=16)
    r = recall(lambda q: ivfpq_topk_indexed(spark, f"{tmp}/ivfpq_def", q, k=k))
    assert r >= 0.82, f"all-defaults ivfpq recall@10 regressed: {r:.3f}"


def test_ivfpq_default_operating_point_pins(spark, emb, tmp_path):
    """The round-9 evidence-based defaults are pinned: builds write
    nbits=8 residual codes plus the n_vectors stat, and probe defaults
    resolve to n_probe=n_centroids/4, shortlist=max(100, 1% of
    n_vectors) — explicit values always win."""
    import json
    import os

    from etl_cli_spark.operators.similarity import (
        _IVFPQ_META,
        _resolve_ivfpq_defaults,
        build_ivfpq_index,
    )

    path = str(tmp_path / "idx")
    build_ivfpq_index(emb, path, n_centroids=8)
    meta = json.load(open(os.path.join(path, _IVFPQ_META)))
    assert meta["nbits"] == 8 and meta["residual"] is True
    assert meta["n_vectors"] == emb.count()
    assert _resolve_ivfpq_defaults(meta, None, None) == (2, 100)
    big = dict(meta, n_centroids=1024, n_vectors=1_000_000)
    assert _resolve_ivfpq_defaults(big, None, None) == (256, 10_000)
    assert _resolve_ivfpq_defaults(big, 7, 33) == (7, 33)
    legacy = {k: v for k, v in meta.items() if k != "n_vectors"}
    assert _resolve_ivfpq_defaults(legacy, None, None) == (2, 100)
    # the sf5 tier (100k vectors, 128 cells, clone-excluded; ANN_EVAL
    # round 10) re-confirmed both rules across two orders of magnitude:
    # the resolved point (32, 1000) measured recall@10 = 0.950 there —
    # identical to sf1's 0.950 at the same 1% budget — and n_probe=64
    # bought nothing over 32 (0.350 == 0.350 at shortlist=100)
    sf5 = dict(meta, n_centroids=128, n_vectors=100_000)
    assert _resolve_ivfpq_defaults(sf5, None, None) == (32, 1000)


def test_ivfpq_probe_plan_partition_prunes(spark, emb, tmp_path):
    """The residual probe's scale contract, plan-asserted: BOTH scans
    (the code scan feeding the ADC shortlist and the vector scan
    feeding the rescore) carry PartitionFilters on __cell — the read
    is n_probe cells, never the corpus — and the one-row LUT broadcast
    join is a BroadcastNestedLoopJoin, never a CartesianProduct."""
    from etl_cli_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_topk_indexed,
    )

    path = str(tmp_path / "ivfpq_plan")
    build_ivfpq_index(emb, path, n_centroids=8, m=8, nbits=4)
    q = [float(x) for x in emb.first().embedding]
    # small LUT payload (2 cells x 16 codes x 8 subspaces = 256): the
    # adaptive shipper inlines plan literals — no join at all
    df = ivfpq_topk_indexed(spark, path, q, k=5, n_probe=2, shortlist=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert len(pf) >= 2, f"expected 2 pruned scans, got: {pf}"
    assert all("__cell" in ln and " IN (" in ln for ln in pf), pf
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # literals, no join
    # big LUT payload (8 x 16 x 8 = 1024+ crosses the threshold): the
    # one-row broadcast frame joins via BNLJ — still no cartesian, and
    # pruning still reaches both scans
    df = ivfpq_topk_indexed(spark, path, q, k=5, n_probe=8, shortlist=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert len(pf) >= 2 and all("__cell" in ln for ln in pf), pf
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row LUT frame


def test_parquet_dir_num_rows_fallback_contract(tmp_path):
    """r9 advice: the footer counter must return None (not 0) when no
    parquet file exists, and None on corrupt footers (pyarrow raises
    ArrowInvalid, not OSError) — so the caller's count-job fallback
    runs instead of persisting n_vectors=0 and flooring the
    scale-aware shortlist."""
    from etl_cli_spark.operators.similarity import _parquet_dir_num_rows

    # empty / nonexistent dir -> None
    assert _parquet_dir_num_rows(str(tmp_path / "nope")) is None
    (tmp_path / "empty").mkdir()
    assert _parquet_dir_num_rows(str(tmp_path / "empty")) is None

    # real footers -> summed rows (hive-partitioned layout)
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "vectors" / "p=1"
    d.mkdir(parents=True)
    pq.write_table(pa.table({"x": [1, 2, 3]}), str(d / "a.parquet"))
    pq.write_table(pa.table({"x": [4]}), str(d / "b.parquet"))
    assert _parquet_dir_num_rows(str(tmp_path / "vectors")) == 4

    # corrupt footer -> None (caller falls back), never an exception
    (d / "c.parquet").write_bytes(b"not a parquet file")
    assert _parquet_dir_num_rows(str(tmp_path / "vectors")) is None


def test_kmeans_refine_matches_driver_protocol_bitwise(spark):
    """kmeans_refine is the _kmeans_lite protocol at corpus scale: when
    the corpus fits the driver sample, the distributed refinement must
    reproduce the driver trainer BIT-FOR-BIT — same init (lowest-id
    rows), same rounded-distance argmin with lowest-cell tie-break,
    same 9 dp centroid rounding, same empty-cell carry-forward. Values
    are dyadic (i/8) so means are exact in binary and the comparison
    is free of round-boundary luck."""
    from etl_cli_spark.operators.similarity import (
        _assign_cells,
        _kmeans_lite,
        kmeans_refine,
    )

    rows = [
        (i, [((i * 7 + d * 3) % 16) / 8.0 for d in range(6)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cent_lite = _kmeans_lite([v for _, v in rows], 5, iters=3)
    cells, cent = kmeans_refine(df, n_centroids=5, iters=3)

    assert [[round(float(x), 9) for x in c] for c in cent_lite] == cent

    got = {r["vec_id"]: r["__cell"] for r in cells.collect()}
    want = {
        r["vec_id"]: r["__cell"]
        for r in _assign_cells(df, cent_lite, "embedding").collect()
    }
    assert got == want and len(got) == 40


def test_kmeans_refine_empty_cell_keeps_previous_centroid(spark):
    """With k larger than the number of distinct point locations, some
    cells win no members; their centroids must carry forward (and stay
    9 dp-rounded) instead of going NaN/zero — _kmeans_lite semantics."""
    from etl_cli_spark.operators.similarity import _kmeans_lite, kmeans_refine

    # two tight clusters, k=4: at most 2 cells ever win members
    rows = [(i, [0.0, 0.0] if i % 2 == 0 else [8.0, 8.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cells, cent = kmeans_refine(df, n_centroids=4, iters=2)
    lite = _kmeans_lite([v for _, v in rows], 4, iters=2)
    assert [[round(float(x), 9) for x in c] for c in lite] == cent
    assert all(all(v == v for v in c) for c in cent)  # no NaN
    assert cells.count() == 12
    # the exact (fixed-order compensated) mean shares the carry-forward
    # path: on dyadic values its centroids are bit-equal to the default
    _, cent_x = kmeans_refine(df, n_centroids=4, iters=2, mean_strategy="exact")
    assert cent_x == cent


def test_semantic_dedup_arrow_pairs_bitwise_equals_column(spark):
    """pair_strategy='arrow' (per-cell index-order outer-product kernel
    + Spark-side round-6 filter) must produce the EXACT kept set of the
    column zip_with arm — including near-threshold pairs, which is why
    the kernel emits raw dots and leaves the HALF_UP rounding to Spark."""
    from etl_cli_spark.operators.similarity import semantic_dedup

    # clusters of near-duplicates plus loners; threshold crossings on
    # both sides ensure the margin pre-filter is actually exercised
    rows = []
    for i in range(60):
        g = i % 5
        base_v = [((g * 13 + d * 7) % 32) / 8.0 + 1.0 for d in range(8)]
        v = [x + ((i * 31 + d) % 7) * 0.01 for d, x in enumerate(base_v)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for thr in (0.9995, 0.97):
        kept_c = semantic_dedup(df, n_clusters=4, threshold=thr)
        kept_a = semantic_dedup(df, n_clusters=4, threshold=thr, pair_strategy="arrow")
        got_c = sorted((r["vec_id"], r["__cell"]) for r in kept_c.collect())
        got_a = sorted((r["vec_id"], r["__cell"]) for r in kept_a.collect())
        assert got_c == got_a and 0 < len(got_a) < 60

    import pytest

    with pytest.raises(ValueError, match="pair_strategy"):
        semantic_dedup(df, n_clusters=4, pair_strategy="gpu")


def test_semantic_dedup_auto_routes_mega_cells_same_kept_set(spark):
    """pair_strategy='auto' (round-12 default): cells above
    max_arrow_cell_rows stream through the column self-join, the rest
    take the arrow kernel. The arms are bit-identical, so ANY split
    point must produce the same kept set as pure-arrow and pure-column
    — including a threshold that forces a real split."""
    from etl_cli_spark.operators.similarity import semantic_dedup

    rows = []
    for i in range(60):
        g = i % 5
        base_v = [((g * 13 + d * 7) % 32) / 8.0 + 1.0 for d in range(8)]
        v = [x + ((i * 31 + d) % 7) * 0.01 for d, x in enumerate(base_v)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def kept(**kw):
        out = semantic_dedup(df, n_clusters=4, threshold=0.97, **kw)
        return sorted((r["vec_id"], r["__cell"]) for r in out.collect())

    pure_a = kept(pair_strategy="arrow")
    pure_c = kept(pair_strategy="column")
    # max_arrow_cell_rows=1 forces EVERY cell through the column arm;
    # a mid value (60 rows over 4 cells -> ~15/cell) forces a mixed split
    assert kept(pair_strategy="auto", max_arrow_cell_rows=1) == pure_a == pure_c
    assert kept(pair_strategy="auto", max_arrow_cell_rows=14) == pure_a
    assert kept(pair_strategy="auto") == pure_a  # no big cells: pure arrow
    assert 0 < len(pure_a) < 60


def test_auto_sentinel_is_a_flag_not_a_null_id(spark):
    """Round-13 advice fix: 'refused cell' is marked by a dedicated
    ``__is_cell`` flag, not by a null ``__b_id`` — so null values in
    ``id_col`` can no longer masquerade as sentinels (which misrouted
    a dot product as a cell id and dropped the real near-dup pair)."""
    from pyspark.sql import functions as F

    from etl_cli_spark.operators.similarity import (
        _as_double,
        _cell_pair_candidates,
        norm,
    )

    # one cell, 3 rows, one with a NULL id; all vectors near-identical
    rows = [(0, [1.0, 1.0]), (None, [1.0, 1.0001]), (7, [1.0, 0.9999])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = (
        df.select(
            F.lit(3).alias("__cell"),
            F.col("vec_id").alias("__id"),
            _as_double(F.col("embedding")).alias("__v"),
        )
        .withColumn("__n", norm(F.col("__v")))
        .select("__cell", "__id", F.transform("__v", lambda x: x / F.col("__n")).alias("__u"))
    )
    got = _cell_pair_candidates(base, 0.9).collect()
    # genuine pair rows may carry a null b-side id, but never the flag
    assert all(r["__is_cell"] is False for r in got)
    assert any(r["__b_id"] is None for r in got)  # the null-id pair survives
    # with the guard active and a 1-row cap, the SAME cell becomes a
    # sentinel: flag true, cell id in the dot slot, regardless of nulls
    sent = _cell_pair_candidates(base, 0.9, big_cell_rows=2).collect()
    assert [(r["__b_id"], r["__dot"], r["__is_cell"]) for r in sent] == [
        (None, 3.0, True)
    ]


def test_semantic_dedup_arrow_equals_column_on_duplicate_ids(spark):
    """r11 advice: a duplicated id_col value used to self-compare in
    the arrow kernel (two distinct rows, same id, dot ~1.0 -> the id
    dropped itself) while the column arm's __a_id < __b_id never
    compares equal ids. The kernel now excludes equal-id pairs, so the
    kept sets must match even on non-unique keys."""
    from etl_cli_spark.operators.similarity import semantic_dedup

    rows = []
    for i in range(24):
        g = i // 2  # every id value appears TWICE ...
        v = [((g % 6) * 11 + d * 3) % 17 / 4.0 + 1.0 for d in range(6)]
        # ... on two NEAR-IDENTICAL rows (cosine ~1.0 > any threshold),
        # so the self-pair qualifies and the old kernel dropped the id;
        # ids g and g+6 share a base vector -> real cross-id near-dups
        v = [x + (i % 2) * 0.001 * (d + 1) for d, x in enumerate(v)]
        rows.append((g, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for thr in (0.9995, 0.95):
        kept_c = semantic_dedup(df, n_clusters=2, threshold=thr)
        kept_a = semantic_dedup(df, n_clusters=2, threshold=thr, pair_strategy="arrow")
        got_c = sorted((r["vec_id"], r["__cell"]) for r in kept_c.collect())
        got_a = sorted((r["vec_id"], r["__cell"]) for r in kept_a.collect())
        assert got_c == got_a and len(got_a) > 0


def test_cell_pair_kernel_multiblock_equals_single_block(spark):
    """The arrow kernel row-blocks hot cells; the strict-upper-triangle
    mask uses GLOBAL indices (cols > rows + s) — force tiny blocks and
    prove the emitted candidate multiset is exactly the single-block
    one (same pairs, same raw dots), so no pair is dropped or doubled
    at a block seam."""
    from pyspark.sql import functions as F

    from etl_cli_spark.operators.similarity import (
        _as_double,
        _cell_pair_candidates,
        norm,
    )

    rows = [(i, i % 3, [((i * 7 + d) % 5) / 2.0 + 0.5 for d in range(4)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, cell int, embedding array<double>")
    base = (
        df.select(
            F.col("cell").alias("__cell"),
            F.col("vec_id").alias("__id"),
            _as_double(F.col("embedding")).alias("__v"),
        )
        .withColumn("__n", norm(F.col("__v")))
        .select("__cell", "__id", F.transform("__v", lambda x: x / F.col("__n")).alias("__u"))
    )
    # margin low enough that MANY pairs qualify (stress the seam logic)
    def pairs(**kw):
        out = _cell_pair_candidates(base, 0.5, **kw)
        assert out.columns == ["__b_id", "__dot", "__is_cell"]
        return sorted((r["__b_id"], r["__dot"], r["__is_cell"]) for r in out.collect())

    one = pairs()
    # block_bytes=96 -> blk = (96//2) // (n*8) = 1 row per block at n=10
    # (half the budget per buffer: accumulator + outer-product scratch)
    multi = pairs(block_bytes=96)
    assert one == multi and len(one) > 20
    assert not any(flag for _, _, flag in one)  # no guard -> no sentinels


def test_kmeans_refine_long_mean_bitwise_equals_wide(spark):
    """The long-format mean (posexplode → groupBy(__cell,__pos).avg) is
    the production-width plan (dim > codegen maxFields); it must be
    bit-identical to the wide plan AND to _kmeans_lite on dyadic values
    (means exact in binary — no round-boundary luck)."""
    from etl_cli_spark.operators.similarity import _kmeans_lite, kmeans_refine

    rows = [
        (i, [((i * 7 + d * 3) % 16) / 8.0 for d in range(6)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lite = _kmeans_lite([v for _, v in rows], 5, iters=3)
    cells_w, cent_w = kmeans_refine(df, n_centroids=5, iters=3, mean_strategy="wide")
    cells_l, cent_l = kmeans_refine(df, n_centroids=5, iters=3, mean_strategy="long")
    assert cent_w == cent_l == [[round(float(x), 9) for x in c] for c in lite]
    got_w = {r["vec_id"]: r["__cell"] for r in cells_w.collect()}
    got_l = {r["vec_id"]: r["__cell"] for r in cells_l.collect()}
    assert got_w == got_l and len(got_l) == 40


def test_kmeans_refine_auto_routes_wide_dims_to_long(spark):
    """auto = wide only while the per-dim aggregate stays inside
    whole-stage codegen (dim <= 96); past it the long plan runs and the
    result still matches _kmeans_lite bitwise (dyadic values)."""
    from etl_cli_spark.operators.similarity import _kmeans_lite, kmeans_refine

    dim = 120  # > 96: auto must take the long path
    rows = [
        (i, [((i * 11 + d * 5) % 8) / 4.0 for d in range(dim)])
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lite = _kmeans_lite([v for _, v in rows], 4, iters=2)
    cells, cent = kmeans_refine(df, n_centroids=4, iters=2)  # auto
    assert cent == [[round(float(x), 9) for x in c] for c in lite]
    assert cells.count() == 24
    import pytest

    with pytest.raises(ValueError, match="mean_strategy"):
        kmeans_refine(df, n_centroids=4, iters=1, mean_strategy="bogus")


def test_kmeans_refine_exact_mean_is_order_independent(spark):
    """VERDICT r11 next-round #5: manufacture a cell whose mean is
    order-SENSITIVE under naive summation (catastrophic cancellation:
    [1e16, 1, 1, -1e16] sums to 0 left-to-right — both 1s vanish into
    1e16's ulp — but to 2 when the small values add first), show the
    DEFAULT mean strategy CAN disagree with itself across physical row
    orders, and show mean_strategy='exact' (fixed id-order Neumaier
    fold) cannot: bit-identical across orders and partitionings, equal
    to the Python fixed-order compensated replay."""
    from etl_cli_spark.operators.similarity import kmeans_refine

    # one cell (n_centroids=1), dim=1; init = lowest-id vector
    rows = [(0, [1e16]), (1, [1.0]), (2, [1.0]), (3, [-1e16])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    asc = df.orderBy("vec_id").coalesce(1)          # fold order 1e16,1,1,-1e16
    perm = df.orderBy((F.col("vec_id") + 2) % 4).coalesce(1)  # 1,1,-1e16(?),...

    # default (wide at dim=1): left-to-right fold order = physical row
    # order, so the two orders produce DIFFERENT centroids
    _, cent_a = kmeans_refine(asc, n_centroids=1, iters=1, mean_strategy="wide")
    _, cent_p = kmeans_refine(perm, n_centroids=1, iters=1, mean_strategy="wide")
    assert cent_a != cent_p, "fixture no longer exercises order sensitivity"

    # exact: fixed id-order Neumaier — identical bits regardless of
    # physical order or partitioning
    outs = []
    for frame in (asc, perm, df.repartition(3)):
        _, cent = kmeans_refine(frame, n_centroids=1, iters=1, mean_strategy="exact")
        outs.append(cent)
    assert outs[0] == outs[1] == outs[2]

    # Python replay of the same fixed-order compensated fold (with the
    # shared floor quantizer the exact arm uses — see _quantize)
    from etl_cli_spark.operators.similarity import _quantize

    vals = [1e16, 1.0, 1.0, -1e16]  # id order
    s = c = 0.0
    for v in vals:
        t = s + v
        c += (s - t) + v if abs(s) >= abs(v) else (v - t) + s
        s = t
    assert outs[0] == [[_quantize((s + c) / len(vals), 1e9)]] == [[0.5]]


def test_quantize_is_one_shared_rule_not_two_round_impls():
    """Round-13 advice fix: Python round(x, 9) (half-even on the
    decimal value) and DuckDB round(x, 9) (multiply-based half-away)
    diverge on real doubles — 0.7645514175 is the advisor's reproduced
    case. The exact arm's _quantize is floor(x*1e9 + 0.5)/1e9: three
    bit-specified IEEE primitives, so DuckDB's replay of the SAME
    expression is bit-identical by construction."""
    import duckdb

    from etl_cli_spark.operators.similarity import _quantize

    cases = [0.7645514175, -0.7645514175, 0.5, -0.5, 1e16 / 4, 0.0,
             0.1234567894999999, 8.0, 1.0000000005]
    got = [_quantize(v, 1e9) for v in cases]
    rows = duckdb.sql(
        "SELECT floor(v * 1000000000.0 + 0.5) / 1000000000.0 FROM ("
        + " UNION ALL ".join(f"SELECT CAST({v!r} AS DOUBLE) AS v" for v in cases)
        + ")"
    ).fetchall()
    # exact bit equality against DuckDB's evaluation of the shared rule
    assert [r[0] for r in rows] == got
    # the motivating divergence: the two engines' round() builtins
    # disagree on this value, so 'use round in both' was never bit-exact
    duck_round = duckdb.sql(
        "SELECT round(CAST(0.7645514175 AS DOUBLE), 9)"
    ).fetchone()[0]
    assert duck_round != round(0.7645514175, 9)
    # idempotence: re-quantizing a quantized value is a no-op (the
    # carry-forward empty-cell path re-quantizes previous centroids)
    assert all(_quantize(g, 1e9) == g for g in got)


def test_semantic_dedup_refined_cells_keep_independent_set(spark):
    """semantic_dedup(refine_iters=N) swaps the cell placement to the
    full-corpus kmeans_refine; the kept set must still be a
    within-cluster independent set under the threshold, and the
    refined cells must equal kmeans_refine's own assignment."""
    from etl_cli_spark.operators.similarity import (
        cosine,
        kmeans_refine,
        semantic_dedup,
    )

    rows = [
        (i, [((i * 5 + d * 7) % 12) / 8.0 + (i % 3) for d in range(4)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup(df, n_clusters=4, threshold=0.98, refine_iters=3)

    cells_ref, _ = kmeans_refine(df, n_centroids=4, iters=3)
    want = {r["vec_id"]: r["__cell"] for r in cells_ref.collect()}
    got = {r["vec_id"]: r["__cell"] for r in kept.collect()}
    assert all(want[i] == c for i, c in got.items())

    # no kept pair within a cell at/above the threshold
    a = kept.selectExpr("vec_id AS a_id", "embedding AS av", "__cell")
    b = kept.selectExpr("vec_id AS b_id", "embedding AS bv", "__cell")
    from pyspark.sql import functions as F
    viol = (
        a.join(b, on="__cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.round(cosine(F.col("av"), F.col("bv")), 6) >= 0.98)
        .count()
    )
    assert viol == 0
    assert 0 < kept.count() <= 30


def test_semantic_cross_dedup_drops_index_matches_only(spark):
    """Cross-corpus dedup: left rows with a >= threshold cosine against
    ANY index row drop; everything else survives with its original
    columns. Exact copies of index vectors must always drop (cosine
    1.0 lands in the original's own cell)."""
    from pyspark.sql import functions as F

    from etl_cli_spark.operators.similarity import semantic_cross_dedup

    # index: 3 well-separated directions x repeats
    base = {0: [10.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0], 2: [0.0, 0.0, 10.0]}
    idx_rows = [(i, [x + (i % 3) * 0.001 for x in base[i % 3]]) for i in range(30)]
    index = spark.createDataFrame(idx_rows, "vec_id long, embedding array<double>")
    left_rows = [
        (100, [10.0, 0.0, 0.0]),   # exact member direction -> drop
        (101, [0.0, 9.5, 0.1]),    # near the y cluster -> drop
        (102, [5.0, 5.0, 5.0]),    # diagonal, far from all -> survive
        (103, [-10.0, 0.0, 0.0]),  # opposite direction -> survive
    ]
    left = spark.createDataFrame(left_rows, "vec_id long, embedding array<double>")
    kept = sorted(
        r.vec_id
        for r in semantic_cross_dedup(left, index, n_clusters=3, threshold=0.97).collect()
    )
    assert kept == [102, 103]
    # determinism across partitionings (content-derived cells + round-6)
    kept2 = sorted(
        r.vec_id
        for r in semantic_cross_dedup(
            left.repartition(5), index.repartition(3), n_clusters=3, threshold=0.97
        ).collect()
    )
    assert kept2 == kept
