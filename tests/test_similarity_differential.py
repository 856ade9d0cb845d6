"""Randomized cross-engine differential for the BIT-EXACT k-means arm.

``kmeans_refine(mean_strategy='exact')`` claims bit-exact cross-engine
agreement BY CONSTRUCTION (fixed-id-order Neumaier folds, shared floor
quantizers, sequential distance accumulation) — a claim that must hold
on ANY input, not just the fixture the gate replays. This test runs
the real ``kmeans_refine_exact`` query and its real DuckDB twin over
seeded random embeddings (float32-truncated like the fixture), with
the r12 advisor's exact round()-divergence value 0.7645514175 planted
in several components — the value on which Python round and DuckDB
round demonstrably disagree, i.e. the adversarial input the old
implementation could mis-hash on.

The default (probabilistic, 9-dp-absorbed) arm is deliberately NOT
fuzzed here: its cross-engine agreement is only probable, and a
boundary-straddle flake would be noise, not signal.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import duckdb
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import __spark_entry__ as entry
from check_oracle import frame_hash

DIM = 64  # the oracle CTE's hardcoded width


def _random_embeddings(n: int = 120, seed: int = 20260816):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        v = [rng.uniform(-1.0, 1.0) for _ in range(DIM)]
        if i % 9 == 0:
            # plant the advisor's round-divergence value (and scaled
            # variants) — float32 truncation happens below, exactly as
            # the parquet fixture stores vectors
            v[i % DIM] = 0.7645514175
            v[(i + 7) % DIM] = -0.7645514175
        rows.append((i, np.asarray(v, dtype=np.float32).tolist(), i % 4))
    return rows


@pytest.fixture(scope="module")
def scratch_emb(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("simdiff")
    spark.createDataFrame(
        _random_embeddings(),
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(str(tmp / "embeddings.parquet"))
    return str(tmp)


def test_kmeans_exact_arm_is_bit_exact_on_random_vectors(spark, scratch_emb):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{scratch_emb}/embeddings.parquet/*.parquet'"
    )
    sdf = entry.queries()["kmeans_refine_exact"](spark, scratch_emb)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.sql(entry.oracle_sql()["kmeans_refine_exact"])
    orows = res.fetchall()
    assert len(srows) == len(orows) == 120
    assert frame_hash(sdf.columns, srows) == frame_hash(res.columns, orows), (
        "the bit-exact arm diverged cross-engine on random vectors"
    )
    # the clustering must be non-degenerate (>1 cell wins members),
    # or the differential proves nothing about assignment arithmetic
    assert len({cid for _, cid in srows}) > 1
