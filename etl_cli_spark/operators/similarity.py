"""Similarity search over embedding columns (array<float>).

Two tiers (BASELINE.json north star):

- brute-force cosine top-k: exact baseline. Dot products are pure
  Column expressions (``zip_with`` + ``aggregate`` — JVM-side fold, no
  Python), so a single scan scores the corpus; ``TakeOrderedAndProject``
  handles the top-k without a global sort.
- LSH-bucketed ANN (random hyperplanes): the 100 TB path. Signatures
  are sign-bits of dot products with deterministic pseudo-random
  hyperplanes; same-bucket candidates get exact re-ranking. Probing
  multiple band permutations trades recall for candidate volume.

Embedding near-dup (cosine >= threshold pairs) reuses the same buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Index-order left fold — deterministic, engine-portable."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector.

    One scan + TakeOrderedAndProject; ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(_as_double(F.col(vec_col)), q), 6).alias("score"),
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(exclude_ids))
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (no numpy needed at
    the executor — generated once on the driver, inlined as literals)."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / s for x in v])
    return planes


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: one bit per hyperplane, packed into a long."""
    bits = []
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(x) for x in p])
        bits.append(
            F.when(dot(vec, pc) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    sig = F.lit(0).cast("long")
    for b in bits:
        sig = sig.bitwiseOR(b)
    return sig


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only candidates sharing >= 1 LSH band with the
    query get exact scoring. At scale this prunes the scan to a few
    buckets (predicate on the precomputable signature column)."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    width = n_planes // bands
    mask = (1 << width) - 1

    vec_d = _as_double(F.col(vec_col))
    with_sig = df.withColumn("__sig", lsh_signature(vec_d, planes))

    # query signature computed driver-side with the same planes
    def _dot(p):  # python-side: tiny, driver-only
        return sum(a * b for a, b in zip(p, query_vec))

    qsig = 0
    for i, p in enumerate(planes):
        if _dot(p) >= 0:
            qsig |= 1 << i
    band_match = None
    for b in range(bands):
        qband = (qsig >> (b * width)) & mask
        term = F.shiftright("__sig", b * width).bitwiseAND(F.lit(mask)) == qband
        band_match = term if band_match is None else (band_match | term)

    cand = with_sig.filter(band_match)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(F.col(id_col), F.round(cosine(vec_d, q), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Cosine >= threshold pairs via banded hyperplane-LSH buckets.

    Same shape as minhash_lsh_pairs: explode bands -> bucket equi-join
    -> exact cosine verify on candidates only.
    """
    dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    width = n_planes // bands
    mask = (1 << width) - 1
    vec_d = _as_double(F.col(vec_col))
    base = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("__sig", lsh_signature(_as_double(F.col("v")), planes))
        .select(
            "id",
            "v",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright("__sig", b * width).bitwiseAND(F.lit(mask)).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("p"),
        )
        .select("id", "v", "p.band", "p.bucket")
    )
    l = base.select(F.col("id").alias("a_id"), F.col("v").alias("a_v"), "band", "bucket")
    r = base.select(F.col("id").alias("b_id"), F.col("v").alias("b_v"), "band", "bucket")
    return (
        l.join(r, on=["band", "bucket"], how="inner")
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .withColumn("cosine", F.round(cosine(_as_double(F.col("a_v")), _as_double(F.col("b_v"))), 6))
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


def brute_force_all_pairs_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN graph (every row's top-k neighbors) — small-N baseline.

    This IS an O(N^2) cross join; it exists as the correctness oracle
    for ann/neardup. Guard rails: refuse above 100k rows.
    """
    n = df.count()
    if n > 100_000:
        raise ValueError(f"brute-force all-pairs on {n} rows; use embedding_neardup_pairs")
    a = df.select(F.col(id_col).alias("a_id"), _as_double(F.col(vec_col)).alias("a_v"))
    b = df.select(F.col(id_col).alias("b_id"), _as_double(F.col(vec_col)).alias("b_v"))
    pairs = a.join(b, F.col("a_id") != F.col("b_id"))
    scored = pairs.select("a_id", "b_id", F.round(cosine(F.col("a_v"), F.col("b_v")), 6).alias("score"))
    w = Window.partitionBy("a_id").orderBy(F.col("score").desc(), F.col("b_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
