from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cli_spark.operators.bpe import (
    _apply_merge,
    bpe_encode,
    bpe_train,
    bpe_word_pieces,
)


@pytest.fixture(scope="module")
def docs(engine):
    return engine.read("documents")


def test_merge_fold_left_to_right_non_overlapping(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a", "b"],), (["a", "b", "a", "b"],), (["x"],), ([],)],
        "syms array<string>",
    )
    got = [r.m for r in df.select(_apply_merge(F.col("syms"), "a", "a").alias("m")).collect()]
    assert got[0] == ["aa", "a", "b"]  # aaa -> (aa)(a), not overlapping
    assert got[1] == ["a", "b", "a", "b"]
    assert got[2] == ["x"] and got[3] == []
    got2 = [r.m for r in df.select(_apply_merge(F.col("syms"), "a", "b").alias("m")).collect()]
    assert got2[1] == ["ab", "ab"]


def test_train_is_deterministic_and_ranked(docs):
    m1 = bpe_train(docs, n_merges=8).collect()
    m2 = bpe_train(docs, n_merges=8).collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
    assert [r.rank for r in m1] == list(range(1, len(m1) + 1))
    # counts are non-increasing only per-symbol-pair availability, but
    # every merged symbol must be left||right
    assert all(r.merged == r.left + r.right for r in m1)


def test_train_early_stop_on_min_pair_count(docs):
    m = bpe_train(docs, n_merges=50, min_pair_count=10**9)
    assert m.count() == 0


def test_encode_reassembles_words_exactly(spark, docs):
    """Merges never cross word boundaries: concatenating a doc's pieces
    must equal concatenating its whitespace tokens."""
    merges = bpe_train(docs, n_merges=12)
    enc = bpe_encode(docs, merges)
    joined = enc.select(
        "doc_id", F.concat_ws("", "pieces").alias("glued")
    )
    ref = docs.select(
        "doc_id",
        F.concat_ws(
            "",
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != ""
            ),
        ).alias("glued"),
    )
    diff = (
        joined.alias("a")
        .join(ref.alias("b"), "doc_id")
        .filter(F.col("a.glued") != F.col("b.glued"))
        .count()
    )
    assert diff == 0


def test_encode_compresses_vs_chars(docs):
    """Each merge can only shrink or keep the token count; with real
    merges the corpus token count must drop below the char count."""
    merges = bpe_train(docs, n_merges=12)
    enc = bpe_encode(docs, merges)
    n_pieces = enc.agg(F.sum("n_tokens")).first()[0]
    n_chars = (
        docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .filter("w != ''")
        .agg(F.sum(F.length("w")))
        .first()[0]
    )
    assert n_pieces < n_chars


def test_encode_keeps_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "aa ab aa ab"), (2, ""), (3, "   ")], "doc_id int, text string"
    )
    merges = bpe_train(df, n_merges=2)
    rows = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    assert rows[2].pieces == [] and rows[2].n_tokens == 0
    assert rows[3].pieces == [] and rows[3].n_tokens == 0
    assert rows[1].n_tokens > 0


def test_encode_plan_is_jvm_side(docs):
    merges = bpe_train(docs, n_merges=4)
    enc = bpe_encode(docs, merges)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "PythonUDF" not in plan


def test_word_pieces_accepts_plain_pairs(spark):
    words = spark.createDataFrame([("abab",), ("ab",)], "word string")
    out = {r.word: r.pieces for r in bpe_word_pieces(words, [("a", "b")]).collect()}
    assert out["abab"] == ["ab", "ab"]
    assert out["ab"] == ["ab"]


def test_word_pieces_accepts_train_row_tuples(spark, docs):
    """Collected bpe_train rows (rank, left, right, merged, count) must
    apply identically to a merges DataFrame."""
    merges_df = bpe_train(docs, n_merges=4)
    rows = [tuple(r) for r in merges_df.collect()]
    words = spark.createDataFrame([("merger",), ("stream",)], "word string")
    via_df = {r.word: r.pieces for r in bpe_word_pieces(words, merges_df).collect()}
    via_rows = {r.word: r.pieces for r in bpe_word_pieces(words, rows).collect()}
    assert via_df == via_rows


def test_bpe_train_empty_corpus(spark):
    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id int, text string")
    m = bpe_train(df, n_merges=5)
    assert m.count() == 0
    enc = bpe_encode(df, m)
    assert all(r.n_tokens == 0 for r in enc.collect())


def test_batched_equals_sequential_on_corpus(docs):
    """The round-6 batched protocol (top-K collect, up to batch_k
    symbol-disjoint hazard-safe merges per fold) must be BIT-IDENTICAL
    to the classic one-merge-per-round loop on a real corpus, for any
    batch width."""
    seq = [tuple(r) for r in bpe_train(docs, n_merges=24, batch_k=1, mode="spark").collect()]
    for k in (8, 32):
        got = [tuple(r) for r in bpe_train(docs, n_merges=24, batch_k=k, mode="spark").collect()]
        assert got == seq, f"batch_k={k} diverged from sequential"


def test_batched_hazard_pair_blocks_unsafe_batching(spark):
    """Adversarial corpus where naive top-k batching is WRONG: merging
    the round-1 winner (a,b) creates the new pair (x,ab) with count 6,
    which outranks the disjoint runner-up (c,d) count 5 — the
    sequential round-2 winner is (x,ab), so (c,d) must NOT ride the
    first batch. The hazard bound (pair (x,a)=6 ends in the winner's
    left symbol) is what blocks it."""
    words = ["ab"] * 4 + ["xab"] * 6 + ["cd"] * 5
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    seq = [tuple(r) for r in bpe_train(df, n_merges=3, batch_k=1, mode="spark").collect()]
    bat = [tuple(r) for r in bpe_train(df, n_merges=3, batch_k=8, mode="spark").collect()]
    assert bat == seq
    # pin the semantics, not just self-consistency: (a,b)=10 wins round
    # 1, then the CREATED pair (x,ab)=6 beats (c,d)=5 in round 2
    assert (bat[0][1], bat[0][2], bat[0][4]) == ("a", "b", 10)
    assert (bat[1][1], bat[1][2], bat[1][4]) == ("x", "ab", 6)
    assert (bat[2][1], bat[2][2], bat[2][4]) == ("c", "d", 5)


def test_batched_disjoint_no_hazard_merges_in_order(spark):
    """Fully disjoint two-symbol words with no hazard pairs: the batch
    can take them all in one round and the ranked table still lists
    them in (count desc) sequential order with state-S counts."""
    words = ["ab"] * 100 + ["cd"] * 90 + ["ef"] * 80
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=3, batch_k=8, mode="spark").collect()]
    assert got == [
        (1, "a", "b", "ab", 100),
        (2, "c", "d", "cd", 90),
        (3, "e", "f", "ef", 80),
    ]


def test_bpe_survives_astral_and_bmp_unicode(spark):
    """Symbols are CODE POINTS: astral chars (emoji) are atomic single
    symbols, never split into surrogate halves (a regex char split
    would cut them and UTF8String turns each lone half into '?');
    encode reassembles every word exactly, emoji included."""
    df = spark.createDataFrame(
        [(1, "hello \U0001F600\U0001F600 world \U0001F600\U0001F600"),
         (2, "café naïve 你好 你好 hello world")],
        "doc_id int, text string",
    )
    merges = bpe_train(df, n_merges=6)
    enc = bpe_encode(df, merges)
    rows = {r.doc_id: "".join(r.pieces) for r in enc.collect()}
    assert rows[1] == "hello" + "\U0001F600" * 2 + "world" + "\U0001F600" * 2
    assert rows[2] == "cafénaïve你好你好helloworld"
    # the double-emoji adjacency is mergeable like any pair of symbols
    pieces1 = next(r.pieces for r in enc.collect() if r.doc_id == 1)
    assert "\U0001F600\U0001F600" in pieces1 or "\U0001F600" in pieces1


def test_batched_equals_sequential_truncated_topk(spark):
    """A corpus with MORE distinct pairs than k_collect forces the
    truncated-round path (floor > -1), where the round-7 widened bound
    hazard_bound + (len(batch)+1)*floor governs acceptance: batched
    output must still be bit-identical to sequential."""
    import random

    rng = random.Random(7)
    alpha = "abcdefghij"
    words = []
    for k in range(90):  # > k_collect=64 distinct pairs
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(2, 5)))
        words.extend([w] * rng.randint(1, 6))
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id int, text string"
    )
    seq = [tuple(r) for r in bpe_train(df, n_merges=12, batch_k=1, mode="spark").collect()]
    for k in (4, 16):
        got = [tuple(r) for r in bpe_train(df, n_merges=12, batch_k=k, mode="spark").collect()]
        assert got == seq, f"batch_k={k} diverged on truncated top-K"


def test_batched_equals_sequential_tiny_alphabet_fuzz(spark):
    """Randomized corpora over a 2-letter alphabet maximize symbol
    collisions (merged tokens recombining, same string reachable via
    different splits) — the exact territory of the round-7 stale-merge
    guard. Batched must equal sequential on every corpus."""
    import random

    rng = random.Random(41)
    for trial in range(4):
        words = [
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(20, 60))
        ]
        df = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id int, text string"
        )
        seq = [tuple(r) for r in bpe_train(df, n_merges=10, batch_k=1, mode="spark").collect()]
        got = [tuple(r) for r in bpe_train(df, n_merges=10, batch_k=8, mode="spark").collect()]
        assert got == seq, f"trial {trial} diverged: {got} != {seq}"


# ---------------------------------------------------------------------------
# round-8 driver-side heap trainer: bit-identity with the distributed path
# ---------------------------------------------------------------------------


def test_driver_equals_spark_on_corpus(docs):
    """The driver heap trainer (auto mode at this scale) must be
    BIT-IDENTICAL to the distributed loop on a real corpus — same
    winners, same ranks, same recorded pair counts."""
    spk = [tuple(r) for r in bpe_train(docs, n_merges=24, mode="spark").collect()]
    drv = [tuple(r) for r in bpe_train(docs, n_merges=24, mode="driver").collect()]
    assert drv == spk


def test_driver_equals_spark_on_ties_and_unicode(spark):
    """Tie-breaking ((left, right) ascending — UTF-8 byte order equals
    code-point order, so Python and UTF8String comparisons agree) and
    astral-plane symbols: the two trainers must agree exactly."""
    df = spark.createDataFrame(
        [(1, "xy xy cd cd ab ab 你好 你好 \U0001F600\U0001F600 z\U0001F600")],
        "doc_id int, text string",
    )
    spk = [tuple(r) for r in bpe_train(df, n_merges=8, mode="spark").collect()]
    drv = [tuple(r) for r in bpe_train(df, n_merges=8, mode="driver").collect()]
    assert drv == spk
    # ties at count 2 resolve lexicographically ascending on (left, right)
    assert (drv[0][1], drv[0][2]) == ("a", "b")


def test_driver_equals_spark_min_count_stop(spark):
    """Both paths stop at the same merge when the best pair falls under
    min_pair_count."""
    df = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc")], "doc_id int, text string"
    )
    spk = [tuple(r) for r in bpe_train(df, n_merges=10, min_pair_count=2, mode="spark").collect()]
    drv = [tuple(r) for r in bpe_train(df, n_merges=10, min_pair_count=2, mode="driver").collect()]
    assert drv == spk
    assert all(t[4] >= 2 for t in drv)


def test_driver_equals_spark_fuzz(spark):
    """Randomized 2-letter corpora (maximal symbol collisions: merged
    tokens recombining, same string via different splits) — the
    sequential heap trainer must track the distributed protocol on
    every corpus, deep into the merge list."""
    import random

    rng = random.Random(97)
    for trial in range(4):
        words = [
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(20, 80))
        ]
        df = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id int, text string"
        )
        spk = [tuple(r) for r in bpe_train(df, n_merges=14, mode="spark").collect()]
        drv = [tuple(r) for r in bpe_train(df, n_merges=14, mode="driver").collect()]
        assert drv == spk, f"trial {trial}: {drv} != {spk}"


def test_auto_mode_selects_driver_under_budget(docs):
    """auto with a generous budget must produce the driver path's
    output (== spark path by the identity above); auto with budget 0
    must fall back to the distributed loop. Both bit-identical anyway —
    this pins that the selector actually switches."""
    a = [tuple(r) for r in bpe_train(docs, n_merges=6, mode="auto").collect()]
    b = [tuple(r) for r in bpe_train(docs, n_merges=6, mode="auto",
                                     driver_budget_words=0).collect()]
    assert a == b


def test_auto_mode_char_budget_gates_driver_path(docs, monkeypatch):
    """The round-9 byte-budget gate: auto mode must fall back to the
    distributed loop when the vocabulary's total CHARACTERS exceed
    driver_budget_chars, even if the word count fits — the trainer's
    working set is ~285 B per vocab char (scripts/bpe_32k_stress.py),
    not per word. Output stays bit-identical either way; pin which path
    ran by instrumenting the driver trainer."""
    import etl_cli_spark.operators.bpe as bpemod

    calls = {"driver": 0}
    real = bpemod._train_merges_local

    def spy(*a, **kw):
        calls["driver"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(bpemod, "_train_merges_local", spy)
    a = [tuple(r) for r in bpe_train(docs, n_merges=6, mode="auto",
                                     driver_budget_chars=1).collect()]
    assert calls["driver"] == 0, "char budget must force the spark path"
    b = [tuple(r) for r in bpe_train(docs, n_merges=6, mode="auto").collect()]
    assert calls["driver"] == 1, "under both budgets -> driver path"
    assert a == b


def test_unknown_mode_raises(docs):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown mode"):
        bpe_train(docs, n_merges=2, mode="bogus")
