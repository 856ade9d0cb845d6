"""Property-based tests (SURVEY §5.3) for the under-specified semantics:
merge-direction field precedence, insert idempotence, incremental-loop
convergence. Example counts are small — each example is a Spark job."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_cli_spark.operators.merger import merge
from etl_cli_spark.spec import MergerSpec, TargetSpec

maybe_int = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    src_vals=st.lists(maybe_int, min_size=3, max_size=3),
    mrg_vals=st.lists(maybe_int, min_size=2, max_size=2),
    direction=st.sampled_from(["m2s", "s2m"]),
)
@SETTINGS
def test_merge_direction_precedence(spark, src_vals, mrg_vals, direction):
    """dict-update semantics: winner's value when present, else loser's;
    unmatched source rows always keep source values."""
    # key 1 matches, key 2 doesn't; column 'x' conflicts
    src = spark.createDataFrame(
        [(1, src_vals[0]), (2, src_vals[1]), (3, src_vals[2])], "k int, x int"
    )
    mrg = spark.createDataFrame([(1, mrg_vals[0]), (9, mrg_vals[1])], "k int, x int")
    out = merge(src, mrg, MergerSpec(ds="m", keys=("k",), merge_direction=direction))
    rows = {r.k: r.x for r in out.collect()}
    sv, mv = src_vals[0], mrg_vals[0]
    expected_matched = (mv if mv is not None else sv) if direction == "m2s" else (
        sv if sv is not None else mv
    )
    assert rows[1] == expected_matched
    assert rows[2] == src_vals[1]  # unmatched: source value untouched
    assert rows[3] == src_vals[2]


@given(keys=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=12, unique=True))
@SETTINGS
def test_insert_idempotent(spark, tmp_path_factory, keys):
    """Running the same insert twice adds nothing the second time."""
    from etl_cli_spark.operators.writeops import ParquetTable, apply_write_op

    path = str(tmp_path_factory.mktemp("prop") / "t.parquet")
    t = ParquetTable(spark, path)
    src = spark.createDataFrame([(k, f"v{k}") for k in keys], ["id", "v"])
    spec = TargetSpec(ds="t", op="insert", pk=("id",))
    first = apply_write_op(src, t, spec).count()
    second = apply_write_op(src, t, spec).count()
    assert first == len(keys)
    assert second == len(keys)  # no growth


@given(
    n_rows=st.integers(min_value=1, max_value=40),
    limit=st.integers(min_value=1, max_value=15),
)
@SETTINGS
def test_incremental_loop_exactly_once(spark, tmp_path_factory, n_rows, limit):
    """Fixpoint reached; every record processed exactly once for any
    batch_limit."""
    from etl_cli_spark.streaming.incremental import incremental_loop

    path = str(tmp_path_factory.mktemp("prop") / "bm.parquet")
    seen: list[int] = []

    def source():
        return spark.range(n_rows).withColumnRenamed("id", "rid")

    def process(batch):
        seen.extend(r.rid for r in batch.collect())

    stats = incremental_loop(spark, source, process, path, ["rid"], batch_limit=limit)
    assert stats.converged
    assert sorted(seen) == list(range(n_rows))  # exactly once, all of them
    assert stats.passes == -(-n_rows // limit)  # ceil


# ---------------------------------------------------------------------------
# training-data pipeline ops
# ---------------------------------------------------------------------------

_texts = st.lists(
    st.text(alphabet="abc xyz", min_size=0, max_size=60), min_size=1, max_size=6
)


@given(texts=_texts, size=st.integers(8, 40), overlap=st.integers(0, 7))
@SETTINGS
def test_chunking_reconstructs_text(spark, texts, size, overlap):
    """Invariants for any (text, size, overlap): stripping each chunk's
    leading overlap and concatenating reproduces the document exactly,
    and every chunk is at most `size` chars."""
    from etl_cli_spark.operators.pipeline import chunk_documents

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = chunk_documents(df, size=size, overlap=overlap)
    rows = sorted((r.doc_id, r.chunk_id, r.chunk_text) for r in out.collect())
    stride = size - overlap
    by_doc: dict[int, list[str]] = {}
    for doc_id, chunk_id, text in rows:
        assert len(text) <= size
        by_doc.setdefault(doc_id, []).append(text)
    for doc_id, chunks in by_doc.items():
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        # trailing chunks may re-cover already-seen text; the rebuilt
        # prefix must BE the document
        assert rebuilt[: len(texts[doc_id])] == texts[doc_id]
        assert len(rebuilt) >= len(texts[doc_id])
        # no chunk starts beyond the text: second-to-last must add value
        if len(chunks) > 1:
            assert (len(chunks) - 1) * stride < max(1, len(texts[doc_id]) - overlap) + stride


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True),
    frac=st.floats(0.05, 0.95),
)
@SETTINGS
def test_split_and_sample_consistency(spark, ids, frac):
    """Splits partition the id set exactly; hash_sample is a subset and
    monotone in the fraction — for arbitrary id sets and fractions."""
    from etl_cli_spark.operators.pipeline import deterministic_split, hash_sample

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = deterministic_split(df)
    rows = [(r.doc_id, r.split) for r in out.collect()]
    assert sorted(i for i, _ in rows) == sorted(ids)  # exactly once each
    assert {s for _, s in rows} <= {"train", "val", "test"}
    small = {r.doc_id for r in hash_sample(df, fraction=frac).collect()}
    big = {r.doc_id for r in hash_sample(df, fraction=min(1.0, frac + 0.04)).collect()}
    assert small <= big <= set(ids)


@given(
    toks=st.lists(st.integers(0, 50), min_size=1, max_size=12),
    budget=st.integers(10, 100),
)
@SETTINGS
def test_packing_quantizes_any_stream(spark, toks, budget):
    """pack_id equals floor(exclusive-cumsum / budget) for any token
    stream — verified against a pure-python reference."""
    from etl_cli_spark.operators.pipeline import pack_sequences

    rows = [(i, "w " * n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.pack_id)
        for r in pack_sequences(df, budget=budget, n_shards=1).collect()
    }
    cum = 0
    for i, n in enumerate(toks):
        assert got[i] == (n, cum // budget)
        cum += n


@given(
    n=st.integers(min_value=5, max_value=40),
    quota=st.integers(min_value=1, max_value=12),
    grow=st.integers(min_value=0, max_value=15),
)
@SETTINGS
def test_quota_sample_prefix_stability_property(spark, n, quota, grow):
    """Growing the corpus never CHURNS a quota sample: every id kept from
    the small corpus is either kept in the grown corpus or displaced by
    a grown-in row with a strictly smaller hash rank — i.e. the kept set
    of the grown corpus restricted to old ids is a subset of the old
    kept set, and the budget stays exactly filled."""
    from etl_cli_spark.operators.pipeline import quota_sample

    old = spark.createDataFrame([(i, "g") for i in range(n)], "doc_id long, lang string")
    new = spark.createDataFrame(
        [(i, "g") for i in range(n + grow)], "doc_id long, lang string"
    )
    kept_old = {r.doc_id for r in quota_sample(old, ["lang"], {"g": quota}).collect()}
    kept_new = {r.doc_id for r in quota_sample(new, ["lang"], {"g": quota}).collect()}
    assert len(kept_old) == min(quota, n)
    assert len(kept_new) == min(quota, n + grow)
    # old ids surviving in the grown sample were already in the old sample
    assert (kept_new & set(range(n))) <= kept_old


@given(
    vals=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    probe=st.integers(min_value=0, max_value=30),
)
@SETTINGS
def test_cms_never_undercounts_property(spark, vals, probe):
    from etl_cli_spark.operators.sketch import cms_estimate, cms_sketch

    df = spark.createDataFrame([(str(v),) for v in vals], "v string")
    sk = cms_sketch(df, "v", width=64, depth=3)
    est = cms_estimate(sk, [str(probe)], width=64, depth=3).collect()[0].est_count
    assert est >= vals.count(probe)


@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=99.0, allow_nan=False), min_size=2, max_size=80
    ),
    q=st.sampled_from([0.1, 0.5, 0.9]),
)
@SETTINGS
def test_hist_quantile_bin_width_bound_property(spark, vals, q):
    """The histogram quantile is always within one bin width of the true
    rank statistic."""
    from etl_cli_spark.operators.sketch import hist_quantile, hist_sketch

    import math

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    sk = hist_sketch(df, "v", lo=0.0, hi=100.0, bins=20)
    est = hist_quantile(sk, [q], 0.0, 100.0, bins=20).collect()[0].est
    exact = sorted(vals)[max(0, math.ceil(q * len(vals)) - 1)]
    assert abs(est - exact) <= 5.0 + 1e-9  # one bin width


# -- round-5: codec robustness properties (no Spark jobs — fast) -------------


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    ncol=st.integers(min_value=1, max_value=256),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_property(w, h, ncol, interlace, seed):
    """encode_gif -> _decode_gif is the identity for ANY palette size,
    dimensions, and interlace flag."""
    import numpy as np

    from etl_cli_spark.operators.multimodal import _decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    px = pal[rng.integers(0, ncol, size=(h, w))]
    W, H, out = _decode_gif(encode_gif(px, interlace=interlace))
    assert (W, H) == (w, h)
    assert np.array_equal(out, px)


@given(
    n_frames=st.integers(min_value=1, max_value=5),
    w=st.integers(min_value=2, max_value=12),
    h=st.integers(min_value=2, max_value=12),
    disposal=st.sampled_from([0, 1]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_gif_animation_full_frames_property(n_frames, w, h, disposal, seed):
    """Full-frame animations decode to exactly the encoded frames under
    draw-over disposal, with the encoded delays."""
    import numpy as np

    from etl_cli_spark.operators.multimodal import (
        _decode_gif_frames,
        encode_gif_animation,
    )

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 16, size=(h, w))] for _ in range(n_frames)]
    delays = [int(d) * 10 for d in rng.integers(1, 50, size=n_frames)]
    data = encode_gif_animation(frames, delays, disposals=[disposal] * n_frames)
    _w, _h, got = _decode_gif_frames(data)
    assert len(got) == n_frames
    for (d, canvas), f, want_d in zip(got, frames, delays):
        assert d == want_d
        assert np.array_equal(canvas, f)


@given(payload=st.binary(min_size=0, max_size=400))
@settings(max_examples=200, deadline=None)
def test_random_bytes_never_crash_decode_or_probe(payload):
    """The batch contract, fuzzed: arbitrary bytes through the pixel
    dispatch return an array or None (never raise), and the header
    probe returns a 3-tuple (never raises) — one garbage crawl payload
    must not be able to kill a Spark task."""
    from etl_cli_spark.operators.multimodal import _decode_pixels, _probe_one

    _decode_pixels(payload)
    fmt, w, h = _probe_one(payload)
    assert fmt is None or isinstance(fmt, str)


@given(
    magic=st.sampled_from([b"GIF89a", b"GIF87a", b"\x89PNG\r\n\x1a\n", b"BM", b"P6", b"\xFF\xD8"]),
    tail=st.binary(min_size=0, max_size=300),
)
@settings(max_examples=150, deadline=None)
def test_magic_prefixed_garbage_never_crashes(magic, tail):
    """Garbage that LOOKS like a known container (right magic, wrong
    body) exercises the deep parse paths — still never a crash."""
    from etl_cli_spark.operators.multimodal import _decode_pixels, _probe_one

    payload = magic + tail
    _decode_pixels(payload)
    _probe_one(payload)


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=2, max_size=12,
    ),
    n_merges=st.integers(min_value=1, max_value=6),
)
@SETTINGS
def test_bpe_matches_pure_python_reference(spark, words, n_merges):
    """bpe_train against an independent pure-Python BPE with the same
    protocol (count desc, (left,right) asc tie-break, left-to-right
    non-overlapping merge, min_pair_count=2) on arbitrary corpora."""
    from collections import Counter

    from etl_cli_spark.operators.bpe import bpe_train

    def py_bpe(wordlist, n):
        freq = Counter(" ".join(wordlist).lower().split())
        syms = {w: list(w) for w in freq}
        merges = []
        for _ in range(n):
            pc = Counter()
            for w, cnt in freq.items():
                s = syms[w]
                for a, b in zip(s, s[1:]):
                    pc[(a, b)] += cnt
            if not pc:
                break
            (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if c < 2:
                break
            merges.append((l, r))
            for w in syms:
                s, out = syms[w], []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
        return merges

    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id int, text string")
    got = [(r.left, r.right) for r in bpe_train(docs, n_merges=n_merges).collect()]
    assert got == py_bpe(words, n_merges)


@given(
    a=st.lists(st.text(alphabet="xyz", min_size=1, max_size=3), min_size=3, max_size=8),
    b=st.lists(st.text(alphabet="xyz", min_size=1, max_size=3), min_size=3, max_size=8),
)
@SETTINGS
def test_fuzzy_join_jaccard_matches_python(spark, a, b):
    """Any pair the LSH join reports must carry the exact shingle
    Jaccard a pure-Python recomputation yields."""
    from etl_cli_spark.operators.dedup import minhash_fuzzy_join

    def sh3(ws):
        ws = [w.lower() for w in ws]
        if len(ws) < 3:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    left = spark.createDataFrame([(1, " ".join(a))], "doc_id long, text string")
    right = spark.createDataFrame([(2, " ".join(b))], "doc_id long, text string")
    got = minhash_fuzzy_join(left, right, threshold=0.0).collect()
    sa, sb = sh3(a), sh3(b)
    expect = round(len(sa & sb) / max(len(sa | sb), 1), 6)
    # every REPORTED pair carries the exact Jaccard (the verify step is
    # exact); low-similarity pairs may legitimately produce no LSH
    # candidate, so only identical shingle sets guarantee a report
    for r in got:
        assert abs(r.jaccard - expect) < 1e-6
    if sa == sb:
        assert len(got) == 1


# a cell is None / NaN / a small int-valued float — the three equality
# regimes the diff's grouping must treat exactly like exceptAll's
# (null == null, NaN == NaN, plain value equality)
_diff_cell = st.one_of(
    st.none(),
    st.just(float("nan")),
    st.integers(min_value=0, max_value=3).map(float),
)


@given(
    old_rows=st.lists(st.tuples(_diff_cell, _diff_cell), max_size=12),
    new_rows=st.lists(st.tuples(_diff_cell, _diff_cell), max_size=12),
)
@SETTINGS
def test_multiset_diff_matches_exceptall_property(spark, old_rows, new_rows):
    """_multiset_diff's docstring claims exact exceptAll multiset
    semantics from ONE shuffle — same null-safe, NaN-normalized
    grouping equality, per-occurrence multiplicity. Pin it against
    exceptAll itself on random multisets over the three equality
    regimes (None / NaN / value), including duplicate rows on both
    sides so multiplicity arithmetic (explode of count differences) is
    exercised, not just set membership."""
    from etl_cli_spark.operators.writeops import _multiset_diff

    schema = "x double, y double"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)

    def key(rows):
        # NaN-normalized, null-distinct multiset fingerprint
        out = []
        for r in rows:
            out.append(tuple(
                "NULL" if v is None else ("NaN" if v != v else repr(v))
                for v in r
            ))
        return sorted(out)

    added, removed = _multiset_diff(old, new)
    assert key(added.collect()) == key(new.exceptAll(old).collect())
    assert key(removed.collect()) == key(old.exceptAll(new).collect())


@given(
    words=st.lists(
        st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
                min_size=1, max_size=8),
        min_size=1, max_size=6,
    )
)
@SETTINGS
def test_html_to_text_inverts_simple_markup(spark, words):
    """Wrapping markup-free words in paragraphs/anchors and extracting
    must recover exactly the whitespace-normalized words — html_to_text
    is a left inverse of simple HTML construction on tag-free text."""
    from etl_cli_spark.operators.text import html_to_text

    plain = " ".join(words)
    html = "<html><body>" + "".join(
        f"<p><a href=\"https://x.example/{i}\">{w}</a></p>" for i, w in enumerate(words)
    ) + "</body></html>"
    df = spark.createDataFrame([(html,), (plain,)], "h string")
    got = [r["b"] for r in df.select(html_to_text("h").alias("b")).collect()]
    assert got[0] == "\n\n".join(words)  # one paragraph per word
    # markup-free text passes through modulo whitespace normalization
    assert got[1] == " ".join(plain.split())
