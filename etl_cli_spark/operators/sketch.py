"""KMV (k-minimum-values) distinct-count sketches.

Approximate COUNT(DISTINCT) at 100 TB without a full distinct shuffle of
the values: hash every value, keep only the k smallest distinct hashes
per group, estimate cardinality from the k-th smallest. Error is
~1/sqrt(k-2) relative (k=256 -> ~6%). Sketches are MERGEABLE (union =
min-k of the concatenation), so partial sketches can be built per
partition / per day and combined without re-reading the data —
the property HyperLogLog is usually picked for, but KMV keeps exact
replayability: the estimate is a deterministic function of md5, so an
external SQL engine can verify it bit-for-bit (`conv(hex)` here,
`CAST('0x'||hex)` in DuckDB), unlike opaque HLL registers.

Scale shape: the only wide exchange carries (group, hash-prefix) pairs.
Per-group min-k runs as a two-level tournament — top-k within
(group, salt) buckets, then top-k of the <= salt_buckets*k survivors —
so a group with a billion distinct values never serializes onto one
task (a bare per-group window would).

Spark has approx_count_distinct (HLL) built in; this module exists for
the mergeable-sketch-table workflow (persist per-shard sketches, union
later) and for oracle-verifiable estimates. Reference parity: the
reference engine exposes only exact counts (_count=1, base.py:351);
sketches are part of this engine's large-pipeline extension surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 2^60: the first 15 hex digits of the hash as an integer, exactly
# representable as a double so Spark and an external oracle compute the
# identical estimate
_SCALE = 1 << 60
_GRP = "__kmv_g"


def _portable_hash(col: str):
    """Lowercase md5 hex of the value's string form — identical in
    Spark (`md5(cast(v as string))`) and DuckDB (`md5(CAST(v AS
    VARCHAR))`). Lexicographic order on the fixed-width hex == numeric
    order, so "k smallest hashes" needs no numeric conversion."""
    return F.md5(F.col(col).cast("string"))


def _hash_num(h):
    # first 15 hex digits -> bigint in [0, 2^60)
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def _min_k(hashed: DataFrame, by: Sequence[str], k: int, salt_buckets: int = 64) -> DataFrame:
    """k smallest distinct __h per group, skew-safe: local top-k within
    (group, hash-salt) buckets first, global top-k over the survivors.
    Survivor count per group is <= salt_buckets * k regardless of group
    size, so the second window never sees a giant partition."""
    salt = F.pmod(_hash_num(F.col("__h")), F.lit(salt_buckets))
    w1 = Window.partitionBy(*by, salt).orderBy("__h")
    stage1 = (
        hashed.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    w2 = Window.partitionBy(*by).orderBy("__h")
    return stage1.withColumn("__rn", F.row_number().over(w2)).filter(F.col("__rn") <= k)


def _estimate(k: int):
    """(k-1) / normalized k-th minimum; exact count when the group has
    fewer than k distinct hashes. Arithmetic order (double multiply,
    then divide) matters: the oracle must replay it bit-for-bit."""
    return F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(_SCALE) / _hash_num(F.col("__kth")), 4
        )
    )


def _check_meta(df: DataFrame, checks: dict) -> DataFrame:
    """JVM-side guard: fail the job (not the estimate) when a sketch's
    embedded build parameters disagree with the probe call's. A filter
    carrying ``assert_true`` — evaluated per row, never pruned, and a
    no-op (coalesce to TRUE) when every row agrees. No driver collect."""
    cond = None
    for col, expected in checks.items():
        c = F.col(col) == F.lit(expected)
        cond = c if cond is None else (cond & c)
    msg = "sketch metadata mismatch: probe parameters %s disagree with the build call" % (
        {k.strip("_"): v for k, v in checks.items()},
    )
    return df.filter(
        F.coalesce(F.assert_true(cond, F.lit(msg)).cast("boolean"), F.lit(True))
    )


def _read_meta(df: DataFrame, cols: Sequence[str]):
    """Driver-side read of embedded build parameters (one tiny job —
    the metadata is constant per sketch, so ``first()`` suffices). Used
    only when the probe call omits the parameters."""
    row = df.select(*cols).first()
    if row is None:
        raise ValueError(
            "empty sketch frame: cannot derive build parameters; pass them explicitly"
        )
    return tuple(row)


def kmv_distinct(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    k: int = 256,
) -> DataFrame:
    """Approximate distinct count of ``col`` per ``by`` group.

    Returns (by..., est_distinct: double). Exact when a group has fewer
    than k distinct values, (k-1)/h_(k) otherwise.
    """
    if k < 2:
        raise ValueError("kmv needs k >= 2")
    grp = list(by) if by else [_GRP]
    src = df if by else df.withColumn(_GRP, F.lit(1))
    hashed = src.select(*grp, _portable_hash(col).alias("__h")).distinct()
    counts = hashed.groupBy(*grp).agg(F.count(F.lit(1)).alias("__n"))
    kth = (
        _min_k(hashed, grp, k)
        .filter(F.col("__rn") == k)
        .select(*grp, F.col("__h").alias("__kth"))
    )
    out = counts.join(kth, grp, "left").select(
        *grp, _estimate(k).alias("est_distinct")
    )
    return out.drop(_GRP) if not by else out


def kmv_sketch(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    k: int = 256,
) -> DataFrame:
    """The sketch itself: (by..., kmv: array<string>, __k) — the sorted
    k smallest distinct hashes, plus the build parameter embedded as a
    literal column so later merges/probes cannot silently use a
    mismatched ``k``. Persist per shard/day; combine later with
    :func:`kmv_merge` without touching the raw data again."""
    grp = list(by) if by else [_GRP]
    src = df if by else df.withColumn(_GRP, F.lit(1))
    hashed = src.select(*grp, _portable_hash(col).alias("__h")).distinct()
    out = (
        _min_k(hashed, grp, k)
        .groupBy(*grp)
        .agg(F.sort_array(F.collect_list("__h")).alias("kmv"))
        .withColumn("__k", F.lit(int(k)))
    )
    return out.drop(_GRP) if not by else out


def kmv_merge(
    sketches: DataFrame, by: Sequence[str] = (), k: int | None = None
) -> DataFrame:
    """Union partial sketches: rows carry ``kmv`` arrays (possibly many
    per group — one per shard); output is one merged sketch per group.
    Merge = k smallest of the deduplicated concatenation, the exact
    sketch of the unioned underlying data.

    ``k`` defaults to the sketches' embedded ``__k``; passing it
    explicitly (or merging shards built with differing k) is validated
    JVM-side and fails the job rather than producing a silently-wrong
    merged sketch."""
    has_meta = "__k" in sketches.columns
    if k is None:
        if not has_meta:
            raise ValueError("kmv_merge: sketches carry no __k metadata; pass k=")
        (k,) = _read_meta(sketches, ["__k"])
    if has_meta:
        sketches = _check_meta(sketches, {"__k": int(k)})
    grp = list(by) if by else [_GRP]
    src = sketches if by else sketches.withColumn(_GRP, F.lit(1))
    exploded = src.select(*grp, F.explode("kmv").alias("__h")).distinct()
    out = (
        _min_k(exploded, grp, k)
        .groupBy(*grp)
        .agg(F.sort_array(F.collect_list("__h")).alias("kmv"))
        .withColumn("__k", F.lit(int(k)))
    )
    return out.drop(_GRP) if not by else out


def kmv_estimate(
    sketch: DataFrame, by: Sequence[str] = (), k: int | None = None
) -> DataFrame:
    """Cardinality estimate from a sketch frame (by..., kmv).

    ``k`` defaults to the sketch's embedded ``__k``; an explicit
    mismatched value fails the job (JVM-side assert) instead of
    silently estimating with the wrong order statistic."""
    has_meta = "__k" in sketch.columns
    if k is None:
        if not has_meta:
            raise ValueError("kmv_estimate: sketch carries no __k metadata; pass k=")
        (k,) = _read_meta(sketch, ["__k"])
    if has_meta:
        sketch = _check_meta(sketch, {"__k": int(k)})
    grp = list(by) if by else [_GRP]
    src = sketch if by else sketch.withColumn(_GRP, F.lit(1))
    out = src.select(
        *grp,
        F.size("kmv").alias("__n"),
        F.element_at("kmv", k).alias("__kth"),
    ).select(*grp, _estimate(k).alias("est_distinct"))
    return out.drop(_GRP) if not by else out


# ---------------------------------------------------------------------------
# count-min sketch: mergeable frequency estimation
# ---------------------------------------------------------------------------
# The frequency-side twin of KMV: estimate per-item counts at 100 TB
# without shuffling items — only (group, depth, cell) triples move, and a
# sketch is at most depth*width rows per group however large the group.
# Over-estimates only (collisions add), never under; error <= 2N/width
# with probability 1 - (1/2)^depth. Cell position d of value v is
# uint32(md5(str(v) || '#cms<d>')) % width — the same portable md5
# arithmetic as the rest of the engine, so an external SQL engine
# rebuilds the identical sketch, collisions included.


def _cms_pos(col, d: int, width: int):
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(c.cast("string"), F.lit(f"#cms{d}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def cms_sketch(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    width: int = 1024,
    depth: int = 3,
) -> DataFrame:
    """Build the sketch: (by..., d, pos, c, __w, __d) — one row per
    non-empty cell, with (width, depth) embedded as literal columns so a
    probe or merge with mismatched parameters fails instead of silently
    returning wrong estimates.

    One shuffle on (group, d, pos) with map-side partial combine: the
    exchange carries at most depth*width rows per group regardless of
    input size. Persist per shard/day and combine with
    :func:`cms_merge`.
    """
    grp = list(by) if by else [_GRP]
    src = df if by else df.withColumn(_GRP, F.lit(1))
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _cms_pos(col, d, width).alias("pos")
            )
            for d in range(depth)
        ]
    )
    out = (
        src.select(*grp, F.explode(cells).alias("__cell"))
        .select(*grp, F.col("__cell.d").alias("d"), F.col("__cell.pos").alias("pos"))
        .groupBy(*grp, "d", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("__w", F.lit(int(width)))
        .withColumn("__d", F.lit(int(depth)))
    )
    return out.drop(_GRP) if not by else out


def cms_merge(sketches: DataFrame, by: Sequence[str] = ()) -> DataFrame:
    """Union partial sketches (rows from several :func:`cms_sketch`
    outputs): cell-wise sum — the exact sketch of the concatenated
    underlying data, the linearity property that makes CMS shardable.
    Shards built with differing (width, depth) fail the merge job
    (JVM-side assert on the embedded metadata) — cell sums across
    incompatible geometries are meaningless."""
    grp = list(by) if by else [_GRP]
    src = sketches if by else sketches.withColumn(_GRP, F.lit(1))
    if "__w" in src.columns:
        out = src.groupBy(*grp, "d", "pos").agg(
            F.sum("c").alias("c"),
            F.min("__w").alias("__wmin"),
            F.max("__w").alias("__w"),
            F.min("__d").alias("__dmin"),
            F.max("__d").alias("__dmax"),
        )
        ok = (F.col("__wmin") == F.col("__w")) & (F.col("__dmin") == F.col("__dmax"))
        out = (
            out.filter(
                F.coalesce(
                    F.assert_true(
                        ok, F.lit("cms_merge: shards built with differing width/depth")
                    ).cast("boolean"),
                    F.lit(True),
                )
            )
            .withColumn("__d2", F.col("__dmax"))
            .drop("__wmin", "__dmin", "__dmax")
            .withColumnRenamed("__d2", "__d")
        )
    else:
        out = src.groupBy(*grp, "d", "pos").agg(F.sum("c").alias("c"))
    return out.drop(_GRP) if not by else out


def cms_estimate(
    sketch: DataFrame,
    values: Sequence,
    by: Sequence[str] = (),
    width: int | None = None,
    depth: int | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Point-frequency estimates for ``values`` from a sketch frame:
    (by..., value, est_count) with est = min over depths of the probed
    cell (absent cell = 0).

    (width, depth) default to the sketch's embedded metadata; explicit
    values that disagree with it fail the job JVM-side — a probe hashed
    with the wrong geometry would silently return garbage otherwise.

    The probe table is (groups x values x depth) — tiny; it broadcasts,
    and only sketch cells matching a probed position are read.
    """
    spark = sketch.sparkSession
    has_meta = "__w" in sketch.columns
    if width is None or depth is None:
        if not has_meta:
            raise ValueError(
                "cms_estimate: sketch carries no __w/__d metadata; pass width= and depth="
            )
        mw, md = _read_meta(sketch, ["__w", "__d"])
        width = int(mw) if width is None else width
        depth = int(md) if depth is None else depth
    if has_meta:
        sketch = _check_meta(sketch, {"__w": int(width), "__d": int(depth)})
    grp = list(by) if by else [_GRP]
    src = sketch if by else sketch.withColumn(_GRP, F.lit(1))
    vals = spark.createDataFrame([(str(v),) for v in values], [value_col])
    probes = (
        src.select(*grp).distinct()
        .crossJoin(vals)
        .select(
            *grp,
            value_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            _cms_pos(value_col, d, width).alias("pos"),
                        )
                        for d in range(depth)
                    ]
                )
            ).alias("__cell"),
        )
        .select(*grp, value_col, F.col("__cell.d").alias("d"), F.col("__cell.pos").alias("pos"))
    )
    est = (
        probes.join(src, [*grp, "d", "pos"], "left")
        .groupBy(*grp, value_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )
    return est.drop(_GRP) if not by else est


# ---------------------------------------------------------------------------
# fixed-bin histogram sketch: mergeable quantiles
# ---------------------------------------------------------------------------
# The quantile member of the sketch family: one scan, (group, bin)
# integer counts — at most `bins` rows per group on the exchange — then
# rank interpolation over the cumulative histogram. Mergeable by cell
# sum (same linearity as CMS), so per-shard/day sketches combine without
# re-reading data. Error is bounded by the bin width (hi-lo)/bins; the
# arithmetic is plain double ops on exact integer counts, so an external
# engine replays estimates bit-for-bit — unlike t-digest/KLL whose
# internal state is order-dependent.


def _hist_bin(col, lo: float, hi: float, bins: int):
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    raw = F.floor((c - F.lit(float(lo))) / F.lit(float(hi - lo)) * bins).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))


def hist_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    by: Sequence[str] = (),
    bins: int = 128,
) -> DataFrame:
    """Build the histogram: (by..., bin, c, __lo, __hi, __bins). Values
    outside [lo, hi) clamp into the edge bins (they count, with
    saturated position). The bin geometry is embedded as literal
    columns so a probe with mismatched (lo, hi, bins) fails instead of
    silently interpolating against the wrong edges."""
    if not hi > lo:
        raise ValueError("hist_sketch needs hi > lo")
    grp = list(by) if by else [_GRP]
    src = df if by else df.withColumn(_GRP, F.lit(1))
    out = (
        src.select(*grp, _hist_bin(col, lo, hi, bins).alias("bin"))
        .groupBy(*grp, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("__lo", F.lit(float(lo)))
        .withColumn("__hi", F.lit(float(hi)))
        .withColumn("__bins", F.lit(int(bins)))
    )
    return out.drop(_GRP) if not by else out


def hist_merge(sketches: DataFrame, by: Sequence[str] = ()) -> DataFrame:
    """Cell-wise sum of partial histograms — the exact sketch of the
    concatenated data. Shards with differing bin geometry fail the
    merge job (JVM-side assert on the embedded metadata)."""
    grp = list(by) if by else [_GRP]
    src = sketches if by else sketches.withColumn(_GRP, F.lit(1))
    if "__bins" in src.columns:
        out = src.groupBy(*grp, "bin").agg(
            F.sum("c").alias("c"),
            F.min("__lo").alias("__lomin"),
            F.max("__lo").alias("__lo"),
            F.min("__hi").alias("__himin"),
            F.max("__hi").alias("__hi"),
            F.min("__bins").alias("__binsmin"),
            F.max("__bins").alias("__bins"),
        )
        ok = (
            (F.col("__lomin") == F.col("__lo"))
            & (F.col("__himin") == F.col("__hi"))
            & (F.col("__binsmin") == F.col("__bins"))
        )
        out = out.filter(
            F.coalesce(
                F.assert_true(
                    ok, F.lit("hist_merge: shards built with differing lo/hi/bins")
                ).cast("boolean"),
                F.lit(True),
            )
        ).drop("__lomin", "__himin", "__binsmin")
    else:
        out = src.groupBy(*grp, "bin").agg(F.sum("c").alias("c"))
    return out.drop(_GRP) if not by else out


def hist_quantile(
    sketch: DataFrame,
    qs: Sequence[float],
    lo: float | None = None,
    hi: float | None = None,
    by: Sequence[str] = (),
    bins: int | None = None,
) -> DataFrame:
    """Quantile estimates from a histogram frame: (by..., q, est).

    Rank r = max(1, ceil(q*N)); the estimate interpolates linearly
    inside the first bin whose cumulative count reaches r:
    ``lo + width * (bin + (r - cum_before) / c_bin)``. Each group's
    cumulative pass windows over at most ``bins`` rows.

    (lo, hi, bins) default to the sketch's embedded metadata; explicit
    values that disagree fail the job JVM-side.
    """
    spark = sketch.sparkSession
    has_meta = "__bins" in sketch.columns
    if lo is None or hi is None or bins is None:
        if not has_meta:
            raise ValueError(
                "hist_quantile: sketch carries no __lo/__hi/__bins metadata; "
                "pass lo=, hi= and bins="
            )
        mlo, mhi, mbins = _read_meta(sketch, ["__lo", "__hi", "__bins"])
        lo = float(mlo) if lo is None else lo
        hi = float(mhi) if hi is None else hi
        bins = int(mbins) if bins is None else bins
    if has_meta:
        sketch = _check_meta(
            sketch, {"__lo": float(lo), "__hi": float(hi), "__bins": int(bins)}
        )
    grp = list(by) if by else [_GRP]
    src = sketch if by else sketch.withColumn(_GRP, F.lit(1))
    width = (hi - lo) / bins
    wcum = Window.partitionBy(*grp).orderBy("bin")
    wall = Window.partitionBy(*grp)
    cum = F.sum("c").over(wcum)
    cur = (
        src.withColumn("__cum", cum)
        .withColumn("__prev", F.col("__cum") - F.col("c"))
        .withColumn("__n", F.sum("c").over(wall))
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    hit = cur.crossJoin(F.broadcast(qdf)).filter(
        (F.col("__cum") >= F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("__n"))))
        & (F.col("__prev") < F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("__n"))))
    )
    r = F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("__n"))).cast("double")
    est = (
        F.lit(float(lo))
        + F.lit(float(width))
        * (F.col("bin") + (r - F.col("__prev")) / F.col("c"))
    )
    out = hit.select(*grp, "q", est.alias("est"))
    return out.drop(_GRP) if not by else out


# ---------------------------------------------------------------------------
# HyperLogLog: register-based mergeable distinct count
# ---------------------------------------------------------------------------
# The fixed-size companion to KMV: a sketch is at most m = 2^p register
# rows per group — merge is a per-register max, so per-shard sketches
# union without re-reading data and without KMV's k-array dedup. Unlike
# the usual "opaque registers" objection, these registers are a
# deterministic function of the same portable md5 as everything else:
# bucket = h % m, rho = one-based leading-zero count of the remaining
# 60-p bits — an external SQL engine rebuilds the sketch bit-for-bit
# and replays the estimate (the raw harmonic sum is carried as an
# EXACT power-of-two-scaled integer, so the only float steps are one
# literal multiply and one divide, identical across engines).

def _hll_rho(hn, p: int, w: int):
    """One-based leading-zero rank of the top ``w`` bits above the
    bucket index: rho = w - bitlength(h >> p) + 1 (an all-zero field is
    w + 1). bin() has no leading zeros in Spark; the regexp strip makes
    the same expression exact on engines whose bin() pads."""
    field = F.shiftright(hn, p)
    blen = F.length(F.regexp_replace(F.bin(field), "^0+", ""))
    return (F.lit(w) - blen + F.lit(1)).cast("int")


_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_alpha(m: int) -> float:
    return _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_sketch(
    df: DataFrame, col: str, by: Sequence[str] = (), p: int = 8
) -> DataFrame:
    """Register rows (by..., __bucket, __rho) + embedded ``__p``: the
    max one-based leading-zero rank per hash bucket. At most 2^p rows
    per group leave the map side (the groupBy max combines locally)."""
    if not 4 <= p <= 16:
        raise ValueError("hll needs 4 <= p <= 16")
    m, w = 1 << p, 60 - p
    grp = list(by) if by else [_GRP]
    src = df if by else df.withColumn(_GRP, F.lit(1))
    hn = _hash_num(_portable_hash(col))
    regs = (
        src.select(
            *grp,
            F.pmod(hn, F.lit(m)).alias("__bucket"),
            _hll_rho(hn, p, w).alias("__r"),
        )
        .groupBy(*grp, "__bucket")
        .agg(F.max("__r").alias("__rho"))
        .withColumn("__p", F.lit(int(p)))
    )
    return regs.drop(_GRP) if not by else regs


def hll_merge(
    sketches: DataFrame, by: Sequence[str] = (), p: int | None = None
) -> DataFrame:
    """Union partial sketches (possibly many register rows per (group,
    bucket) — one per shard): per-register max, the exact sketch of the
    unioned data. Mismatched ``p`` fails the job JVM-side."""
    has_meta = "__p" in sketches.columns
    if p is None:
        if not has_meta:
            raise ValueError("hll_merge: sketches carry no __p metadata; pass p=")
        (p,) = _read_meta(sketches, ["__p"])
    if has_meta:
        sketches = _check_meta(sketches, {"__p": int(p)})
    grp = list(by) if by else [_GRP]
    src = sketches if by else sketches.withColumn(_GRP, F.lit(1))
    out = (
        src.groupBy(*grp, "__bucket")
        .agg(F.max("__rho").alias("__rho"))
        .withColumn("__p", F.lit(int(p)))
    )
    return out.drop(_GRP) if not by else out


def _hll_estimate_expr(m: int, w: int):
    """Estimate columns from (n_present, s_present) aggregates. The
    harmonic sum is exact: sum(2^-rho) scaled by 2^(w+1) is an integer
    (every term a power of two), absent registers contribute 2^(w+1)
    each; the float division happens once, on identical integers in
    any engine."""
    full = 1 << (w + 1)
    absent = (F.lit(int(m)) - F.col("__n")).cast("decimal(38,0)") * F.lit(
        int(full)
    ).cast("decimal(38,0)")
    s = (F.col("__s") + absent).cast("double")
    num = _hll_alpha(m) * m * m * float(full)
    e_raw = F.lit(num) / s
    v = F.lit(int(m)) - F.col("__n")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    return F.round(
        F.when((e_raw <= F.lit(2.5 * m)) & (v > 0), lc).otherwise(e_raw), 4
    )


def hll_estimate(
    sketch: DataFrame, by: Sequence[str] = (), p: int | None = None
) -> DataFrame:
    """Cardinality estimate from a register frame: raw HLL harmonic
    estimate with the standard small-range linear-counting correction
    (E <= 2.5m with empty registers). Returns (by..., est_distinct)."""
    has_meta = "__p" in sketch.columns
    if p is None:
        if not has_meta:
            raise ValueError("hll_estimate: sketch carries no __p metadata; pass p=")
        (p,) = _read_meta(sketch, ["__p"])
    if has_meta:
        sketch = _check_meta(sketch, {"__p": int(p)})
    m, w = 1 << int(p), 60 - int(p)
    grp = list(by) if by else [_GRP]
    src = sketch if by else sketch.withColumn(_GRP, F.lit(1))
    agg = src.groupBy(*grp).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(w + 1) - F.col("__rho")).cast("decimal(38,0)")
        ).alias("__s"),
    )
    out = agg.select(*grp, _hll_estimate_expr(m, w).alias("est_distinct"))
    return out.drop(_GRP) if not by else out


def hll_distinct(
    df: DataFrame, col: str, by: Sequence[str] = (), p: int = 8
) -> DataFrame:
    """One-shot approximate distinct count of ``col`` per ``by`` group
    via HLL registers (~1.04/sqrt(2^p) relative error). One map-side-
    combined shuffle of at most 2^p register rows per group."""
    return hll_estimate(hll_sketch(df, col, by=by, p=p), by=by, p=p)
