"""Text-analysis operators for training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language ID,
quality scoring, token counting, fingerprinting — all as pure Column
expressions (JVM-side, whole-stage codegen, no Python UDFs), so they run
at scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..fanout import fan_out_for_compute

# Small per-language stopword lists for the n-gram/stopword heuristic.
# Deliberately tiny: the heuristic is "which language's function words
# dominate", which needs only the few highest-frequency words.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "que"),
    "de": ("der", "die", "und", "das", "ist", "von", "den", "mit", "nicht", "ein"),
    "it": ("il", "la", "di", "che", "e", "un", "per", "non", "sono", "con"),
}

_WS = r"\s+"
_PUNCT = r"[!-/:-@\[-`{-~]"


def let(value: Column, body) -> Column:
    """Bind ``value`` to a lambda variable and evaluate ``body`` on it once.

    Spark HOF lambda bodies re-evaluate any embedded non-lambda-var
    subexpression per array element (no common-subexpression elimination
    across HOFs). Wrapping the expensive expression as
    ``transform(array(value), v -> body(v))[0]`` evaluates it exactly once
    per row no matter how many times ``body`` references it.
    """
    return F.transform(F.array(value), body)[0]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (lowercased)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), _WS)


def token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(tokens(c)))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Subword-ish token estimate: word+punct pieces, long words split ~4 chars.

    A cheap stand-in for a BPE tokenizer: count regex word/punct pieces,
    charging ceil(len/4) for words longer than 4 chars (BPE splits rare
    long words into multiple units).
    """
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), 0)
    return F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, p: acc + F.ceil(F.length(p) / F.lit(4.0)).cast("int"),
    )


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    p = n - F.length(F.regexp_replace(c, _PUNCT, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p / n)


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are top-frequency function words."""
    c = F.col(col) if isinstance(col, str) else col
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    toks = tokens(c)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def mean_word_length(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(total / F.size(toks))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length, punctuation, stopwords,
    word shape. Mirrors the usual Gopher/C4-style filters in spirit."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio(c) < 0.3, 1.0).otherwise(0.4)
    stop_ok = F.when(stopword_ratio(c) > 0.05, 1.0).otherwise(0.6)
    mwl = mean_word_length(c)
    shape_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.5)
    return (len_ok * punct_ok * stop_ok * shape_ok).cast("double")


# the Gopher "must contain" word list (Rae et al. 2021, appendix A1.1:
# a document must contain at least 2 of these to pass)
_GOPHER_REQUIRED_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_required_stops: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    Methods, Analysis & Insights from Training Gopher", appendix A —
    public method; the same rule set Dolma/RefinedWeb reuse): per
    document, the raw rule statistics plus a ``passes`` verdict.

    Rules implemented (the deterministic-text subset):
    word count in [min_words, max_words]; mean word length in
    [min, max]; symbol-to-word ratio (``#`` chars + ``...``/``…``
    ellipses per word) <= max; fraction of lines starting with a
    bullet (``-``/``*``/``•``) <= max; fraction of lines ending with
    an ellipsis <= max; fraction of words containing an alphabetic
    character (any Unicode letter, ``\\p{L}`` — accented and
    non-Latin scripts count) >= min; and >= ``min_required_stops`` of
    the 8 Gopher must-contain words present.

    Everything is a pure Column expression over one whitespace
    tokenization and one line split — single projection, whole-stage
    codegen, zero UDFs, scan-speed at 100 TB (the filter every
    web-corpus pipeline runs on EVERY document, so it must cost a
    projection, not a shuffle). Ratios are exact integer-over-integer
    IEEE divisions, replayable bit-for-bit by any engine."""
    df = fan_out_for_compute(df)  # parallelize the per-row pass (round-14)
    c = F.col(text_col)
    toks = tokens(c)
    n_words = token_count(c)
    total_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    mwl = F.when(n_words == 0, F.lit(0.0)).otherwise(total_len / n_words)
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell = (
        (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / F.lit(3)
    ).cast("long") + (
        F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit("")))
    )
    symbol_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        (n_hash + n_ell) / n_words
    )
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.ltrim(ln).rlike(r"^(\-|\*|•)( |$)"),
        )
    )
    ellipsis = F.size(
        F.filter(
            lines,
            lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"),
        )
    )
    bullet_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(bullet / n_lines)
    ellipsis_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(ellipsis / n_lines)
    # Unicode letter class, not [a-z]: accented and non-Latin-script
    # words must count as alphabetic (\p{L} is supported by both Java
    # regex and RE2, so the DuckDB oracle replays it verbatim)
    alpha = F.size(F.filter(toks, lambda t: t.rlike(r"\p{L}")))
    alpha_frac = F.when(n_words == 0, F.lit(0.0)).otherwise(alpha / n_words)
    req = F.array(*[F.lit(w) for w in _GOPHER_REQUIRED_STOPS])
    n_stops = F.size(F.filter(req, lambda w: F.array_contains(toks, w)))
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        n_stops.alias("n_required_stops"),
    )
    return out.withColumn(
        "passes",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("n_required_stops") >= min_required_stops),
    )


_SCRIPTS = ("Latin", "Cyrillic", "Greek", "Han", "Arabic", "Hangul")


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode script composition per document: total letter count
    (``\\p{L}``), the per-script letter fraction for the six major
    script families, and the dominant script — the routing signal a
    multilingual pipeline needs BEFORE language ID (script is cheap
    and exact where lang-ID is statistical: a Han-dominant page never
    goes to the English quality rules, mixed-script pages flag
    boilerplate/spam injection). Fractions are over LETTERS, not
    chars, so punctuation/digit-heavy pages don't dilute the signal.

    Dominant script = the first script in the fixed family order to
    reach the maximum count ('und' when the document has no letters
    from any family). Pure Column expressions (``regexp_count`` over
    script classes — Java ``\\p{IsX}``, replayed by RE2's ``\\p{X}``
    in the DuckDB twin); one projection, scan speed."""
    df = fan_out_for_compute(df)  # parallelize the per-row pass (round-14)
    c = F.col(text_col)
    # TWO projections, deliberately: the regex counts materialize once
    # under ``__c_*`` names, and the dominance fold + fracs reference
    # those columns. Folding directly over the regexp_count expressions
    # builds a when()-tree that duplicates each count O(2^k) times
    # (condition + otherwise at every step) — measured 35 s at sf0.1
    # vs ~2 s for this shape; Catalyst refuses to collapse the two
    # projects precisely because the inner expressions are expensive
    # and multiply-referenced.
    counted = df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(r"\p{L}")).alias("n_letters"),
        *[
            F.regexp_count(c, F.lit(rf"\p{{Is{s}}}")).alias(f"__c_{s.lower()}")
            for s in _SCRIPTS
        ],
    )
    best_s, best_c = F.lit("und"), F.lit(0)
    for s in _SCRIPTS:
        cnt = F.col(f"__c_{s.lower()}")
        better = cnt > best_c
        best_s = F.when(better, F.lit(s.lower())).otherwise(best_s)
        best_c = F.when(better, cnt).otherwise(best_c)
    nl = F.col("n_letters")
    return counted.select(
        F.col(id_col),
        nl,
        *[
            F.when(nl == 0, F.lit(0.0))
            .otherwise(F.col(f"__c_{s.lower()}") / nl)
            .alias(f"{s.lower()}_frac")
            for s in _SCRIPTS
        ],
        best_s.alias("script"),
    )


def c4_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
    bad_words: tuple[str, ...] = (),
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning with a Unified Text-to-Text Transformer", §2.2 —
    the other canonical public web-cleaning recipe next to Gopher; the
    rule set mC4/The Pile's CC pipeline reuse). C4 is LINE-REWRITING
    where Gopher is document-scoring: the operator returns the cleaned
    text alongside the stats and verdict.

    Line rules (a line survives into ``clean_text`` iff ALL hold):
    ends in a terminal punctuation mark (``.``, ``!``, ``?``, or a
    closing quote ``"``/``”`` — the paper's "end quotation mark");
    has >= ``min_line_words`` whitespace words; does not contain the
    word "javascript" (case-insensitive).

    Document rules (the ``passes`` verdict): >= ``min_sentences``
    sentences in the CLEANED text (the repo's ``split_sentences``
    segmentation — C4 used a sentence tokenizer; same approximation
    class); no "lorem ipsum" (lowercased substring); no ``{`` (the
    code-page tell); no whitespace token from ``bad_words`` (the
    paper's word-list rule — the list is caller data, not shipped).
    C4's cross-document three-sentence-span dedup is the separate
    ``pipeline.repeated_spans`` family.

    Everything is pure Column expressions over one line split — a
    single projection, zero UDFs, scan-speed at 100 TB, replayed
    bit-for-bit by the DuckDB twin."""
    df = fan_out_for_compute(df)  # parallelize the per-row pass (round-14)
    c = F.col(text_col)
    lines = F.split(c, "\n")

    def _line_ok(ln: Column) -> Column:
        # the terminal-punct test absorbs trailing spaces/tabs/CR in
        # the PATTERN ([ \t\r]*$), not via rtrim: Java's $ matches
        # before a trailing \r (line terminator) while RE2's does not,
        # so an rtrim(space-only) + bare-$ anchor diverges between the
        # engines on CRLF text (round-14 review finding)
        return (
            ln.rlike(r'[.!?"”][ \t\r]*$')
            & (F.size(F.split(F.trim(ln), _WS)) >= min_line_words)
            & ~F.lower(ln).contains("javascript")
        )

    kept = F.filter(lines, _line_ok)
    clean = F.concat_ws("\n", kept)
    n_sentences = F.size(split_sentences(clean))
    lowered = F.lower(c)
    has_lorem = lowered.contains("lorem ipsum")
    has_brace = c.contains("{")
    if bad_words:
        bw = F.array(*[F.lit(w.lower()) for w in bad_words])
        has_bad = F.arrays_overlap(tokens(c), bw)
    else:
        has_bad = F.lit(False)
    out = df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_bad.alias("has_bad_word"),
        clean.alias("clean_text"),
    )
    return out.withColumn(
        "passes",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
        & ~F.col("has_bad_word"),
    )


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language ID: the language whose function words hit most.

    Falls back to 'und' when no list scores. Pure expression — a real
    deployment would swap in a fastText/CLD pandas_udf behind the same
    column contract.
    """
    c = F.col(col) if isinstance(col, str) else col

    def vote(toks: Column) -> Column:
        # toks is let-bound: each language's filter reads the bound
        # variable instead of re-tokenizing the text (round-9 fix)
        best_lang, best_score = F.lit("und"), F.lit(0)
        for lang, words in LANG_STOPWORDS.items():
            stop = F.array(*[F.lit(w) for w in words])
            score = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
            is_better = score > best_score
            best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(is_better, score).otherwise(best_score)
        return best_lang

    return let(tokens(c), vote)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, collapsed whitespace). Portable across engines."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), _WS, " ")
    return F.md5(normalized.cast("binary"))


def rolling_hashes(col: Column | str, window: int = 8) -> Column:
    """Array of rolling (windowed token) hashes — the winnowing primitive.

    xxhash64 over each ``window``-token shingle; downstream minhash/
    winnowing selects from these.
    """
    c = F.col(col) if isinstance(col, str) else col
    return let(
        tokens(c),
        lambda toks: F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0))),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))),
        ),
    )


def winnow(col: Column | str, window: int = 8, k: int = 4) -> Column:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): the minimum
    rolling hash in each sliding window of ``k`` consecutive hashes,
    deduplicated. Guarantees shared fingerprints for sufficiently long
    shared substrings — the standard plagiarism/near-dup signature."""
    return let(
        rolling_hashes(col, window),
        lambda h: F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(h) - (k - 1), F.lit(1))),
                lambda i: F.array_min(F.slice(h, i, k)),
            )
        ),
    )


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality rules) and PII scrubbing
# ---------------------------------------------------------------------------

def all_ngrams(col: Column | str, n: int) -> Column:
    """ALL word n-grams (non-distinct — frequency matters for repetition
    signals; `dedup.shingles` is the distinct variant). The token array
    is ``let``-bound: an unbound reference inside the per-position
    lambda re-splits the text per gram — O(words^2) per document
    (round-9 fix, same as pipeline.ngrams)."""
    c = F.col(col) if isinstance(col, str) else col

    def _grams(toks: Column) -> Column:
        count = F.size(toks) - F.lit(n - 1)
        return F.when(
            count >= 1,
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let(F.split(F.lower(F.trim(c)), _WS), _grams)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Per-document repetition fraction: occurrences of the most frequent
    word n-gram over all n-gram occurrences (the Gopher "top n-gram
    fraction" rule; high values flag boilerplate/spam).

    Plan: explode to (id, gram), two-level aggregation — the shuffle keys
    are (id, 64-bit gram hash), never the text, and the per-(id,gram)
    partial counts combine map-side. Scales as a word-count does.
    """
    grams = df.select(
        F.col(id_col), F.explode(all_ngrams(text_col, n)).alias("g")
    ).select(id_col, F.xxhash64("g").alias("gh"))
    per = grams.groupBy(id_col, "gh").agg(F.count(F.lit(1)).alias("c"))
    return per.groupBy(id_col).agg(
        (F.max("c") / F.sum("c")).alias(f"top{n}gram_frac"),
        F.sum("c").alias(f"n_{n}grams"),
    )


def gopher_repetition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher's repetition rule suite (Rae et al. 2021 appendix A1.1 —
    the companion of :func:`gopher_quality`): per document,

    - ``dup_line_frac`` / ``dup_line_char_frac`` — fraction of lines
      (and of line characters) that are 2nd-or-later occurrences of a
      repeated line (the first copy is not counted — the
      Gopher/Dolma/DataTrove convention, so the published 30%
      thresholds apply directly; ``[A,A,B,C]`` scores 0.25);
    - ``top{2,3,4}gram_char_frac`` — characters covered by the single
      most frequent word n-gram (occurrences × n-gram length) over the
      NORMALIZED character count (lowercased tokens joined by single
      spaces — the same text the n-grams are drawn from). Occurrences
      may overlap, so the fraction can exceed 1 on pathologically
      repetitive text ("a b a b ..."), exactly as in the public
      reference implementations (count × len / total); the rule's
      thresholds live well below 1 so this changes no verdicts.

    Determinism: the "top" n-gram fraction is a pure max over
    (count, length) — among grams tying on both, ``count × len / nc``
    is the same number, so no further tie-break is needed (the md5
    tie-break the first version carried could never change the output;
    round-14 optimization dropped it from the aggregate).

    Scale posture (round-14 single-pass shape): ONE scan, ONE explode,
    TWO hash aggregates. Lines and n-grams ride the same exploded
    stream as ``struct(n, piece)`` rows (n = 0 marks a line, 2/3/4 a
    gram), so the first aggregate — keyed (id, n, md5-16-bytes, len),
    map-side combined — counts both families at once, and the second
    collapses to one row per document computing the line fractions
    (conditional sums over n = 0) and the three top-gram picks
    (``max(struct(count, len))`` over each n) in a single pass. The
    previous shape ran the line and gram branches as separate
    scan+aggregate pipelines joined at the end: 2 scans, 4 aggregates,
    5 exchanges — this is 1 scan, 2 exchanges, and the second exchange
    carries one row per distinct (piece, len) per doc. Shuffled keys
    are ``unhex(md5(piece))`` (16-byte binary, half the hex-string
    footprint) and lengths — never line or gram TEXT. Gram arrays
    build as a chained ``zip_with`` (g2 from the token array and its
    shift, g3 from g2, g4 from g3), each ``let``-bound so it
    constructs ONCE per row — inlined, g3/g4 re-embed g2's tree and
    HOF subtrees sit outside codegen's common-subexpression
    elimination, so g2 built 3x and g3 2x per row (round-14 measured
    construction, not hashing, as the dominant cost).
    """
    df = fan_out_for_compute(df)  # parallelize the per-row pass (round-14)
    c = F.col(text_col)
    # tokens materialize ONCE; gram arrays chain via zip_with: g2[i] =
    # t[i] + ' ' + t[i+1] (a single O(N) pass — no per-position array
    # slice), g3[i] = g2[i] + ' ' + t[i+2], g4[i] = g3[i] + ' ' + t[i+3].
    # slice() with a greatest(..., 0) length yields [] for docs shorter
    # than n tokens (sequence(1, 0) would DESCEND), and a null token
    # array coalesces to [] in _tag.
    base = df.select(F.col(id_col), c.alias("__txt"), tokens(c).alias("__t"))
    t = F.col("__t")

    def _shift(k: int):
        return F.slice(t, k + 1, F.greatest(F.size(t) - k, F.lit(0)))

    def _extend(prev, k: int):
        # prev holds the (k)-grams; pair each with the token k ahead
        return F.zip_with(
            F.slice(prev, 1, F.greatest(F.size(t) - k, F.lit(0))),
            _shift(k),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )

    def _tag(arr: Column, n: int) -> Column:
        return F.transform(
            F.coalesce(arr, F.array().cast("array<string>")),
            lambda x: F.struct(F.lit(n).alias("n"), x.alias("g")),
        )

    # one combined piece stream: raw lines tagged n=0 (md5 over the RAW
    # line — dup-line identity is case/space-sensitive, as before) plus
    # the three gram families. A null text yields a null lines-array
    # inside _tag -> [] ... but split() of non-null text never nulls, so
    # null-text docs produce an empty combined array and drop at the
    # explode — exactly the rowset the old two-branch shape produced.
    # The lines array is built OUTSIDE the let chain (it depends on no
    # gram array; inside the lambdas it would be a loop-invariant
    # expression the HOF-lambda audit rightly rejects).
    grams = let(
        _extend(t, 1),
        lambda g2: let(
            _extend(g2, 2),
            lambda g3: F.concat(
                _tag(g2, 2), _tag(g3, 3), _tag(_extend(g3, 3), 4)
            ),
        ),
    )
    combined = F.concat(_tag(F.split(F.col("__txt"), "\n"), 0), grams)
    g = (
        base.select(
            F.col(id_col),
            F.length(F.concat_ws(" ", t)).alias("__nc"),
            F.explode(combined).alias("__e"),
        )
        .select(
            id_col, "__nc", F.col("__e.n").alias("__n"),
            F.unhex(F.md5(F.col("__e.g"))).alias("__gh"),
            F.length(F.col("__e.g")).alias("__glen"),
        )
    )
    per_piece = g.groupBy(id_col, "__nc", "__n", "__gh", "__glen").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # one row per document: line fractions from the n=0 rows
    # (Gopher/Dolma/DataTrove convention — only 2nd+ occurrences of a
    # repeated line count as duplicate, so [A,A,B,C] scores 1/4 and the
    # published 30% thresholds apply directly; round-13 advice fix),
    # top-gram picks from the n=2/3/4 rows, all in ONE hash aggregate.
    is_line = F.col("__n") == 0
    stats = per_piece.groupBy(id_col).agg(
        F.max("__nc").alias("__nc"),
        (
            F.sum(
                F.when(is_line & (F.col("__c") > 1), F.col("__c") - 1)
                .when(is_line, 0)
            )
            / F.sum(F.when(is_line, F.col("__c")))
        ).alias("dup_line_frac"),
        F.when(
            F.sum(F.when(is_line, F.col("__c") * F.col("__glen"))) == 0,
            F.lit(0.0),
        ).otherwise(
            F.sum(
                F.when(
                    is_line & (F.col("__c") > 1),
                    (F.col("__c") - 1) * F.col("__glen"),
                ).when(is_line, 0)
            )
            / F.sum(F.when(is_line, F.col("__c") * F.col("__glen")))
        ).alias("dup_line_char_frac"),
        *[
            F.max(
                F.when(
                    F.col("__n") == n,
                    F.struct(
                        F.col("__c").alias("c"), F.col("__glen").alias("glen")
                    ),
                )
            ).alias(f"__m{n}")
            for n in (2, 3, 4)
        ],
    )
    return stats.select(
        id_col,
        "dup_line_frac",
        "dup_line_char_frac",
        *[
            F.when(
                F.col(f"__m{n}").isNull() | (F.col("__nc") == 0), F.lit(0.0)
            )
            .otherwise(
                F.col(f"__m{n}.c") * F.col(f"__m{n}.glen") / F.col("__nc")
            )
            .alias(f"top{n}gram_char_frac")
            for n in (2, 3, 4)
        ],
    )


# portable, deliberately conservative patterns (same regex dialect works
# in Spark and DuckDB/RE2): emails, international-ish phone numbers, IPv4
_PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}", "<PHONE>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def pii_scrub(col: Column | str) -> Column:
    """Redact common PII shapes (email / phone / IPv4) with typed tags.

    A chain of JVM-side regexp_replace — codegen, no UDF. The pattern
    list is the seam: a production deployment swaps in its legal team's
    patterns (or an NER model via pandas_udf) without touching callers.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in _PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


# HTML boilerplate removal (round-12): the extraction step every
# web-corpus pipeline runs before quality/dedup (CCNet, RefinedWeb —
# public methods strip markup/script/style and keep block structure).
# Pure JVM regexp chains — codegen, no UDF — written in the regex
# subset BOTH Java (Spark) and RE2 (DuckDB) accept: inline (?is)
# flags, lazy quantifiers, NO backreferences (RE2 lacks them, hence
# separate script/style patterns). The DuckDB oracle replays the
# identical chain, so extraction is hash-certified cross-engine.
# \b anchors the tag name (supported by both Java and RE2): without it
# the alternation matched by PREFIX — <pre>/<param>/<picture>/<progress>
# (via p), <link> (via li), <track> (via tr) became paragraph breaks
# instead of being stripped to a space, distorting the paragraph
# structure fed to paragraph_dedup/chunking (round-13 advice fix)
_HTML_BLOCK_TAGS = r"(?i)</?(p|br|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article)\b[^>]*>"
# decode order matters: &amp; LAST so '&amp;lt;' -> '&lt;' (one level)
_HTML_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
]


def _html_decode(c: Column) -> Column:
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML document: script/style/comment/head
    blocks dropped, block-level tags become newlines (paragraph structure
    survives for ``paragraph_dedup``), remaining tags stripped,
    standard entities decoded, whitespace normalized."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<head[^>]*>.*?</head>", " ")
    c = F.regexp_replace(c, _HTML_BLOCK_TAGS, "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    c = _html_decode(c)
    c = F.regexp_replace(c, r"[ \t\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n\n+", "\n\n")
    return F.regexp_replace(c, r"^\s+|\s+$", "")


# double-quoted href only: the Java∩RE2 subset has no backreferences,
# so one pattern cannot match both quote styles without alternation
# blow-up; double quotes are the overwhelming convention in real HTML,
# and single-quoted hrefs simply don't match (documented scope)
_HREF_PATTERN = r'(?is)<a[^>]*?\bhref\s*=\s*"([^"]*)"'


def html_links(col: Column | str) -> Column:
    """href targets of ``<a>`` anchors, in document order — the crawl
    frontier / link-graph feed (compose with ``urls.canonicalize`` and
    ``graph.pagerank`` for the full crawl-graph story). Values are raw
    attribute text (entities NOT decoded — a crawl frontier wants the
    literal URL)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_HREF_PATTERN), 1)


_IMG_TAG_PATTERN = r"(?is)<img\b[^>]*>"
_SRC_ATTR = r'(?is)\bsrc\s*=\s*"([^"]*)"'
_ALT_ATTR = r'(?is)\balt\s*=\s*"([^"]*)"'


def html_images(col: Column | str) -> Column:
    """(src, alt) of ``<img>`` tags in document order — the image-text
    pair feed (compose with ``multimodal.image_text_pairs`` for the
    LAION-style corpus assembly). Attributes in ANY order; values are
    raw attribute text under the ``html_links`` scope rule
    (double-quoted only, entities not decoded). Tags without a src
    drop; a missing alt yields ''."""
    c = F.col(col) if isinstance(col, str) else col
    tags = F.regexp_extract_all(c, F.lit(_IMG_TAG_PATTERN), 0)
    pairs = F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, _SRC_ATTR, 1).alias("src"),
            F.regexp_extract(t, _ALT_ATTR, 1).alias("alt"),
        ),
    )
    return F.filter(pairs, lambda p: p["src"] != F.lit(""))


def html_title(col: Column | str) -> Column:
    """<title> contents, entity-decoded and trimmed ('' if absent)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_extract(c, r"(?is)<title[^>]*>(.*?)</title>", 1)
    return F.regexp_replace(_html_decode(t), r"^\s+|\s+$", "")


# sentence boundary: a run of terminal punctuation followed by
# whitespace. The Java∩RE2 subset has NO lookaround, so segmentation
# is substitution-based: keep the punctuation, replace the following
# whitespace with a \x01 sentinel, split on the sentinel. \x01 cannot
# appear in text that survived normalize_unicode/quality filtering;
# oracle fixtures construct their inputs and guarantee it.
_SENTENCE_BOUNDARY = r"([.!?]+)[ \t\r\n]+"


def split_sentences(col: Column | str) -> Column:
    """Sentence segments in document order (terminal punctuation kept,
    per-segment whitespace trimmed, empty segments dropped) — the
    sentence-aware feed for ``pipeline.chunk`` / ``pack_sequences``.
    Pure Column ops; the DuckDB twin replays the identical pattern
    with its own replacement syntax (``\\1`` vs Java's ``$1``)."""
    c = F.col(col) if isinstance(col, str) else col
    marked = F.regexp_replace(c, _SENTENCE_BOUNDARY, "$1\x01")
    segs = F.transform(F.split(marked, "\x01"), lambda x: F.trim(x))
    return F.filter(segs, lambda x: x != F.lit(""))


def with_text_stats(df: DataFrame, text_col: str = "text", prefix: str = "") -> DataFrame:
    """Convenience: attach the standard per-document stat columns."""
    c = F.col(text_col)
    return (
        df.withColumn(f"{prefix}n_tokens", token_count(c))
        .withColumn(f"{prefix}n_chars_m", char_count(c))
        .withColumn(f"{prefix}punct_ratio", punct_ratio(c))
        .withColumn(f"{prefix}stopword_ratio", stopword_ratio(c))
        .withColumn(f"{prefix}mean_word_len", mean_word_length(c))
        .withColumn(f"{prefix}quality", quality_score(c))
        .withColumn(f"{prefix}lang_pred", lang_id(c))
        .withColumn(f"{prefix}fingerprint", fingerprint(c))
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str | None = None,
) -> DataFrame:
    """Unicode-normalize a text column (NFC/NFKC/NFD/NFKD) — the
    canonical first step of any crawl pipeline: the same user-visible
    string arrives both precomposed (é = U+00E9) and decomposed
    (e + U+0301) in the wild, which silently breaks exact dedup,
    shingle hashes, and token counts until the corpus agrees on one
    form (NFC is the web convention; NFKC additionally folds
    compatibility characters — fullwidth forms, ligatures).

    Spark has no built-in normalizer, so this is an Arrow-batched
    pandas UDF over ``unicodedata`` (stdlib ICU-equivalent tables) —
    one of the few justified Python-UDF hot paths, and still one
    narrow map with no shuffle. The DuckDB oracle runs its OWN
    independent normalizer (``nfc_normalize``), making this a true
    cross-implementation differential check. NULLs pass through."""
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):
        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return df.withColumn(out_col or text_col, _norm(F.col(text_col)))
