from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cli_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    rolling_hashes,
    token_count,
    with_text_stats,
)


@pytest.fixture(scope="module")
def samples(spark):
    rows = [
        (1, "the cat and the dog sat in the garden for an hour"),
        (2, "el perro y el gato en la casa de la abuela"),
        (3, "le chat et le chien sont dans la maison des amis"),
        (4, "!!! ??? ... ###"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_token_count(samples):
    got = {r.id: r.n for r in samples.select("id", token_count("text").alias("n")).collect()}
    assert got[1] == 12
    assert got[5] == 0


def test_bpe_ish_counts_more_than_words(spark):
    df = spark.createDataFrame([("internationalization is complicated",)], ["text"])
    n = df.select(bpe_ish_token_count("text").alias("n")).collect()[0].n
    assert n >= 8  # long words charged multiple subword units


def test_punct_ratio(samples):
    got = {r.id: r.p for r in samples.select("id", punct_ratio("text").alias("p")).collect()}
    assert got[1] < 0.05
    assert got[4] > 0.5
    assert got[5] == 0.0


def test_lang_id(samples):
    got = {r.id: r.lang for r in samples.select("id", lang_id("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_quality_score_ordering(samples):
    got = {r.id: r.q for r in samples.select("id", quality_score("text").alias("q")).collect()}
    assert got[1] > got[4]  # prose beats punctuation soup
    assert 0.0 <= min(got.values()) and max(got.values()) <= 1.0


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], ["text"])
    fps = [r.fp for r in df.select(fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]  # case + whitespace normalized
    assert len(fps[0]) == 32  # md5 hex


def test_rolling_hashes(spark):
    df = spark.createDataFrame([("one two three four five six seven eight nine ten",)], ["text"])
    hs = df.select(rolling_hashes("text", window=4).alias("h")).collect()[0].h
    assert len(hs) == 7  # 10 tokens, window 4 -> 7 shingle positions
    assert len(set(hs)) == 7


def test_with_text_stats_on_fixture(engine):
    df = with_text_stats(engine.read("documents"))
    row = df.filter("doc_id = 0").collect()[0]
    assert row.n_tokens > 0 and row.n_chars_m == row.n_chars
    assert 0 <= row.quality <= 1
    assert len(row.fingerprint) == 32


def test_mean_word_length(spark):
    df = spark.createDataFrame([("aa bb cc",)], ["text"])
    assert df.select(mean_word_length("text").alias("m")).collect()[0].m == 2.0


def test_winnow_fingerprints(spark):
    from etl_cli_spark.operators.text import winnow

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs far away home"),
        (2, "the quick brown fox jumps over the lazy dog and runs far away home"),
        (3, "a completely different sentence with no overlap in any words at all here"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r.id: set(r.fp) for r in df.select("id", winnow(F.col("text"), window=4, k=3).alias("fp")).collect()}
    assert out[1] == out[2]  # identical text -> identical fingerprints
    assert not (out[1] & out[3])  # disjoint text -> disjoint fingerprints
    assert len(out[1]) >= 1


def test_repetition_stats(spark):
    from etl_cli_spark.operators.text import repetition_stats

    rows = [
        (1, "a b a b a"),          # 2-grams: "a b","b a","a b","b a" -> top 2/4
        (2, "w x y z"),            # all 2-grams unique -> top 1/3
        (3, "solo"),               # 1 token: no 2-grams, no output row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.top2gram_frac, r.n_2grams) for r in repetition_stats(df).collect()}
    assert got[1] == (0.5, 4)
    assert got[2] == (1 / 3, 3)
    assert 3 not in got


def test_pii_scrub(spark):
    from etl_cli_spark.operators.text import pii_scrub

    rows = [
        ("mail me at jane.doe+x@corp.example.org thanks",),
        ("call +1-555-0123 or 44 555 123 4567 now",),
        ("server at 192.168.1.254 is up",),
        ("nothing sensitive here",),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r.c for r in df.select(pii_scrub("text").alias("c")).collect()]
    assert got[0] == "mail me at <EMAIL> thanks"
    assert "<PHONE>" in got[1] and "555" not in got[1]
    assert got[2] == "server at <IP> is up"
    assert got[3] == "nothing sensitive here"


def test_normalize_unicode_forms(spark):
    """NFC composes decomposed accents and singleton-maps U+212B; NFKC
    additionally folds compatibility characters (ligatures, fullwidth);
    NULLs pass through; unknown forms refuse."""
    import pytest

    from etl_cli_spark.operators.text import normalize_unicode

    rows = [
        (1, "café"),          # decomposed acute
        (2, "Ångström"), # angstrom sign + decomposed o-umlaut
        (3, None),
        (4, "eﬃcient Ａ"), # ffi ligature + fullwidth A
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    nfc = {r.doc_id: r.text for r in normalize_unicode(df).collect()}
    assert nfc[1] == "café"
    assert nfc[2] == "Ångström"
    assert nfc[3] is None
    assert nfc[4] == "eﬃcient Ａ"  # NFC keeps compatibility chars
    nfkc = {r.doc_id: r.text for r in normalize_unicode(df, form="NFKC").collect()}
    assert nfkc[4] == "efficient A"
    with pytest.raises(ValueError, match="unknown normalization form"):
        normalize_unicode(df, form="NFX")


def test_html_to_text_strips_boilerplate_keeps_paragraphs(spark):
    from etl_cli_spark.operators.text import html_title, html_to_text

    html = (
        '<html><head><title> My &amp; Title </title><style>p{}</style>'
        '<script>ignored()</script></head><body><!-- comment -->'
        '<SCRIPT src="x">var a = "<p>not a tag</p>";</SCRIPT>'
        '<h1>Head</h1><p>one</p><p>two &lt;x&gt; &quot;q&quot; &#39;s&nbsp;!</p>'
        '<div>three</div></body></html>'
    )
    df = spark.createDataFrame([(html,), ("no markup at all",), ("<p></p>",)], "h string")
    rows = df.select(
        html_title("h").alias("t"), html_to_text("h").alias("b")
    ).collect()
    assert rows[0]["t"] == "My & Title"
    # head (incl. its script/style/title) gone; body scripts/comments
    # gone even with markup inside strings; block tags -> paragraph breaks
    assert rows[0]["b"] == 'Head\n\none\n\ntwo <x> "q" \'s !\n\nthree'
    assert rows[1]["t"] == "" and rows[1]["b"] == "no markup at all"
    assert rows[2]["b"] == ""


def test_html_block_tag_names_are_anchored(spark):
    """Round-13 advice fix: <pre>/<param>/<picture>/<progress> (prefix
    'p'), <link> (prefix 'li'), <track> (prefix 'tr') are NOT block
    tags — they must strip to a space, not become paragraph breaks."""
    from etl_cli_spark.operators.text import html_to_text

    df = spark.createDataFrame(
        [
            ("<pre>x</pre><param a=b>y<link rel=s><track kind=c>z",),
            ("<p>a</p><progress>b</progress><picture>c</picture>",),
        ],
        "h string",
    )
    rows = df.select(html_to_text("h").alias("b")).collect()
    # no paragraph breaks from the non-block tags — just space-stripped
    assert rows[0]["b"] == "x y z"
    # real <p> still breaks; progress/picture don't
    assert rows[1]["b"] == "a\nb c"


def test_html_entity_decode_single_level(spark):
    # '&amp;lt;' must decode to '&lt;' (one level), never to '<'
    from etl_cli_spark.operators.text import html_to_text

    df = spark.createDataFrame([("<p>a &amp;lt; b</p>",)], "h string")
    assert df.select(html_to_text("h").alias("b")).collect()[0]["b"] == "a &lt; b"


def test_html_links_order_and_scope(spark):
    from etl_cli_spark.operators.text import html_links

    html = (
        '<a href="https://a.example/1">1</a> text '
        "<a href='https://single.example/skip'>s</a>"  # single-quoted: out of scope
        '<A class="x" data-y="z" HREF = "https://b.example/2?q=1&amp;r=2">2</A>'
        '<a name="anchor-no-href">none</a>'
    )
    df = spark.createDataFrame([(html,), ("plain text",)], "h string")
    got = [r["l"] for r in df.select(html_links("h").alias("l")).collect()]
    # document order, raw attribute text (entities NOT decoded)
    assert got[0] == ["https://a.example/1", "https://b.example/2?q=1&amp;r=2"]
    assert got[1] == []


def test_split_sentences_boundaries_and_tail(spark):
    from etl_cli_spark.operators.text import split_sentences

    df = spark.createDataFrame(
        [("One two. Three!  Four?! Five six... and a tail",),
         ("no terminal punctuation",),
         ("",)],
        "t string",
    )
    got = [r["s"] for r in df.select(split_sentences("t").alias("s")).collect()]
    assert got[0] == ["One two.", "Three!", "Four?!", "Five six...", "and a tail"]
    assert got[1] == ["no terminal punctuation"]
    assert got[2] == []
    # dots NOT followed by whitespace (decimals, versions) never split
    df2 = spark.createDataFrame([("pi is 3.14 and v1.2.3 ships. done",)], "t string")
    got2 = df2.select(split_sentences("t").alias("s")).collect()[0]["s"]
    assert got2 == ["pi is 3.14 and v1.2.3 ships.", "done"]


def test_gopher_quality_rules_fire_individually(spark):
    """Each Gopher rule must be independently falsifiable: engineered
    documents trip exactly the intended rule (Rae et al. 2021 app. A)."""
    from etl_cli_spark.operators.text import gopher_quality

    good = (
        "the quick brown fox and the lazy dog have agreed that surfing "
        "with friends out of boredom can be fun to watch every day "
        * 3
    ).strip()
    docs = [
        (0, good),                                     # passes everything
        (1, "too few words here"),                     # word count
        (2, " ".join(["a"] * 60)),                     # mean word length low
        (3, good + " " + "#" * 1 + " #### ## # # # ##"),  # symbol ratio
        (4, good + ("\n- b" * 30)),                    # bullet lines
        (5, (good + "\n") + "ends like this...\n" * 30),  # ellipsis lines
        (6, good + " " + " ".join(["123"] * 40)),      # alpha fraction
        (7, " ".join(["lorem ipsum dolor sit amet"] * 12)),  # no stop words
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r.doc_id: r for r in gopher_quality(df, min_words=20).collect()}
    assert got[0].passes is True
    assert got[1].passes is False and got[1].n_words < 20
    assert got[2].passes is False and got[2].mean_word_len < 3.0
    assert got[3].passes is False and got[3].symbol_ratio > 0.1
    assert got[4].passes is False and got[4].bullet_frac > 0.9
    assert got[5].passes is False and got[5].ellipsis_frac > 0.3
    assert got[6].passes is False and got[6].alpha_frac < 0.8
    assert got[7].passes is False and got[7].n_required_stops < 2


def test_gopher_repetition_fractions_hand_computed(spark):
    from etl_cli_spark.operators.text import gopher_repetition

    rows = [
        (1, "dup line\nunique one\ndup line\nother"),
        (2, "a b a b a b c"),   # 13 norm chars; "a b" x3 (len 3)
        (3, "solo"),            # no n-grams at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_repetition(df).collect()}
    # doc 1: "dup line" occurs twice -> ONE extra occurrence counts
    # (Gopher/Dolma convention: first copy is legitimate): 1 of 4
    # lines, 1*8 of (8+10+8+5)=31 chars
    assert got[1].dup_line_frac == 0.25
    assert abs(got[1].dup_line_char_frac - 8 / 31) < 1e-12
    # doc 2: top 2-gram "a b" x3 -> 9/13; top 3-gram "a b a" x2 -> 10/13;
    # top 4-gram "a b a b" x2 overlapping -> 14/13 (public reference
    # semantics: count x len / total, overlap can exceed 1)
    assert abs(got[2].top2gram_char_frac - 9 / 13) < 1e-12
    assert abs(got[2].top3gram_char_frac - 10 / 13) < 1e-12
    assert abs(got[2].top4gram_char_frac - 14 / 13) < 1e-12
    # doc 3: one token -> zero everywhere, no NULLs
    assert (got[3].dup_line_frac, got[3].top2gram_char_frac,
            got[3].top4gram_char_frac) == (0.0, 0.0, 0.0)


def test_gopher_quality_alpha_frac_is_unicode(spark):
    """alpha_frac counts any word containing a Unicode letter — an
    accented / non-Latin-script document must not score 0 (round-13
    advice fix: the old [a-z] class failed every non-ASCII corpus)."""
    from etl_cli_spark.operators.text import gopher_quality

    docs = [
        (1, "Él está aquí y también allá según creía ñoño"),  # accented Latin
        (2, "это текст на русском языке с буквами кириллицы"),  # Cyrillic
        (3, "1 2 3 4 5 6 7 8 9 10"),  # digits only: still 0
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r.doc_id: r for r in gopher_quality(df, min_words=1).collect()}
    assert got[1].alpha_frac == 1.0
    assert got[2].alpha_frac == 1.0
    assert got[3].alpha_frac == 0.0


def test_gopher_repetition_dup_lines_match_reference_convention(spark):
    """The documented [A,A,B,C] -> 0.25 example from the Gopher/Dolma
    reference implementations (2nd+ occurrences only)."""
    from etl_cli_spark.operators.text import gopher_repetition

    df = spark.createDataFrame(
        [(1, "A\nA\nB\nC"), (2, "A\nA\nA\nA")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in gopher_repetition(df).collect()}
    assert got[1].dup_line_frac == 0.25
    assert got[1].dup_line_char_frac == 0.25
    assert got[2].dup_line_frac == 0.75   # 3 of 4 copies are duplicates
    assert got[2].dup_line_char_frac == 0.75


def test_gopher_repetition_top_pick_is_deterministic(spark):
    """Count ties break by longer gram, then smaller md5 — a total
    order, so the published fraction is a pure function of the text."""
    from etl_cli_spark.operators.text import gopher_repetition

    # "xx yy" and "zz ww" both occur twice; lengths equal; md5 decides
    df = spark.createDataFrame(
        [(1, "xx yy q zz ww r xx yy s zz ww")], "doc_id long, text string"
    )
    a = gopher_repetition(df).collect()[0]
    b = gopher_repetition(df.repartition(4)).collect()[0]
    assert a == b


def test_c4_quality_line_rules_fire_individually(spark):
    """Each C4 line rule drops exactly its target line; survivors
    rejoin in document order."""
    from etl_cli_spark.operators.text import c4_quality

    text = "\n".join([
        "This opening sentence has plenty of words and ends well.",
        "too short.",                                   # < 5 words
        "this line never terminates so it must go",     # no terminal punct
        "Please enable JavaScript to continue reading.",  # javascript
        "The middle sentence also survives the filter cleanly.",
        # quote-terminated line LAST: '."' + newline is not a
        # punct-then-whitespace boundary, so mid-text it would merge
        # with the next segment (split_sentences' documented shape)
        'He said "the quote can end a valid line here."',
    ])
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = c4_quality(df).collect()[0]
    assert r.n_lines == 6 and r.n_kept_lines == 3
    assert r.clean_text.split("\n") == [
        "This opening sentence has plenty of words and ends well.",
        "The middle sentence also survives the filter cleanly.",
        'He said "the quote can end a valid line here."',
    ]
    assert r.n_sentences == 3 and r.passes


def test_c4_quality_page_rules_and_verdict(spark):
    from etl_cli_spark.operators.text import c4_quality

    good = "\n".join([
        "First good sentence with enough words right here.",
        "Second good sentence with enough words right here.",
        "Third good sentence with enough words right here.",
    ])
    rows = [
        (1, good),
        (2, good + "\nsome Lorem Ipsum filler text appears."),
        (3, good + "\nif (x) { return; }"),
        (4, good + "\nthis page mentions the forbidden zorblax token."),
        (5, "Only one good sentence with enough words here."),  # < 3 sentences
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in c4_quality(df, bad_words=("zorblax",)).collect()}
    assert out[1].passes
    assert out[2].has_lorem and not out[2].passes
    assert out[3].has_brace and not out[3].passes
    assert out[4].has_bad_word and not out[4].passes
    assert out[5].n_sentences == 1 and not out[5].passes
    # page flags look at the RAW text, line filter at lines: doc 3's
    # brace line also fails the line filter (no terminal punct)
    assert "{" not in out[3].clean_text


def test_c4_quality_sentence_count_spans_lines(spark):
    """Sentences are counted on the CLEANED text: two sentences inside
    one surviving line both count."""
    from etl_cli_spark.operators.text import c4_quality

    text = (
        "This line holds two sentences. Both of them count fine.\n"
        "And a third sentence arrives on its own line here."
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = c4_quality(df).collect()[0]
    assert r.n_kept_lines == 2 and r.n_sentences == 3 and r.passes


def test_c4_quality_empty_and_no_survivors(spark):
    from etl_cli_spark.operators.text import c4_quality

    df = spark.createDataFrame(
        [(1, ""), (2, "no terminal punctuation anywhere in this text")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in c4_quality(df).collect()}
    assert out[1].n_kept_lines == 0 and out[1].clean_text == ""
    assert out[1].n_sentences == 0 and not out[1].passes
    assert out[2].n_kept_lines == 0 and not out[2].passes


def test_script_profile_counts_and_dominance(spark):
    from etl_cli_spark.operators.text import script_profile

    rows = [
        (1, "hello world"),                      # pure latin
        (2, "Привет мир"),                       # pure cyrillic
        (3, "hello Привет мир тут"),             # cyrillic-dominant mix
        (4, "12345 !!! ..."),                    # no letters
        (5, "ab ДЕ"),                            # exact tie -> latin (first in order)
        (6, "漢字 한국어 한글"),                  # hangul over han
    ]
    out = {
        r.doc_id: r
        for r in script_profile(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[1].script == "latin" and out[1].latin_frac == 1.0
    assert out[2].script == "cyrillic" and out[2].cyrillic_frac == 1.0
    assert out[3].script == "cyrillic" and 0 < out[3].latin_frac < 0.5
    assert out[4].script == "und" and out[4].n_letters == 0
    assert out[4].latin_frac == 0.0
    assert out[5].script == "latin"  # strict-greater fold: first wins ties
    assert out[6].script == "hangul" and out[6].han_frac > 0
    # fractions over LETTERS: doc 1's spaces don't dilute
    assert out[1].n_letters == 10


def test_c4_quality_crlf_lines(spark):
    """Windows line endings: a line ending '.\r' must pass the
    terminal-punct rule identically in Spark and the DuckDB replay
    (Java's $ matches before a trailing \r, RE2's does not — the rule
    absorbs trailing whitespace in the pattern instead)."""
    from etl_cli_spark.operators.text import c4_quality

    text = (
        "First good sentence with enough words right here.\r\n"
        "Second good sentence with enough words right here.\r\n"
        "Third good sentence with enough words right here."
    )
    r = c4_quality(spark.createDataFrame([(1, text)], ["doc_id", "text"])).collect()[0]
    assert r.n_kept_lines == 3 and r.passes
