"""URL curation operators: canonicalization, registrable domain,
per-domain cap (operators/urls.py)."""

import pytest
from pyspark.sql import functions as F

from etl_cli_spark.operators.urls import (
    canonicalize_url,
    per_domain_cap,
    registrable_domain,
    url_host,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r[0] for r in df.select(canonicalize_url("url")).collect()]


CASES = [
    # scheme/host case-folding + www
    ("HTTP://WWW.Example.COM/a", "http://example.com/a"),
    # default ports dropped, non-default kept
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # https:80 is NOT a default port
    ("https://example.com:80/a", "https://example.com:80/a"),
    # fragment dropped
    ("https://example.com/a#sec", "https://example.com/a"),
    # tracking params dropped, the rest sorted; empty query drops '?'
    ("https://example.com/a?utm_source=x&b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?utm_source=x&fbclid=1", "https://example.com/a"),
    # trailing slash trimmed (root path becomes '')
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com", "https://example.com"),
    # query with no path
    ("https://example.com?b=2&a=1", "https://example.com?a=1&b=2"),
    # whitespace trimmed
    ("  https://example.com/a  ", "https://example.com/a"),
]


def test_canonicalize_cases(spark):
    got = _canon(spark, [u for u, _ in CASES])
    assert got == [w for _, w in CASES]


def test_canonicalize_idempotent(spark):
    once = _canon(spark, [u for u, _ in CASES])
    twice = _canon(spark, once)
    assert twice == once


def test_canonicalize_malformed_is_null(spark):
    # no scheme -> NULL (visible to a downstream filter), not pass-through
    assert _canon(spark, ["example.com/a", "not a url", ""]) == [None, None, None]


def test_registrable_domain(spark):
    cases = [
        ("https://a.b.example.com/x", "example.com"),
        ("https://news.example.CO.UK/x", "example.co.uk"),
        ("https://user.github.io/repo", "user.github.io"),
        ("https://localhost/x", "localhost"),
        ("https://example.com/x", "example.com"),
    ]
    df = spark.createDataFrame(cases, ["url", "want"])
    rows = df.select(registrable_domain("url").alias("got"), "want").collect()
    for r in rows:
        assert r.got == r.want, (r.got, r.want)


def test_url_host_strips_port_and_www(spark):
    df = spark.createDataFrame([("https://WWW.Ex.COM:8443/p?q=1",)], ["url"])
    assert df.select(url_host("url")).first()[0] == "ex.com"


@pytest.fixture()
def url_docs(spark):
    rows = [
        (i, f"https://site{i % 5}.example.com/p/{i}") for i in range(100)
    ]
    return spark.createDataFrame(rows, ["doc_id", "url"])


def test_per_domain_cap_respects_cap(spark, url_docs):
    out = per_domain_cap(url_docs, "url", cap=3)
    counts = out.groupBy("__domain").count().collect()
    # all five hosts share the registrable domain example.com
    assert len(counts) == 1 and counts[0]["count"] == 3


def test_per_domain_cap_distinct_domains(spark):
    rows = [(i, f"https://d{i % 4}.co.uk/p/{i}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = per_domain_cap(df, "url", cap=5)
    counts = {r["__domain"]: r["count"] for r in out.groupBy("__domain").count().collect()}
    assert counts == {f"d{k}.co.uk": 5 for k in range(4)}


def test_per_domain_cap_salted_equals_unsalted(spark, url_docs):
    plain = sorted(r.doc_id for r in per_domain_cap(url_docs, "url", cap=7).collect())
    salted = sorted(
        r.doc_id
        for r in per_domain_cap(url_docs, "url", cap=7, salt_buckets=8).collect()
    )
    assert plain == salted


def test_per_domain_cap_deterministic(spark, url_docs):
    a = sorted(r.doc_id for r in per_domain_cap(url_docs, "url", cap=3).collect())
    b = sorted(r.doc_id for r in per_domain_cap(url_docs, "url", cap=3).collect())
    assert a == b


def test_per_domain_cap_rejects_bad_cap(spark, url_docs):
    with pytest.raises(ValueError):
        per_domain_cap(url_docs, "url", cap=0)


def test_with_registrable_domain_psl_table(spark):
    """Table-driven PSL longest-match (round-5): a suffix absent from
    the embedded subset (com.sg) becomes its own eTLD+1; a 3-label
    suffix (pref.aichi.jp) beats its 2-label prefix; unknown TLDs fall
    back to the prevailing last-2 rule — all via broadcast joins."""
    from etl_cli_spark.operators.urls import (
        fixture_public_suffixes,
        with_registrable_domain,
    )

    psl = spark.createDataFrame([(s,) for s in fixture_public_suffixes()], ["suffix"])
    rows = [
        (1, "https://forum.example.com.sg/x"),
        (2, "http://www.Example.CO.UK/y"),
        (3, "https://a.b.site.pref.aichi.jp/z"),
        (4, "https://deep.sub.example.com/q"),
        (5, "https://example.unknowntld/r"),
        (6, "https://host/s"),  # single-label host stays itself
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = with_registrable_domain(df, "url", suffixes=psl)
    got = {r.doc_id: r.domain for r in out.collect()}
    assert got == {
        1: "example.com.sg",
        2: "example.co.uk",
        3: "site.pref.aichi.jp",
        4: "example.com",
        5: "example.unknowntld",
        6: "host",
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AQE prints initial+final plan sections; both must broadcast
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan

    # embedded-expression path unchanged when no table is given
    no_tab = with_registrable_domain(df, "url")
    assert {r.doc_id: r.domain for r in no_tab.collect()}[1] == "com.sg"


def test_per_domain_cap_with_psl_table(spark):
    """com.sg hosts cap per REGISTRABLE domain with the table, instead
    of merging under the 'com.sg' pseudo-domain the embedded subset
    would produce."""
    from etl_cli_spark.operators.urls import fixture_public_suffixes, per_domain_cap

    psl = spark.createDataFrame([(s,) for s in fixture_public_suffixes()], ["suffix"])
    rows = [(i, f"https://site{i % 2}.com.sg/p/{i}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    capped = per_domain_cap(df, "url", cap=3, suffixes=psl, domain_col="domain")
    counts = {r.domain: r["count"] for r in capped.groupBy("domain").count().collect()}
    assert counts == {"site0.com.sg": 3, "site1.com.sg": 3}
    merged = per_domain_cap(df, "url", cap=3, domain_col="domain")
    assert merged.count() == 3  # embedded subset: one pseudo-domain


def test_domain_blocklist_filter_drops_listed_etld1(spark):
    """Blocklisting works at the REGISTRABLE-domain level: every host
    under a listed eTLD+1 drops (subdomains included), unlisted domains
    survive, and the anti-join broadcasts the list."""
    from etl_cli_spark.operators.urls import domain_blocklist_filter

    rows = [
        (1, "https://spam.example.com/a"),
        (2, "https://www.sub.spam.example.com/b"),   # subdomain of listed
        (3, "https://good.example.org/c"),
        (4, "http://another.net/d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("example.com",)], ["domain"])
    out = domain_blocklist_filter(df, "url", bl)
    kept = sorted((r.doc_id, r.domain) for r in out.collect())
    assert kept == [(3, "example.org"), (4, "another.net")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
