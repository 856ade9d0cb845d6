"""Randomized cross-engine differential for the text-operator oracles.

The driver gate proves Spark == DuckDB on the FIXED fixture corpus; a
regex-dialect divergence (Java vs RE2) or a list-semantics edge could
still hide in inputs the fixture never produces. This test reuses the
production contract end to end — the real ``queries()`` entries and
their real ``oracle_sql()`` twins — over SEEDED random documents
(newlines, bullets, ellipses, '#' runs, accents, repeated lines, empty
lines, long words), written to a scratch ``documents.parquet`` and
registered as the DuckDB view, then compares row count, columns, and
the gate's own order-insensitive value hash.

Kept deterministic (one fixed seed) so a failure is reproducible, and
scoped to the document-only text queries so the scratch table needs
just (doc_id, lang, text, source).
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import __spark_entry__ as entry
from check_oracle import frame_hash

# text queries whose inputs are (doc_id, lang, text[, source]) only
DIFFERENTIAL_QUERIES = [
    "gopher_quality",
    "gopher_repetition",
    "c4_quality",
    "script_profile",
    "split_sentences",
    "chunk_sentences",
    "html_extract",
    "html_links",
    "text_pii_scrub",
    "perplexity_buckets",
]

_WORDS = (
    "the and of to with that have be alpha beta gamma delta kilo "
    "zebra quux lorem ipsum data spark join window shuffle "
    "internationalization a I x42 99 #tag javascript {curly} badtok "
    "Жук мир 漢字 한글 ελλάς سلام"
).split()
_DECOR = ["\n", "\n\n", " - ", " • ", "... ", "… ", " # ", "  ", "\t", ". ", "! ", "? ", "é ", "ü ", ".\r\n"]


def _random_docs(n: int = 60, seed: int = 20260816):
    rng = random.Random(seed)
    langs = ["en", "fr", "de", "zh", "es"]
    rows = []
    for i in range(n):
        parts = []
        for _ in range(rng.randint(3, 60)):
            parts.append(rng.choice(_WORDS))
            if rng.random() < 0.25:
                parts.append(rng.choice(_DECOR).strip("\0"))
        text = " ".join(parts)
        if rng.random() < 0.3:  # planted duplicate lines
            text += "\nrepeat me\nrepeat me"
        if rng.random() < 0.2:  # trailing ellipsis line
            text += "\ntrails off..."
        rows.append((i, rng.choice(langs), text, "fuzz"))
    return rows


@pytest.fixture(scope="module")
def scratch_docs(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("textdiff")
    rows = _random_docs()
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string"
    ).coalesce(1).write.parquet(str(tmp / "documents.parquet"))
    return str(tmp)


@pytest.mark.parametrize("name", DIFFERENTIAL_QUERIES)
def test_text_oracle_holds_on_random_documents(spark, scratch_docs, name):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{scratch_docs}/documents.parquet/*.parquet'"
    )
    sdf = entry.queries()[name](spark, scratch_docs)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.sql(entry.oracle_sql()[name])
    ocols = [c for c in res.columns]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), name
    assert len(srows) == len(orows), (name, len(srows), len(orows))
    assert frame_hash(sdf.columns, srows) == frame_hash(ocols, orows), (
        f"{name}: Spark and DuckDB diverge on randomized documents"
    )
