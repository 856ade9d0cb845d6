"""The driver-signed correctness window is a DESIGNED artifact.

The driver's per-round `CORRECTNESS_r{N}.json` records only the FIRST 50
`queries()` entries (observed rounds 1-7).  Round 7 showed what happens
when the window accretes instead of being designed: five new in-window
queries silently displaced the whole write/sketch/manifest block past
slot 50 and those families lost driver certification for a round.

These tests pin the round-13 designed layout:

- slot 1 is the permanent core-surface pin;
- EVERY family digest lives inside the window (so a hash-match on the
  digest re-certifies each member's full values every round);
- the exact 50-slot membership is asserted, so adding a query inside
  the window forces the author to name the casualty here — no silent
  displacement;
- every digest member is declared at positions 51+ (individually
  judge-verifiable) and carries a canonicalization spec;
- round 13 (VERDICT r12 item 1): EVERY declared query is either
  in-window or a member of an in-window digest family — the driver
  re-signs the whole declared surface every round, with no standalone
  escape hatch for out-of-window queries.

No SparkSession needed: pure layout assertions.
"""

from __future__ import annotations

import __spark_entry__ as entry

WINDOW = 50

# The designed window (round 13).  Editing this list is the deliberate
# act the round-7 verdict asked for: to add a query inside the window,
# replace a named slot and say why in the commit.
EXPECTED_WINDOW = [
    # slot 1: permanent core-surface pin
    "core_surface_digest",
    # reference core families via digests
    "dsl_digest",
    "sql_shapes_digest",
    "agg_digest",
    "join_window_digest",
    "merger_digest",
    "write_digest",
    # manifest / commit-log family
    "write_upsert_manifest",
    "manifest_time_travel",
    "manifest_changefeed",
    "manifest_stats_prune",
    "manifest_read_asof",
    # sketches / layout / sources / streaming-analog
    "sketch_digest",
    "zorder_roundtrip",
    "http_bulk_source",
    "incremental_loop",
    "stream_interval_join",
    "graph_pagerank",
    # events + URL curation (round-13: url_digest certifies
    # canonicalize + domain_cap + blocklist in domain_cap's old slot;
    # canonicalize stays directly in-window — deliberate double
    # certification, like the core pin)
    "events_sessionize",
    "events_top_paths",
    "url_canonicalize",
    "url_digest",
    # LLM-pipeline extension families via digests
    "text_digest",
    "dedup_exact",
    "dedup_digest",
    "similarity_digest",
    "multimodal_digest",
    "sampling_digest",
    # pipeline ops certified individually in-window (round 13 folded
    # the span pair into spans_digest and the bpe pair into bpe_digest,
    # freeing the two slots the jobops/ingest digests occupy)
    "token_budget_sample",
    "leakage_split",
    "epoch_shuffle",
    "training_shards",
    "chunk_documents",
    "pack_sequences",
    "pack_token_ids",
    "decontaminate",
    "bloom_decontaminate",
    "spans_digest",
    "paragraph_dedup",
    "dsir_select",
    "rank_vocab",
    "rank_scores",
    "tokenize_documents",
    "search_bm25_indexed",
    "bpe_digest",
    "quality_classifier",
    "pipeline_end_to_end",
    "pipeline_streaming",
    # round-13 families for the formerly driver-unsigned singles
    "jobops_digest",
    "ingest_digest",
]


def test_window_is_exactly_the_designed_layout():
    names = list(entry.queries())
    assert names[:WINDOW] == EXPECTED_WINDOW


def test_core_pin_is_slot_one():
    assert next(iter(entry.queries())) == "core_surface_digest"


def test_every_family_digest_is_inside_the_window():
    names = list(entry.queries())
    window = set(names[:WINDOW])
    digests = [n for n in names if n.endswith("_digest")]
    assert digests, "no digests declared?"
    missing = [d for d in digests if d not in window]
    assert not missing, f"family digests outside the driver window: {missing}"


def test_families_registry_matches_declared_digests():
    """_FAMILIES is the single source of truth tying each digest to its
    member list (Spark digest functions, oracle digest build, and these
    layout checks all read it)."""
    names = set(entry.queries())
    declared_digests = {n for n in names if n.endswith("_digest")}
    assert declared_digests == set(entry._FAMILIES), (
        "new digest without a _FAMILIES entry (or vice versa): "
        f"{declared_digests ^ set(entry._FAMILIES)}"
    )


def test_digest_members_are_declared_and_speced():
    """Each digest member must (a) stay declared in queries() so the
    judge can replay it individually, and (b) carry a canonicalization
    spec so the composite hash is well-defined."""
    names = set(entry.queries())
    for dig, members in entry._FAMILIES.items():
        assert members, f"{dig} has an empty family"
        for m in members:
            assert m in names, f"{dig} member {m} not declared in queries()"
            assert m in entry._DIGEST_SPECS, f"{dig} member {m} has no spec"


def test_every_digest_has_an_oracle():
    sql = entry.oracle_sql()
    for n in entry.queries():
        if n.endswith("_digest"):
            assert n in sql, f"digest {n} missing oracle SQL"


def test_driver_signs_every_declared_query():
    """Round-13 invariant (VERDICT r12 item 1): window ∪ digest-members
    == queries().  Every declared query is either one of the 50
    driver-recorded entries or a member of a family whose digest is
    in-window — so a green CORRECTNESS row exists for ALL of them every
    round, not just for whoever re-runs the full oracle gate.  There is
    deliberately no standalone escape hatch: a new out-of-window query
    that joins no family fails here."""
    names = list(entry.queries())
    window = set(names[:WINDOW])
    members = set()
    for ms in entry._FAMILIES.values():
        members.update(ms)
    unsigned = set(names) - window - members
    assert not unsigned, (
        "queries with NO driver-signed green row (not in-window, not in "
        f"any digest family): {sorted(unsigned)} — add each to a family "
        "in _FAMILIES (with a _DIGEST_SPECS entry) or name the window "
        "slot it replaces"
    )
    stale = members - set(names)
    assert not stale, f"family members that no longer exist: {sorted(stale)}"


def test_no_query_is_double_counted_across_families():
    """A member belongs to at most one family besides the permanent
    core pin (whose re-certification overlap is the point)."""
    seen: dict[str, str] = {}
    dupes = []
    for dig, ms in entry._FAMILIES.items():
        if dig == "core_surface_digest":
            continue  # deliberate overlap: the permanent core pin
        for m in ms:
            if m in seen:
                dupes.append((m, seen[m], dig))
            seen[m] = dig
    assert not dupes, f"members in two families: {dupes}"
