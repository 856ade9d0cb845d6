"""The driver-signed correctness window is a DESIGNED artifact.

The driver's per-round `CORRECTNESS_r{N}.json` records only the FIRST 50
`queries()` entries (observed rounds 1-7).  Round 7 showed what happens
when the window accretes instead of being designed: five new in-window
queries silently displaced the whole write/sketch/manifest block past
slot 50 and those families lost driver certification for a round.

These tests pin the round-8 designed layout:

- slot 1 is the permanent core-surface pin;
- EVERY family digest lives inside the window (so a hash-match on the
  digest re-certifies each member's full values every round);
- the exact 50-slot membership is asserted, so adding a query inside
  the window forces the author to name the casualty here — no silent
  displacement;
- every digest member is declared at positions 51+ (individually
  judge-verifiable) and carries a canonicalization spec.

No SparkSession needed: pure layout assertions.
"""

from __future__ import annotations

import __spark_entry__ as entry

WINDOW = 50

# The designed window (round 8).  Editing this list is the deliberate
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
    # events + URL curation
    "events_sessionize",
    "events_top_paths",
    "url_canonicalize",
    "url_domain_cap",
    # LLM-pipeline extension families via digests
    "text_digest",
    "dedup_exact",
    "dedup_digest",
    "similarity_digest",
    "multimodal_digest",
    "sampling_digest",
    # pipeline ops with no family digest
    "token_budget_sample",
    "leakage_split",
    "epoch_shuffle",
    "training_shards",
    "chunk_documents",
    "pack_sequences",
    "pack_token_ids",
    "decontaminate",
    "bloom_decontaminate",
    "strip_repeated_spans",
    "strip_spans_indexed",
    "paragraph_dedup",
    "dsir_select",
    "rank_vocab",
    "rank_scores",
    "tokenize_documents",
    "search_bm25_indexed",
    "bpe_train",
    "bpe_encode",
    "quality_classifier",
    "pipeline_end_to_end",
    "pipeline_streaming",
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


def test_digest_members_are_declared_and_speced():
    """Each digest member must (a) stay declared in queries() so the
    judge can replay it individually, and (b) carry a canonicalization
    spec so the composite hash is well-defined."""
    names = set(entry.queries())
    families = {
        "core_surface_digest": entry._CORE_FAMILY,
        "dsl_digest": entry._DSL_FAMILY,
        "sql_shapes_digest": entry._SQL_FAMILY,
        "agg_digest": entry._AGG_FAMILY,
        "join_window_digest": entry._JOINWIN_FAMILY,
        "merger_digest": entry._MERGER_FAMILY,
        "write_digest": entry._WRITE_FAMILY,
        "sketch_digest": entry._SKETCH_FAMILY,
        "multimodal_digest": entry._MULTIMODAL_FAMILY,
        "sampling_digest": entry._SAMPLING_FAMILY,
        "text_digest": entry._TEXT_FAMILY,
        "dedup_digest": entry._DEDUP_FAMILY,
        "similarity_digest": entry._SIMILARITY_FAMILY,
    }
    declared_digests = {n for n in names if n.endswith("_digest")}
    assert declared_digests == set(families), (
        "new digest without a family entry here (or vice versa): "
        f"{declared_digests ^ set(families)}"
    )
    for dig, members in families.items():
        for m in members:
            assert m in names, f"{dig} member {m} not declared in queries()"
            assert m in entry._DIGEST_SPECS, f"{dig} member {m} has no spec"


def test_every_digest_has_an_oracle():
    sql = entry.oracle_sql()
    for n in entry.queries():
        if n.endswith("_digest"):
            assert n in sql, f"digest {n} missing oracle SQL"


# Queries certified INDIVIDUALLY (in-window or by the judge's
# out-of-window replay), not through a family digest.  Round-9 guard
# (r8 verdict item 8): a NEW query must land either in a family spec
# or in this list — otherwise coverage accounting (COVERAGE.md, the
# per-round digest re-certification argument) silently lags the code.
STANDALONE = {
    # manifest / commit-log
    "write_upsert_manifest", "manifest_time_travel", "manifest_changefeed",
    "manifest_stats_prune", "manifest_read_asof", "zorder_roundtrip",
    # sources / orchestration / streaming-analog
    "http_bulk_source", "http_source_feed", "http_merger_url",
    "http_target_post", "backend_roundtrip", "incremental_loop",
    "stream_interval_join", "wildcard_union", "async_job_status",
    "target_write_log", "settings_roundtrip", "tmap_conform",
    "batch_size_files", "catalog_ops", "preview_info", "today_macro",
    "profile_orders",
    # write-op edge contracts outside write_digest
    "write_skipts_pkdedupe", "write_overwrite_fields", "write_selfupdate",
    "write_dry_run",
    # DSL edge contract outside dsl_digest
    "dsl_exists_size_mod",
    # events / graph / timeseries
    "graph_pagerank", "events_sessionize", "events_top_paths",
    "events_sessionize_hot", "ts_gap_fill", "window_running_sum",
    # URL curation
    "url_canonicalize", "url_domain_cap",
    # LLM-pipeline ops certified individually
    "dedup_exact", "token_budget_sample", "leakage_split", "epoch_shuffle",
    "training_shards", "chunk_documents", "chunk_sentences", "pack_sequences",
    "pack_token_ids", "decontaminate", "bloom_decontaminate",
    "strip_repeated_spans", "strip_spans_indexed", "strip_spans_compacted",
    "paragraph_dedup",
    "dsir_select", "rank_vocab", "rank_scores", "tokenize_documents",
    "search_bm25_indexed", "bpe_train", "bpe_encode",
    "quality_classifier", "pipeline_end_to_end", "pipeline_streaming",
    "pipeline_declarative",
}


def test_every_query_is_family_member_or_standalone():
    """Exhaustive partition of queries(): digest rows + family members +
    the explicit STANDALONE list, nothing unaccounted and nothing
    declared that no longer exists."""
    names = set(entry.queries())
    digests = {n for n in names if n.endswith("_digest")}
    members = set()
    for spec_name in dir(entry):
        if spec_name.endswith("_FAMILY") and spec_name.startswith("_"):
            members.update(getattr(entry, spec_name))
    unaccounted = names - digests - members - STANDALONE
    assert not unaccounted, (
        "new queries not covered by any family digest and not declared "
        f"standalone: {sorted(unaccounted)} — add each to a *_FAMILY "
        "spec (preferred: digest re-certification every round) or to "
        "STANDALONE here, and update COVERAGE.md"
    )
    stale = STANDALONE - names
    assert not stale, f"STANDALONE lists queries that no longer exist: {sorted(stale)}"
    overlap = STANDALONE & members
    assert not overlap, (
        f"queries both in a family and STANDALONE: {sorted(overlap)}"
    )
