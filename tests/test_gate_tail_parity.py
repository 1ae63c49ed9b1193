"""Oracle parity for registry entries past the driver's gate window.

The driver's correctness gate records only the first 50 ``queries()``
entries (observed in round 5: 53 registered, 50 in
CORRECTNESS_r05.json).  Entries past that window would otherwise go
unwitnessed between rounds, so this test runs the SAME comparison the
driver does — row count + column names + order-insensitive value hash
against the DuckDB oracle — for every tail entry, at sf0.001 so the
whole sweep stays cheap inside the unit-test suite.

scripts/check_parity.py remains the full-registry harness; this test
pins the tail subset into ``pytest tests/`` so a regression in a
demoted query fails CI even though the driver file no longer lists it.
"""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
DRIVER_GATE_WINDOW = 50

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v!r}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return repr(v)


def _tail_names():
    return list(entrymod.queries())[DRIVER_GATE_WINDOW:]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _tail_names())
def test_tail_entry_matches_oracle(spark, duck, name):
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    srows = sdf.collect()
    if name not in oracles:
        pytest.skip(f"{name} has no SQL oracle (rows-only check)")
    cur = duck.execute(oracles[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} "
        f"duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{name}: rowcount spark={len(srows)} duck={len(drows)}"
    )
    scols = sorted(sdf.columns)
    sidx = [sdf.columns.index(c) for c in scols]
    didx = [dcols.index(c) for c in scols]
    sset = sorted(tuple(_norm(r[i]) for i in sidx) for r in srows)
    dset = sorted(tuple(_norm(r[i]) for i in didx) for r in drows)
    assert sset == dset, f"{name}: value mismatch"


# The always-gated core: each entry is the sole witness of a mechanism
# no sibling covers.  It rides the standing 2-round cadence: gated r10,
# demoted for r11's never-witnessed backlog, restored for r12 (the
# R12_HEAD pin below enforces the restoration — the rotation the r11
# verdict's ask #1 and the cadence test below both hardcode).
ALWAYS_GATED_CORE = {
    # §2 query surface (one witness per reference query function;
    # parameter-branch siblings — intraday, tw-linear — may rotate)
    "q1_bucket_avg", "q2_resolution_avg", "q3_daily_max",
    "q4_mode_adaptive", "q5_timeweight_locf", "q6_asap_smooth",
    "q6_lttb_downsample", "q7_unique_subjects", "q8_changed_rows",
    "q9_state_intervals",
    # temporal extensions
    "asof_probe_value", "range_overlap_join", "gapfill_linear",
    # ingest surface
    "ingest_events_unpivot", "ingest_glow", "ingest_homie",
    "ingest_emon", "ingest_bmw", "ingest_dynamic",
    "ingest_records_strict", "ingest_router_union",
    # dedup / similarity primaries (each rotated-out sibling —
    # components_keep, embedding_cosine, ann_lsh, ivf — has a gated
    # witness of its mechanism this round; see the registry's
    # rotation ledger)
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "sim_cosine_topk",
    # text / curation / packing (quality-score family witnessed by
    # whichever variant is currently gated; vocab + fingerprint have
    # no rotating sibling)
    "text_fingerprint", "text_vocab_topk", "pack_documents",
    "curation_pii_redact", "curation_decontaminate",
    "curation_repetition",
    # multimodal
    "mm_blob_features", "mm_frame_sample", "mm_resize",
}


# The planned r15 gate head (ROTATION.md / registry ledger), pinned
# EXACTLY so an accidental reorder cannot silently change what the
# driver witnesses.  The r14 build round registered the two BPE
# entries but was interrupted before composing the r15 window, so the
# minimal recovery head is the r14 head with the two NEVER-WITNESSED
# additions (text_bpe_merges / text_bpe_token_count) swapped in for
# the two SIBLING-EXEMPT salted variants (q8/q9_..._salted — gated
# green r14; their mechanism is witnessed by q8/q9_changed_rows per
# scripts/rotation_ledger.py SIBLING_WITNESS).
R15_HEAD = [
    "pipeline_curation_full",
    "pipeline_curation_report",
    "dedup_minhash_autoband",
    "events_quantile_bands_gk",
    "text_bpe_merges",
    "text_bpe_token_count",
    "asof_probe_value_salted",
    "q1_bucket_avg",
    "q2_resolution_avg",
    "q3_daily_max",
    "q4_mode_adaptive",
    "q5_timeweight_locf",
    "q6_asap_smooth",
    "q6_lttb_downsample",
    "q7_unique_subjects",
    "q8_changed_rows",
    "q9_state_intervals",
    "asof_probe_value",
    "range_overlap_join",
    "gapfill_linear",
    "ingest_events_unpivot",
    "ingest_glow",
    "ingest_homie",
    "ingest_emon",
    "ingest_bmw",
    "ingest_dynamic",
    "ingest_records_strict",
    "ingest_router_union",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_fingerprint",
    "text_vocab_topk",
    "pack_documents",
    "curation_pii_redact",
    "curation_decontaminate",
    "curation_repetition",
    "mm_blob_features",
    "mm_frame_sample",
    "mm_resize",
    "rel_revenue_by_nation",
    "rel_shipmode_priority",
    "events_journey_trigrams",
    "dedup_substr_clean",
    "pipeline_dedup_full",
    "emb_random_projection",
    "dedup_semantic_default",
    "sketch_kmv_overlap",
    "curation_normalize",
]

# Historical r13 head (kept for the demotion-pool registration test).
R13_HEAD = [
    # (a) the 4 NEW never-driver-witnessed r13 entries
    "events_quantile_bands_gk",
    "sketch_bloom_stream_twin",
    "sketch_join_profile",
    "sim_rrf_fusion",
    # (b) the 2 re-gates under the default-call config (r12 verdict
    # ask #1)
    "mm_phash_neardup",
    "mm_phash_keep",
    # (c) the full 45-entry since-3 pool (ROTATION.md queue order)
    "text_bm25_topk",
    "sample_dsir_topn",
    "curation_gopher_quality",
    "sample_token_budget",
    "events_anomaly_mad",
    "sample_temperature_mix",
    "dedup_pagerank",
    "text_word_entropy",
    "dedup_cross_source",
    "rel_revenue_rollup",
    "dedup_corpus_diff",
    "rel_cross_nation_volume",
    "rel_order_distribution",
    "rel_top_supplier",
    "rel_small_qty_revenue",
    "layout_zorder_profile",
    "rollup_upsert_value",
    "docs_global_enumerate",
    "docs_wfq_interleave",
    "events_trending_topk",
    "rel_forecast_revenue",
    "rel_market_share",
    "rel_nation_profit",
    "rel_important_parts",
    "rel_dominant_suppliers",
    "rel_idle_customers",
    "dedup_substr_spans",
    "rel_cheapest_supplier",
    "rel_priority_late",
    "rel_no_return_customers",
    "rel_promo_share",
    "rel_supplier_variety",
    "rel_disjunctive_revenue",
    "cluster_kmeans",
    "cluster_balanced_sample",
    "sketch_hll_portable",
    "sketch_hll_union",
    "sketch_cms_counts",
    "dedup_jaccard_prefix",
    "dedup_semantic_keep",
    "text_quality_logit",
    "text_bigrams_topk",
    "text_bigram_lm",
    "sketch_histogram",
]

# Historical r12 head (kept for the demotion-pool registration test).
R12_HEAD = [
    # (a) the 2 NEW never-driver-witnessed r12 entries
    "dedup_cdc_gear",
    "dedup_stream_cdc_twin",
    # (b) the restored always-gated core (green r10, due r12)
    "q1_bucket_avg",
    "q2_resolution_avg",
    "q3_daily_max",
    "q4_mode_adaptive",
    "q5_timeweight_locf",
    "q6_asap_smooth",
    "q6_lttb_downsample",
    "q7_unique_subjects",
    "q8_changed_rows",
    "q9_state_intervals",
    "asof_probe_value",
    "range_overlap_join",
    "gapfill_linear",
    "ingest_events_unpivot",
    "ingest_glow",
    "ingest_homie",
    "ingest_emon",
    "ingest_bmw",
    "ingest_dynamic",
    "ingest_records_strict",
    "ingest_router_union",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_fingerprint",
    "text_vocab_topk",
    "pack_documents",
    "curation_pii_redact",
    "curation_decontaminate",
    "curation_repetition",
    "mm_blob_features",
    "mm_frame_sample",
    "mm_resize",
    # (c) the 11 most-overdue demotions (r8-green)
    "dedup_substr_windows",
    "events_cohort_retention",
    "events_funnel",
    "events_live_intervals",
    "sample_docs_weighted",
    "sample_source_quota",
    "rel_large_orders",
    "rel_returned_revenue",
    "text_token_stats",
    "text_language_id",
    "text_quality_sample_cut",
    # (d) the round's 3 later never-witnessed additions (they
    # displaced the planned r9-pool promotions and text_bm25_topk —
    # green r9, the least overdue of group (c) — which now leads r13)
    "sketch_bloom_probe",
    "events_quantile_bands",
    "sketch_join_size",
]

_OLD_R9_HEAD_DEMOTIONS = [
    "text_bm25_topk", "sample_dsir_topn", "curation_gopher_quality",
    "sample_token_budget", "events_anomaly_mad",
    "sample_temperature_mix",
    "dedup_pagerank", "text_word_entropy", "dedup_cross_source",
    "rel_revenue_rollup",
    "dedup_corpus_diff",
    "rel_cross_nation_volume", "rel_order_distribution",
    "rel_top_supplier", "rel_small_qty_revenue",
    "layout_zorder_profile", "rollup_upsert_value",
    "docs_global_enumerate", "docs_wfq_interleave",
    "events_trending_topk", "rel_forecast_revenue",
    "rel_market_share", "rel_nation_profit", "rel_important_parts",
    "rel_dominant_suppliers", "rel_idle_customers",
    "dedup_substr_spans",
    "rel_cheapest_supplier", "rel_priority_late",
    "rel_no_return_customers",
    "rel_promo_share", "rel_supplier_variety",
    "rel_disjunctive_revenue", "cluster_kmeans",
    "cluster_balanced_sample", "sketch_hll_portable",
    "sketch_hll_union", "sketch_cms_counts", "dedup_jaccard_prefix",
    "dedup_semantic_keep", "text_quality_logit", "text_bigrams_topk",
    "text_bigram_lm", "sketch_histogram", "rel_revenue_by_nation",
]


def test_gate_head_matches_r15_rotation_plan():
    """The driver's 50-entry window holds exactly the planned r15
    head: the r14 window with the two never-witnessed BPE additions
    swapped in for the two sibling-exempt salted variants (see the
    R15_HEAD comment above)."""
    head = list(entrymod.queries())[:DRIVER_GATE_WINDOW]
    assert head == R15_HEAD, (
        f"gate head drifted from the r15 plan: "
        f"{[(i, a, b) for i, (a, b) in enumerate(zip(head, R15_HEAD)) if a != b][:5]}"
    )


def test_gate_head_guard_rejects_bad_lists():
    """queries()'s registration guard (r13 ADVICE + r14 review): a
    misspelled, duplicated, or wrong-length head list must raise at
    registration rather than silently sliding tail entries into the
    driver's witnessed window.  Exercised by monkeypatching the live
    head list and restoring it."""
    import pytest

    good = list(entrymod._R15_HEAD)
    try:
        entrymod._R15_HEAD[:] = good[:-1] + ["no_such_entry"]
        with pytest.raises(RuntimeError, match="not in registry"):
            entrymod.queries()
        entrymod._R15_HEAD[:] = good[:-1] + [good[0]]  # duplicate
        with pytest.raises(RuntimeError, match="unique"):
            entrymod.queries()
        entrymod._R15_HEAD[:] = good[:-1]  # 49 entries
        with pytest.raises(RuntimeError, match="50"):
            entrymod.queries()
    finally:
        entrymod._R15_HEAD[:] = good
    assert list(entrymod.queries())[:DRIVER_GATE_WINDOW] == good


def test_rotation_ledger_has_no_drift():
    """scripts/rotation_ledger.py is the generated table of record
    (VERDICT r10 ask #7 — the r10 prose ledger drifted); its invariant
    — every never-driver-witnessed entry sits inside the current gate
    head — must hold at every commit, not just at round end."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "rotation_ledger",
        os.path.join(
            os.path.dirname(__file__), "..", "scripts", "rotation_ledger.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rows, latest, stale = mod.build_table()
    bad = [
        r["entry"] for r in rows if r["never_witnessed"] and not r["in_head"]
    ]
    assert not bad, f"never-witnessed entries outside the gate head: {bad}"


def test_core_witness_cadence_holds():
    """Every always-gated-core entry is either inside the current gate
    head or earned a driver-green row in one of the last TWO committed
    CORRECTNESS artifacts — matching the documented 2-round cadence
    (core gated r10, r12, r14, ...).  r13 verdict "what's wrong" #1:
    the previous form scanned only the SINGLE latest artifact, so the
    suite flipped red the moment the driver's off-cadence artifact
    landed (r11, r13, ...) even though nothing was overdue.  Scanning
    two artifacts keeps the tripwire honest: a core entry absent from
    the head AND from both of the last two driver rounds is genuinely
    past the cadence and still hard-fails."""
    import glob
    import json
    import re as _re

    head = set(list(entrymod.queries())[:DRIVER_GATE_WINDOW])
    arts = sorted(
        glob.glob(
            os.path.join(
                os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"
            )
        ),
        key=lambda p: int(_re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    assert arts, "no CORRECTNESS artifacts committed"
    artifacts = []
    for path in arts[-2:]:
        with open(path) as f:
            artifacts.append(json.load(f))
    overdue = _core_overdue(head, artifacts)
    assert not overdue, f"core entries past the 2-round cadence: {overdue}"


def _core_overdue(head, artifacts):
    """Core entries absent from the gate head AND from every artifact
    in ``artifacts`` (the last two committed driver rounds)."""
    green_recent = set()
    for art in artifacts:
        green_recent |= {
            k for k, v in art.items()
            if isinstance(v, dict) and v.get("hash_match")
        }
    return sorted(ALWAYS_GATED_CORE - set(head) - green_recent)


def test_core_cadence_tripwire_simulation():
    """The two failure modes the r13 verdict distinguished, pinned as
    plain-data simulations so the live test's semantics can't drift:

    - OFF-CADENCE DROP: core gated in round N (green artifact), round
      N+1's artifact gates other entries — the tripwire must stay
      GREEN because the core is inside the two-artifact lookback.
    - MISSED ROTATION: two consecutive artifacts without the core and
      a head that doesn't restore it — the tripwire must FIRE.
    """
    core_green = {k: {"hash_match": True} for k in ALWAYS_GATED_CORE}
    other_green = {"some_new_entry": {"hash_match": True}}
    # off-cadence round: core green in N, absent from N+1, not in head
    assert _core_overdue(head=[], artifacts=[core_green, other_green]) == []
    # genuinely missed: absent from BOTH recent artifacts and the head
    assert _core_overdue(head=[], artifacts=[other_green, other_green]) \
        == sorted(ALWAYS_GATED_CORE)
    # ... but restored via the head: green again
    assert _core_overdue(
        head=sorted(ALWAYS_GATED_CORE),
        artifacts=[other_green, other_green],
    ) == []
    # a red row (hash_match falsy) is NOT a witness
    core_red = {k: {"hash_match": False} for k in ALWAYS_GATED_CORE}
    assert _core_overdue(head=[], artifacts=[core_red, other_green]) \
        == sorted(ALWAYS_GATED_CORE)


def test_rotated_out_entries_stay_registered_with_oracles():
    """Every rotated-out entry (r9-head demotions, r7/r8 demotion
    pools) must stay registered and oracle-backed so the tail
    parametrization keeps witnessing it until its next head rotation."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    r11_head_demotions = {
        "dedup_stream_neardup_twin", "events_cusum_alarms",
        "dedup_cdc_chunks", "events_markov_transitions",
        "events_interarrival", "layout_range_partition",
        "sample_cv_folds", "mm_phash_neardup", "events_winsorize",
        "events_xcorr", "events_cube_counts", "mm_phash_keep",
        "events_basket_pmi", "events_skew_profile", "events_attribution",
        "dedup_winnowing", "text_tfidf_topk", "dedup_winnow_keep",
        "events_seasonal_decompose", "sketch_heavy_hitters",
        "events_seasonal_anomaly", "sample_leakage_split",
        "events_phase_outliers", "dedup_graph_triangles",
        "dedup_edit_distance", "sketch_hll_rolling",
        "dedup_evidence_report", "emb_pca_project",
        "asof_probe_value_salted",
    }
    rotated_pool = set(_OLD_R9_HEAD_DEMOTIONS) | r11_head_demotions \
        | set(R13_HEAD) | {
        "q3_intraday_avg", "q5_timeweight_linear",
        "q3_daily_from_cascade", "dedup_components",
        "dedup_ngram_jaccard", "text_quality_sample_cut",
        "text_language_id", "text_token_stats",
        "rel_returned_revenue", "rel_large_orders",
        "sample_source_quota", "sample_docs_weighted",
        "events_live_intervals", "events_cohort_retention",
        "events_funnel", "dedup_substr_windows",
        "dedup_components_keep", "dedup_embedding_cosine",
        "sim_ann_lsh", "sim_ivf_topk", "text_quality_score",
        "pipeline_clean_corpus", "text_quality_percentile",
        "sample_docs_fraction", "sketch_distinct", "sketch_percentile",
        "toolkit_counter_delta", "toolkit_heartbeat",
        "events_sessionize_native", "rel_pricing_summary",
        "rel_top_orders", "text_unigram_lm",
    }
    for name in rotated_pool:
        assert name in qs, f"rotated-out entry {name} left the registry"
        assert name in oracles, f"rotated-out entry {name} lost its oracle"
