"""SURVEY.md §2 is the normative operator inventory the driver and the
judge audit against; bench.py's group lists are the per-round timing
coverage.  Both must stay in lockstep with the registry — an id that
exists only in code is invisible to the contract (r7 verdict item 1),
and an id missing from the bench lists is never warmed or timed
(r7 ADVICE item 1)."""

from __future__ import annotations

import re
from pathlib import Path

from data_warehouse_hive_spark.registry import load_all

REPO = Path(__file__).resolve().parent.parent


def _survey_ids() -> set[str]:
    """Every id appearing as the first cell of a SURVEY.md table row."""
    ids: set[str] = set()
    for line in (REPO / "SURVEY.md").read_text().splitlines():
        m = re.match(r"\|\s*((?:q|ddl)_\w+)\s*\|", line)
        if m:
            ids.add(m.group(1))
    return ids


def test_survey_matches_registry_exactly():
    registry = set(load_all())
    survey = _survey_ids()
    assert survey == registry, (
        f"SURVEY.md §2 and the registry diverged — "
        f"survey-only: {sorted(survey - registry)}; "
        f"registry-only: {sorted(registry - survey)}"
    )


def test_survey_ids_listed_exactly_once():
    """Every id owns exactly ONE inventory row (r12 verdict task 7:
    q_agg_heavy_hitters used to head rows in both §2.9 and §2.12,
    making naive per-section tallies sum past the registry count).
    Capability cross-references are prose cells, never a second
    id-leading row."""
    from collections import Counter

    counts: Counter[str] = Counter()
    for line in (REPO / "SURVEY.md").read_text().splitlines():
        m = re.match(r"\|\s*((?:q|ddl)_\w+)\s*\|", line)
        if m:
            counts[m.group(1)] += 1
    dupes = {k: v for k, v in counts.items() if v > 1}
    assert not dupes, f"ids listed more than once in SURVEY.md: {dupes}"


def test_bench_lists_resolve_in_registry():
    """bench.py's timing groups are curated samples (headline + TPC-H +
    per-round batches), not the whole registry — but every name they
    time must exist in the registry, or the bench crashes at the target
    SF only (the failure mode ADVICE r7 item 1 warned about when ids
    and lists drift)."""
    import bench

    registry = set(load_all())
    for name, val in vars(bench).items():
        if name.isupper() and isinstance(val, list):
            stale = [v for v in val if isinstance(v, str)]
            missing = sorted(set(stale) - registry)
            assert not missing, f"bench.{name} ids not in registry: {missing}"


def test_round_batch_ids_are_benched():
    """Each round's newly-registered ids must appear in that round's
    bench group so they are warmed and timed (the exact r7 gap:
    bartlett/mood_median were registered but never benched)."""
    import bench

    for qid in (
        "q_stats_bartlett",
        "q_stats_mood_median",
        "q_stats_anderson_darling",
        "q_sim_recall",
        "q_text_bpe_merge",
    ):
        assert qid in bench.EXT_R8, f"{qid} missing from bench.EXT_R8"
    for qid in (
        "q_stats_cvm",
        "q_stats_lilliefors",
        "q_stats_dagostino",
        "q_text_bpe_encode",
        "q_dedup_crossdoc_spans",
        "q_embed_isotropy",
    ):
        assert qid in bench.EXT_R8B, f"{qid} missing from bench.EXT_R8B"
    for qid in (
        "q_stats_fligner",
        "q_stats_vanderwaerden",
        "q_events_page_hinkley",
        "q_text_dirichlet_ql",
    ):
        assert qid in bench.EXT_R8C, f"{qid} missing from bench.EXT_R8C"
    for qid in (
        "q_stats_ansari_bradley",
        "q_time_interval_union",
        "q_orders_xyz_class",
        "q_graph_eccentricity",
    ):
        assert qid in bench.EXT_R8D, f"{qid} missing from bench.EXT_R8D"
    for qid in (
        "q_text_heaps_law",
        "q_events_kde",
        "q_stats_extreme_value",
    ):
        assert qid in bench.EXT_R8E, f"{qid} missing from bench.EXT_R8E"
    for qid in (
        "q_sim_rerank_cascade",
        "q_text_unigram_surprisal",
        "q_time_m4_downsample",
    ):
        assert qid in bench.EXT_R8F, f"{qid} missing from bench.EXT_R8F"
    for qid in (
        "q_events_audience_overlap",
        "q_win_pattern_vshape",
    ):
        assert qid in bench.EXT_R8G, f"{qid} missing from bench.EXT_R8G"
    for qid in (
        "q_stats_tukey_hsd",
        "q_text_term_burstiness",
    ):
        assert qid in bench.EXT_R8H, f"{qid} missing from bench.EXT_R8H"
    for qid in (
        "q_stats_dunn",
        "q_dedup_source_matrix",
        "q_dq_key_discovery",
    ):
        assert qid in bench.EXT_R8I, f"{qid} missing from bench.EXT_R8I"
    for qid in (
        "q_stats_cochran_armitage",
        "q_events_interrupted_ts",
    ):
        assert qid in bench.EXT_R8J, f"{qid} missing from bench.EXT_R8J"
    for qid in (
        "q_stats_cohens_kappa",
        "q_text_burrows_delta",
        "q_dq_functional_deps",
    ):
        assert qid in bench.EXT_R8K, f"{qid} missing from bench.EXT_R8K"
    for qid in (
        "q_events_forecast_eval",
        "q_events_retention_halflife",
    ):
        assert qid in bench.EXT_R8L, f"{qid} missing from bench.EXT_R8L"
    for qid in (
        "q_stats_brown_forsythe",
        "q_stats_welch_anova",
    ):
        assert qid in bench.EXT_R8M, f"{qid} missing from bench.EXT_R8M"
    for qid in (
        "q_dedup_bucket_stats",
        "q_stats_bimodality",
    ):
        assert qid in bench.EXT_R8N, f"{qid} missing from bench.EXT_R8N"
    assert "q_sim_filtered_search" in bench.EXT_R8O


def test_r9_batch_ids_are_benched():
    """Round-9 ids must appear in bench.EXT_R9 (same per-round contract
    the r7/r8 assertions above enforce)."""
    import bench

    for qid in (
        "q_dedup_substring",
        "q_embed_knn_refine",
        "q_embed_knn_recall_lift",
        "q_events_psi",
        "q_events_ccf",
        "q_stats_mann_kendall",
        "q_orders_rfm",
        "q_stats_auc",
        "q_stats_roc_curve",
        "q_stats_reliability_bins",
        "q_text_yules_k",
        "q_sample_bernoulli_hash",
        "q_graph_betweenness",
        "q_events_bitmap_retention",
        "q_text_rank_footrule",
        "q_stats_esd",
        "q_embed_intrinsic_dim",
        "q_orders_seasonal_index",
    ):
        assert qid in bench.EXT_R9, f"{qid} missing from bench.EXT_R9"


def test_r12_batch_ids_are_benched():
    import bench

    for qid in (
        "q_dedup_minhash_capped",
        "q_fn_sql_udtf",
    ):
        assert qid in bench.EXT_R12, f"{qid} missing from bench.EXT_R12"


def test_r13_batch_ids_are_benched():
    import bench

    for qid in ("ddl_aqe_skew_join", "q_media_fingerprint"):
        assert qid in bench.EXT_R13, f"{qid} missing from bench.EXT_R13"


def test_r14_batch_ids_are_benched():
    import bench

    for qid in ("q_media_dims",):
        assert qid in bench.EXT_R14, f"{qid} missing from bench.EXT_R14"


def test_bench_cohorts_partition_groups():
    """The r9 isolation harness (one subprocess per round-cohort) is only
    cross-round comparable if every timing group belongs to EXACTLY one
    cohort — a group in no cohort is silently never benched; a group in
    two runs twice and double-counts."""
    import bench

    groups = [g for g, _ in bench.GROUP_LISTS]
    assigned: list[str] = []
    for _cohort, gkeys in bench.COHORTS:
        assigned.extend(gkeys)
    assert sorted(assigned) == sorted(groups), (
        sorted(set(groups) ^ set(assigned))
    )
    assert len(assigned) == len(set(assigned)), "group in two cohorts"
