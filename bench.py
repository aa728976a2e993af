#!/usr/bin/env python
"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full distributed
execution, no driver-side collect cost in the measurement).  The headline
set spans every operator family: scan+agg, star join, window, set-op,
text, LSH dedup, vector search, time windows.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_warehouse_hive_spark.registry import load_all
from data_warehouse_hive_spark.session import get_spark

HEADLINE = [
    "q_groupby_agg",       # flagship TPC-H Q1 shape
    "q_stats_profile",     # single-pass column profile
    "q_join_multiway",     # 5-table star join
    "q_join_inner",        # fact-dim row-level join
    "q_win_rownum",        # ranking windows
    "q_win_frame_rows",    # frame aggregates
    "q_topk_per_group",    # per-group top-k
    "q_topk",              # global top-k (TakeOrderedAndProject)
    "q_union_all",         # set op
    "q_fn_string",         # scalar-function projection throughput
    "q_text_stats",        # corpus profiling
    "q_text_fingerprint",  # md5 fingerprints
    "q_dedup_exact",       # exact dedup
    "q_dedup_minhash",     # MinHash LSH candidate pairs
    "q_sim_search",        # brute-force top-k cosine
    "q_time_tumbling",     # event-time windows
    "q_time_session_gap",  # sessionization
]

# Timed and reported separately — NOT summed into the headline total, so the
# headline metric stays round-over-round comparable.  These are the two plans
# most likely to regress under changes: iterative label propagation
# (driver-loop + localCheckpoint) and hyperplane-LSH bucketed vector search.
SECONDARY = [
    "q_dedup_groups",
    "q_sim_search_lsh",
    # round 3: the composed curation funnel (multi-stage single-plan) and
    # the LSH-bucket self-join k-NN graph — the two new heaviest plans
    "q_curate_e2e",
    "q_embed_knn",
    # round 15 (r14 VERDICT task 2): a deliberately COMPUTE-heavy scaling
    # canary.  Every headline op is fixed-overhead-bound at sf0.1 (0.01-0.7s,
    # all-broadcast pruned plans), so the driver's 8-core/32-core per-query
    # ratios are structurally ≈1 and cannot distinguish "cores ignored" from
    # "nothing left to parallelize".  q_stats_bootstrap (×20 replicate md5
    # fan-out over the spread orders scan) IS core-bound; its seconds are
    # surfaced in the stdout line as `scaling_canary` so both the 32-core and
    # the low-core artifacts carry a ratio that CAN move.  Secondary entries
    # never sum into the headline `value`, so cross-round comparability of
    # the contract metric is untouched.
    "q_stats_bootstrap",
]

# round 4: the TPC-H-derived decision-support suite (operators/tpch.py),
# timed as its own group so multi-join plan regressions are visible
# without perturbing the headline total.
TPCH = [
    "q_tpch_q01",
    "q_tpch_q02",
    "q_tpch_q03",
    "q_tpch_q04",
    "q_tpch_q05",
    "q_tpch_q06",
    "q_tpch_q07",
    "q_tpch_q08",
    "q_tpch_q09",
    "q_tpch_q10",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q22",
]

# round 4: retrieval / clustering / graph extensions — the new heaviest
# plans (posting joins, iterative loops), timed as their own group.
EXT_R4 = [
    "q_text_bm25",
    "q_retrieval_hybrid",
    "q_text_tfidf",
    "q_embed_kmeans",
    "q_graph_pagerank",
    "q_basket_pairs",
]

# round-4 continuation: candidate-graph analytics, sketching, quantized
# vector search, chunk dedup — its own group so EXT_R4's total stays
# comparable round-over-round.
EXT_R4B = [
    "q_graph_triangles",
    "q_graph_jaccard",
    "q_dedup_survivor",
    "q_dedup_chunks",
    "q_agg_countmin",
    "q_sim_search_int8",
    "q_embed_hashing",
    "q_events_lifecycle",
]

# round-4 continuation (second wave): statistical analytics, interval
# algebra, sequence matching, incremental dedup — its own group so the
# earlier totals stay comparable round-over-round.
EXT_R4C = [
    "q_stats_regression",
    "q_agg_moments",
    "q_time_overlap_merge",
    "q_events_seqmatch",
    "q_dedup_incremental",
    "q_events_cohort_ltv",
    "q_win_frame_time",
]

# round-4 continuation (fourth wave): the heaviest of the new retrieval /
# dedup-calibration / custom-operator plans.
EXT_R4D = [
    "q_dedup_lsh_tuning",
    "q_agg_heavy_hitters",
    "q_sim_mmr",
    "q_text_js_drift",
    "q_recs_similar_items",
    "q_text_phrase_search",
    "q_join_spatial_grid",
]

# round-4 continuation (fifth wave): LM scoring, declarative PCA,
# clustering eval, bootstrap CI — the final batch's heaviest plans.
EXT_R4E = [
    "q_text_lm_score",
    "q_embed_pca",
    "q_embed_cluster_purity",
    "q_stats_bootstrap",
    "q_dedup_semantic_sweep",
    "q_events_replays",
    "q_sample_balanced",
]

# round 5: nonparametric stats, centrality, diversity, Bloom audit,
# range search — the new batch's heaviest plans, own group so earlier
# totals stay comparable.
EXT_R5 = [
    "q_stats_mannwhitney",
    "q_stats_mutual_info",
    "q_text_simpson",
    "q_dedup_bloom",
    "q_graph_closeness",
    "q_sim_threshold_search",
    "q_win_cumsum_reset",
]

# round 5 (second wave): rank statistics, contamination matrix, artifact
# detection, datacard rollups.
EXT_R5B = [
    "q_stats_spearman",
    "q_stats_cohens_d",
    "q_text_artifacts",
    "q_corpus_datacard",
    "q_dedup_quality_profile",
    "q_text_crossdoc_overlap",
]

# round 5 (third wave): PQ/ADC search, Matryoshka eval, EWMA, IQR gate.
EXT_R5C = [
    "q_sim_search_pq",
    "q_embed_matryoshka",
    "q_events_ewma",
    "q_dq_outlier_iqr",
    "q_sql_grouping_id",
]

# round 5 (fourth wave): coreset sampling, drift monitoring, survival,
# boilerplate census.
EXT_R5D = [
    "q_sample_kcenters",
    "q_embed_centroid_drift",
    "q_stats_kaplan_meier",
    "q_text_boilerplate",
]

# round 5 (fifth wave): OHLC rollup, CUSUM, blocked record linkage.
EXT_R5E = [
    "q_events_ohlc",
    "q_events_cusum",
    "q_er_blocked_linkage",
]

# round 5 (sixth wave): DQ audits + profiling maps.
EXT_R5F = [
    "q_dq_uniqueness",
    "q_dq_enum_domain",
    "q_stats_anova",
    "q_dq_referential",
    "q_dq_double_charge",
    "q_events_heatmap",
    "q_text_link_density",
]

# round 5 (seventh wave): SCD2 consumption, experiment guards, decile
# concentration, reciprocity.
EXT_R5G = [
    "q_scd2_lookup",
    "q_sim_multiprobe",
    "q_graph_kcore",
    "q_sim_ndcg",
    "q_dedup_savings",
    "q_events_value_bands",
    "q_events_ab_srm",
    "q_graph_reciprocity",
    "q_orders_ltv_deciles",
    "q_events_gap_histogram",
]

# round 5 (final wave): vocabulary growth, sweep-line concurrency,
# cluster geometry, graph structure, contrastive mining.
EXT_R5H = [
    "q_text_heaps",
    "q_events_concurrency",
    "q_embed_davies_bouldin",
    "q_graph_assortativity",
    "q_embed_hard_negatives",
    "q_orders_revenue_bridge",
]


# round 6: diagnostics extensions — changepoint, heavy-tail, robust trend,
# novelty, bloom prefilter, share shift, embedding-dimension health.
EXT_R6 = [
    "q_events_changepoint",
    "q_events_powerlaw",
    "q_stats_theil_sen",
    "q_text_ngram_novelty",
    "q_join_bloom",
    "q_orders_share_shift",
    "q_embed_dim_profile",
    "q_graph_labelprop",
    "q_sim_recall_pq",
    "q_join_asof_nearest",
    "q_graph_modularity",
    "q_text_lm_kn",
    "q_events_lateness",
    "q_stats_wilson",
    "q_graph_hits",
    "q_events_peaks",
    "q_stats_welch_t",
    "q_win_rolling_median",
    "q_fn_map_ops",
    "q_stats_ratio_ci",
]


# round 6b: eval metrics, sketch set-ops, inference-in-scan, SQL sugar.
EXT_R6B = [
    "q_events_periodogram",
    "q_events_markov_entropy",
    "q_dq_schema_drift",
    "q_time_downsample_m4",
    "q_sim_mrr",
    "q_sim_map",
    "q_embed_silhouette",
    "q_agg_kmv",
    "q_stats_permutation",
    "q_orders_repeat_rate",
    "q_sql_qualify",
    "q_sql_distinct_on",
    "q_fn_struct_ops",
    "q_quality_classifier",
    "q_curate_dsir",
    "q_graph_sssp",
]


# round 6c: band join, joint outliers, drawdown, dialect surface, funnel.
EXT_R6C = [
    "q_join_band",
    "q_join_natural",
    "q_dq_multivariate_outlier",
    "q_orders_drawdown",
    "q_sql_script_transform",
    "q_sql_groupby_ordinal",
    "q_stats_pacf",
    "q_events_burstiness",
    "q_text_hapax",
    "q_events_funnel_deadline",
]


# round 6d: binary-signature ANN, IVF tuning curve, coverage + variance tests.
EXT_R6D = [
    "q_sim_search_hamming",
    "q_sim_ivf_sweep",
    "q_text_oov_rate",
    "q_stats_levene",
    "q_stats_seasonal_strength",
]


# round 6e: BPE pair counts, PRF expansion, Neyman sampling, random walks.
EXT_R6E = [
    "q_text_bpe_pairs",
    "q_retrieval_prf",
    "q_sample_neyman",
    "q_graph_random_walk",
]


# round 6f: GROUPS frames, QQ deciles, index health.
EXT_R6F = [
    "q_win_frame_groups",
    "q_stats_qq_deciles",
    "q_embed_index_stats",
]


# round 6g: token-budget curation, RAKE, power planning.
EXT_R6G = [
    "q_curate_token_budget",
    "q_text_rake",
    "q_stats_power",
]


# round 6h: experimentation completeness (CUPED, FDR).
EXT_R6H = [
    "q_events_ab_cuped",
    "q_stats_fdr_bh",
]


# round 6i: mergeable sampling, fulfillment, robust bands, community NMI.
EXT_R6I = [
    "q_sample_reservoir",
    "q_orders_fulfillment",
    "q_win_rolling_mad",
    "q_graph_nmi",
    "q_split_leakage_safe",
]

EXT_R7 = [
    "q_stats_kruskal",
    "q_stats_friedman",
    "q_stats_jarque_bera",
    "q_stats_runs_test",
    "q_stats_brier",
    "q_stats_grubbs",
    "q_stats_kendall_tau",
    "q_events_hurst",
]

EXT_R7B = [
    "q_stats_ljung_box",
    "q_stats_durbin_watson",
    "q_stats_mcnemar",
    "q_stats_cochran_q",
    "q_stats_page_trend",
    "q_events_odds_ratio",
    "q_text_distinctive_terms",
    "q_curate_pareto_frontier",
    "q_mix_anneal",
    "q_orders_newsvendor",
    "q_embed_knn_accuracy",
    "q_stats_boxplot",
    "q_stats_tost",
    "q_orders_price_elasticity",
]

# round 8: registry ids the r7 bench lists missed (ADVICE) + the new
# normality op the bartlett docstring cites.
EXT_R8 = [
    "q_stats_bartlett",
    "q_stats_mood_median",
    "q_stats_anderson_darling",
    # eval-family representative so the family's cold cost shows up in
    # first_run at all (r7 verdict item 5)
    "q_sim_recall",
    "q_text_bpe_merge",
]

# round 8 batch B: EDF/omnibus normality completion, BPE encode,
# cross-doc span audit, embedding isotropy.
EXT_R8B = [
    "q_stats_cvm",
    "q_stats_lilliefors",
    "q_stats_dagostino",
    "q_text_bpe_encode",
    "q_dedup_crossdoc_spans",
    "q_embed_isotropy",
]

# round 8 batch C: rank-score tests (Acklam probit), sequential drift,
# LM retrieval.
EXT_R8C = [
    "q_stats_fligner",
    "q_stats_vanderwaerden",
    "q_events_page_hinkley",
    "q_text_dirichlet_ql",
]

# round 8 batch D: two-sample scale, interval union, inventory grid,
# hub eccentricity.
EXT_R8D = [
    "q_stats_ansari_bradley",
    "q_time_interval_union",
    "q_orders_xyz_class",
    "q_graph_eccentricity",
]

# round 8 batch E: vocab-growth law, density curve, extreme-value fit.
EXT_R8E = [
    "q_text_heaps_law",
    "q_events_kde",
    "q_stats_extreme_value",
]

# round 8 batch F: cascade ANN, surprisal filter, M4 decimation.
EXT_R8F = [
    "q_sim_rerank_cascade",
    "q_text_unigram_surprisal",
    "q_time_m4_downsample",
]

# round 8 batch G: audience overlap + row-pattern matching (the
# watermark-drop id is ddl_* behavioral, driver-checked not benched).
EXT_R8G = [
    "q_events_audience_overlap",
    "q_win_pattern_vshape",
]

# round 8 batch H: ANOVA post-hoc + lexical burstiness.
EXT_R8H = [
    "q_stats_tukey_hsd",
    "q_text_term_burstiness",
]

# round 8 batch I: rank post-hoc, dup source flows, key discovery.
EXT_R8I = [
    "q_stats_dunn",
    "q_dedup_source_matrix",
    "q_dq_key_discovery",
]

# round 8 batch J: ordered-trend + segmented-regression causal readouts.
EXT_R8J = [
    "q_stats_cochran_armitage",
    "q_events_interrupted_ts",
]

# round 8 batch K: agreement, stylometry, FD discovery.
EXT_R8K = [
    "q_stats_cohens_kappa",
    "q_text_burrows_delta",
    "q_dq_functional_deps",
]

# round 8 batch L: forecast scorecard + retention decay fit.
EXT_R8L = [
    "q_events_forecast_eval",
    "q_events_retention_halflife",
]

# round 8 batch M: robust-ANOVA family completion.
EXT_R8M = [
    "q_stats_brown_forsythe",
    "q_stats_welch_anova",
]

# round 8 batch N: LSH cost guard + bimodality screen.
EXT_R8N = [
    "q_dedup_bucket_stats",
    "q_stats_bimodality",
]

# round 8 batch O: predicate-aware vector search.
EXT_R8O = [
    "q_sim_filtered_search",
]


# round 9: suffix-ordering substring dedup + NN-descent kNN refinement.
EXT_R11 = [
    "q_sql_scripting",
    "q_sql_scripting_for",
    "ddl_minhash_index_persist",
]

# round 12: hot-bucket-capped LSH candidate generation (r11 VERDICT
# task 1).
EXT_R12 = [
    "q_dedup_minhash_capped",
    "q_fn_sql_udtf",
]

EXT_R13 = [
    "ddl_aqe_skew_join",
    "q_media_fingerprint",
]

EXT_R14 = [
    "q_media_dims",
]

EXT_R10 = [
    "q_orders_decompose",
    "q_embed_knn_refine2",
    "q_dedup_binary_simhash",
    "q_graph_betweenness_approx",
    "ddl_knn_index_persist",
    "q_stats_wasserstein",
    "q_stats_energy_distance",
    "q_orders_anomaly_stl",
    "ddl_stream_binary_simhash",
    "q_stats_jackknife_ratio",
    "q_stats_conformal",
    "q_orders_did",
    "q_win_cume_dist",
]

EXT_R9 = [
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
]


# ---------------------------------------------------------------------------
# Process isolation (round 9, r8 VERDICT task 1).
#
# Through round 8 the whole bench ran in ONE JVM: a 556-op warmup followed by
# 41 timed groups.  Heap/codegen-cache/GC pressure accumulated with every
# round's added ops and landed on whichever groups ran mid-suite — r8's
# in-bench totals for byte-identical r5-era code doubled (ext_r5 5.60→11.05s)
# while the judge's fresh-process re-runs showed no regression.  Group totals
# were no longer cross-round comparable.
#
# Now each ROUND-COHORT runs in its own subprocess with the same recipe the
# judge used for isolation re-runs: fresh JVM → warm ONLY that cohort's ops
# at sf0.001 → best-of-2 at the target SF.  A cohort's contents freeze when
# its round ends and new rounds add new cohorts (new children), so a cohort's
# JVM-age profile is CONSTANT round-over-round — the totals are comparable
# again.  memoized_cold accounting stays per child: each child pays and
# records its own cold build in first_run.
# ---------------------------------------------------------------------------

GROUP_LISTS: list[tuple[str, list[str]]] = [
    ("queries", HEADLINE),
    ("secondary", SECONDARY),
    ("tpch", TPCH),
    ("ext_r4", EXT_R4),
    ("ext_r4b", EXT_R4B),
    ("ext_r4c", EXT_R4C),
    ("ext_r4d", EXT_R4D),
    ("ext_r4e", EXT_R4E),
    ("ext_r5", EXT_R5),
    ("ext_r5b", EXT_R5B),
    ("ext_r5c", EXT_R5C),
    ("ext_r5d", EXT_R5D),
    ("ext_r5e", EXT_R5E),
    ("ext_r5f", EXT_R5F),
    ("ext_r5g", EXT_R5G),
    ("ext_r5h", EXT_R5H),
    ("ext_r6", EXT_R6),
    ("ext_r6b", EXT_R6B),
    ("ext_r6c", EXT_R6C),
    ("ext_r6d", EXT_R6D),
    ("ext_r6e", EXT_R6E),
    ("ext_r6f", EXT_R6F),
    ("ext_r6g", EXT_R6G),
    ("ext_r6h", EXT_R6H),
    ("ext_r6i", EXT_R6I),
    ("ext_r7", EXT_R7),
    ("ext_r7b", EXT_R7B),
    ("ext_r8", EXT_R8),
    ("ext_r8b", EXT_R8B),
    ("ext_r8c", EXT_R8C),
    ("ext_r8d", EXT_R8D),
    ("ext_r8e", EXT_R8E),
    ("ext_r8f", EXT_R8F),
    ("ext_r8g", EXT_R8G),
    ("ext_r8h", EXT_R8H),
    ("ext_r8i", EXT_R8I),
    ("ext_r8j", EXT_R8J),
    ("ext_r8k", EXT_R8K),
    ("ext_r8l", EXT_R8L),
    ("ext_r8m", EXT_R8M),
    ("ext_r8n", EXT_R8N),
    ("ext_r8o", EXT_R8O),
    ("ext_r9", EXT_R9),
    ("ext_r10", EXT_R10),
    ("ext_r11", EXT_R11),
    ("ext_r12", EXT_R12),
    ("ext_r13", EXT_R13),
    ("ext_r14", EXT_R14),
]

COHORTS: list[tuple[str, list[str]]] = [
    ("headline", ["queries", "secondary"]),
    ("tpch", ["tpch"]),
    ("r4", ["ext_r4", "ext_r4b", "ext_r4c", "ext_r4d", "ext_r4e"]),
    ("r5", ["ext_r5", "ext_r5b", "ext_r5c", "ext_r5d", "ext_r5e",
            "ext_r5f", "ext_r5g", "ext_r5h"]),
    ("r6", ["ext_r6", "ext_r6b", "ext_r6c", "ext_r6d", "ext_r6e",
            "ext_r6f", "ext_r6g", "ext_r6h", "ext_r6i"]),
    ("r7", ["ext_r7", "ext_r7b"]),
    ("r8", ["ext_r8", "ext_r8b", "ext_r8c", "ext_r8d", "ext_r8e",
            "ext_r8f", "ext_r8g", "ext_r8h", "ext_r8i", "ext_r8j",
            "ext_r8k", "ext_r8l", "ext_r8m", "ext_r8n", "ext_r8o"]),
    ("r9", ["ext_r9"]),
    ("r10", ["ext_r10"]),
    ("r11", ["ext_r11"]),
    ("r12", ["ext_r12"]),
    ("r13", ["ext_r13"]),
    ("r14", ["ext_r14"]),
]

MEMOIZED_COLD_IDS = (
    "q_embed_kmeans",
    "q_embed_cluster_purity",
    "q_graph_labelprop",
    "q_graph_modularity",
    "q_dedup_minhash",
    "q_text_bpe_merge",
    "q_text_bpe_encode",
    "q_dedup_groups",
    "q_graph_degree",
    "q_graph_eccentricity",
    "q_split_leakage_safe",
    "q_dedup_source_matrix",
    "q_graph_nmi",
    "q_sim_recall",
    "q_sim_mrr",
    "q_sim_map",
    "q_sim_ndcg",
    "q_rank_fusion_per_query",
    # r9: _KNN_CACHE consumers (init graph / refined graph / exact graph)
    "q_embed_knn_refine",
    "q_embed_knn_recall_lift",
)


def _force(df) -> int:
    """Execute the full plan distributed; returns row count via a cheap
    count over the cached-free plan (noop write when available)."""
    try:
        df.write.format("noop").mode("overwrite").save()
        return -1
    except Exception:
        return df.count()


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


# _cpu_probe() wall-seconds on this host at full machine speed — the
# r13 calibration constant (SCALING.md).  Normalized totals divide by
# (measured probe / this), converting "the host was 1.8× slow" into a
# number instead of an adjudication essay (r13 VERDICT task 3).
PROBE_FULL_SPEED_SEC = 0.31


def _probe_ratio(probes) -> float | None:
    """Mean of a cohort's bracketing probe times ÷ full-speed constant:
    1.0 = full machine speed, 2.0 = host ran everything 2× slow."""
    vals = [
        p for p in (probes or [])
        if isinstance(p, (int, float)) and p > 0
    ]
    if not vals:
        return None
    return round((sum(vals) / len(vals)) / PROBE_FULL_SPEED_SEC, 3)


def _cpu_probe() -> float:
    """Fixed single-core busy-loop (10M integer adds) timed in seconds —
    a machine-throughput calibration recorded per cohort child.  The r12
    artifact showed byte-identical code swinging 2.3× UNIFORMLY across a
    cohort (every op scaled by the same factor) with load_avg near idle:
    whole-host throughput varies (co-tenant/frequency effects loadavg
    cannot see).  A cohort whose ops all scale by ~(probe/0.31) is the
    environment, not a regression; a single op moving alone is code."""
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i
    return round(time.perf_counter() - t0, 4)


def run_cohort(cohort: str, out_path: str) -> None:
    """Child-process entry: bench ONE round-cohort in a fresh JVM.

    Same recipe the r8 judge used for isolation re-runs — warm only this
    cohort's plans at sf0.001 (whole-stage codegen caches on generated
    source, which depends on the plan, not the data volume), touch the
    target-SF parquet metadata, then best-of-2 each op at the target SF."""
    from data_warehouse_hive_spark.registry import load_all
    from data_warehouse_hive_spark.session import get_spark
    from data_warehouse_hive_spark.tables import TABLES, table_path

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    groups = dict(GROUP_LISTS)
    group_keys = dict(COHORTS)[cohort]
    spark = get_spark(app_name=f"dwh-spark-bench-{cohort}")
    registry = load_all()

    for gkey in group_keys:
        for name in groups[gkey]:
            _force(registry[name].fn(spark, "/root/testdata/sf0.001"))
    for name in TABLES:
        spark.read.parquet(table_path(sf_dir, name)).schema

    first_run: dict[str, float] = {}

    # Headline runs best-of-3 (r11 VERDICT task 7): the committed
    # headline total is the round-over-round comparison number, and on
    # this shared host best-of-2 left a 48% gap between the committed
    # artifact and the same-code isolated best.  One extra run of the
    # 17 headline ops costs ~10 s and tightens exactly the number that
    # gets compared; the 570+ extension ops stay best-of-2.
    # r13 (r12 VERDICT task 2): tpch promoted to best-of-3 too — its
    # 22-query total is the other cross-round comparison number, and the
    # r12 artifact showed a 2.2× load-noise swing on untouched code.
    n_runs = 3 if cohort in ("headline", "tpch") else 2

    def timed(name: str) -> float:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            _force(registry[name].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        first_run[name] = round(runs[0], 3)
        return round(min(runs), 3)

    out: dict = {
        "groups": {},
        "first_run": first_run,
        "load_avg_start": [round(x, 2) for x in os.getloadavg()],
        "best_of": n_runs,
        # r14 VERDICT task 2: PROVE the core count to the driver.
        # $SPARK_GRAFT_CPUS flows through session.get_spark into
        # master("local[N]"); defaultParallelism is the session's actual
        # scheduling width, read back from the live SparkContext — if the
        # env were ignored this would not move between the driver's
        # 32-core and 8-core bench invocations.
        "cpus_effective": spark.sparkContext.defaultParallelism,
        "cpu_probe_start_sec": _cpu_probe(),
    }
    for gkey in group_keys:
        g = {name: timed(name) for name in groups[gkey]}
        if gkey not in ("queries", "secondary"):
            g["total"] = round(sum(g.values()), 3)
        out["groups"][gkey] = g
    out["cpu_probe_end_sec"] = _cpu_probe()
    with open(out_path, "w") as f:
        json.dump(out, f)


def main() -> None:
    """Parent orchestrator: run each round-cohort in a fresh subprocess
    and merge the per-child JSON into the same output shape as before
    (bench_result.json detail + one compact stdout line)."""
    import subprocess
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)
    here = os.path.abspath(__file__)

    merged_groups: dict[str, dict] = {}
    first_run: dict[str, float] = {}
    cohort_sec: dict[str, float] = {}
    cohort_load: dict[str, list[float]] = {}
    cohort_best_of: dict[str, int] = {}
    cohort_cpus_effective: dict[str, int | None] = {}
    cohort_cpu_probe: dict[str, list] = {}
    load_avg_start = [round(x, 2) for x in os.getloadavg()]
    for cohort, _gkeys in COHORTS:
        fd, out_path = tempfile.mkstemp(
            prefix=f"bench_{cohort}_", suffix=".json"
        )
        os.close(fd)  # child writes the path; we only needed safe creation
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, here, "--cohort", cohort, "--out", out_path],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE,
        )
        cohort_sec[cohort] = round(time.perf_counter() - t0, 1)
        if proc.returncode != 0 or os.path.getsize(out_path) == 0:
            tail = proc.stderr.decode(errors="replace")[-4000:]
            raise RuntimeError(
                f"bench cohort {cohort!r} failed (rc={proc.returncode}):\n{tail}"
            )
        with open(out_path) as f:
            child = json.load(f)
        os.unlink(out_path)
        merged_groups.update(child["groups"])
        first_run.update(child["first_run"])
        cohort_load[cohort] = child.get("load_avg_start", [])
        cohort_best_of[cohort] = child.get("best_of", 2)
        cohort_cpus_effective[cohort] = child.get("cpus_effective")
        cohort_cpu_probe[cohort] = [
            child.get("cpu_probe_start_sec"),
            child.get("cpu_probe_end_sec"),
        ]

    timings = merged_groups["queries"]
    total = round(sum(timings.values()), 3)
    secondary = merged_groups["secondary"]

    # ---- probe-normalized totals + prev-round deltas (r13 task 3) ----
    group_to_cohort = {g: c for c, gs in COHORTS for g in gs}
    cohort_ratio = {
        c: _probe_ratio(p) for c, p in cohort_cpu_probe.items()
    }

    def _ratio_for(group: str) -> float | None:
        cohort = (
            "headline" if group == "headline" else group_to_cohort[group]
        )
        return cohort_ratio.get(cohort)

    group_totals: dict[str, float] = {"headline": total}
    for gkey, _ops in GROUP_LISTS:
        if gkey not in ("queries", "secondary"):
            group_totals[gkey] = merged_groups[gkey]["total"]
    group_totals_normalized = {
        g: (round(tot / r, 3) if (r := _ratio_for(g)) else None)
        for g, tot in group_totals.items()
    }

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_result.json"
    )
    # prev snapshot = the COMMITTED bench_result.json from the last
    # round's final run (read before this run overwrites it) — it
    # carries its own probes, so both sides of the delta normalize
    prev_round_delta: dict = {}
    try:
        with open(detail_path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        prev = None
    if prev:
        prev_ratio = {
            c: _probe_ratio(p)
            for c, p in (prev.get("cohort_cpu_probe_sec") or {}).items()
        }
        prev_totals: dict[str, float] = {"headline": prev.get("value")}
        for gkey, _ops in GROUP_LISTS:
            if gkey not in ("queries", "secondary"):
                g = prev.get(gkey)
                if isinstance(g, dict) and "total" in g:
                    prev_totals[gkey] = g["total"]
        for g, cur in group_totals.items():
            pv = prev_totals.get(g)
            if not pv:
                continue
            cohort = (
                "headline" if g == "headline" else group_to_cohort[g]
            )
            pr = prev_ratio.get(cohort)
            pn = round(pv / pr, 3) if pr else pv
            cn = group_totals_normalized[g] or cur
            prev_round_delta[g] = {
                "prev": pv,
                "cur": cur,
                "delta_pct": round((cur - pv) / pv * 100.0, 1),
                "prev_normalized": pn,
                "cur_normalized": cn,
                "delta_pct_normalized": round(
                    (cn - pn) / pn * 100.0, 1
                ),
            }
    # the one-number regression summary: groups whose PROBE-NORMALIZED
    # total moved >20% round-over-round (an op moving alone is code;
    # everything scaling together is environment, and normalization
    # already divided that out)
    flagged = {
        g: d["delta_pct_normalized"]
        for g, d in prev_round_delta.items()
        if d["delta_pct_normalized"] > 20.0
    }

    full = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "secondary": secondary,
    }
    for gkey, _ops in GROUP_LISTS:
        if gkey not in ("queries", "secondary"):
            full[gkey] = merged_groups[gkey]
    full.update(
        {
            "sf": sf,
            "n_queries": len(timings),
            "first_run": first_run,
            "isolation": "per-cohort subprocess (fresh JVM, cohort-only "
            "sf0.001 warmup, best-of-2 at target SF; headline and tpch "
            "best-of-3) — r8 VERDICT task 1 / r11 task 7 / r12 task 2",
            "cohort_wall_sec": cohort_sec,
            # per-cohort best-of-N, machine-readable (r12 ADVICE: the
            # child's best_of used to be dropped at merge time, leaving
            # only the prose isolation string to say which timings were
            # best-of-3 vs best-of-2)
            "cohort_best_of": cohort_best_of,
            # per-cohort-child defaultParallelism read from the live
            # SparkContext (r14 VERDICT task 2: the scaling block could
            # not tell "env ignored" from "overhead-bound queries")
            "cohort_cpus_effective": cohort_cpus_effective,
            # machine-throughput calibration bracketing each cohort
            # (fixed 10M-add busy loop, seconds; ~0.31 s on this host at
            # full speed).  A cohort whose ops ALL scale by probe-ratio
            # is environment throughput, not a code regression (r13
            # finding: byte-identical ext_r4 measured 10.7 s and 25.0 s
            # same-day at near-idle load_avg — loadavg alone cannot
            # explain same-code swings; this probe can).
            "cohort_cpu_probe_sec": cohort_cpu_probe,
            # Noise context travels IN the artifact (r11 VERDICT task 7):
            # 1-min/5-min/15-min load average at run start, parent-level
            # and per-cohort-child, plus the measured same-code variance
            # band so round-over-round readers stop false-flagging.
            "load_avg": load_avg_start,
            "cohort_load_avg": cohort_load,
            "noise_note": "same-code headline totals vary ±25% on this "
            "shared host (7.9–12.8 s across rounds on identical code; "
            "three same-day isolated runs of r11 code measured "
            "6.01/7.24/7.85 s) — compare the probe-NORMALIZED totals "
            "(group_totals_normalized / prev_round_delta), which divide "
            "out measured host throughput, before flagging regressions",
            # r13 task 3: normalization as numbers in the artifact —
            # total ÷ (cohort probe / 0.31) — plus per-group deltas vs
            # the previous committed bench_result.json, both sides
            # normalized by their own recorded probes
            "probe_full_speed_sec": PROBE_FULL_SPEED_SEC,
            "cohort_probe_ratio": cohort_ratio,
            "group_totals": group_totals,
            "group_totals_normalized": group_totals_normalized,
            "prev_round_delta": prev_round_delta,
            "regressions_normalized_gt20pct": flagged,
            # moved here from stdout when the line hit the 2000-char
            # tail budget (see below)
            "memoized_cold": {
                name: first_run[name]
                for name in MEMOIZED_COLD_IDS
                if name in first_run
            },
            # queries whose build step runs a bounded fixpoint
            # driver-side (collect of a capped relation + local
            # iteration, per the q_embed_pca precedent): their timings
            # include that driver work, and the returned DataFrame
            # embeds precomputed literals rather than re-executing a
            # distributed plan (r6 advice note)
            "driver_side_build": [
                n for n in ("q_graph_hits", "q_embed_pca") if n in first_run
            ],
        }
    )
    # Full detail → disk (round-over-round comparison must never depend
    # on how much stdout tail a log capture keeps — BENCH_r04.json came
    # back parsed:null from exactly that truncation)…
    with open(detail_path, "w") as f:
        json.dump(full, f, indent=1)
    # …and ONE compact line on stdout with the driver-contract keys
    # (metric/value/unit/queries/sf) plus the normalized summaries.
    # HARD BUDGET: the driver records only the LAST 2000 stdout chars,
    # and a line longer than that loses its head → parsed:null (it
    # happened to BENCH_r04 via log tailing and again to BENCH_r13 when
    # this line quietly outgrew the window).  Raw per-group totals,
    # memoized_cold, the full delta table etc. live in
    # bench_result.json; stdout carries the contract keys + the two
    # normalized summaries r13 task 3 asked for, trimmed to fit.
    # one number when every cohort child saw the same width (the normal
    # case — children inherit the env), else the full map so a skew is
    # visible rather than averaged away
    _cpus_vals = {v for v in cohort_cpus_effective.values() if v}
    cpus_effective = (
        _cpus_vals.pop() if len(_cpus_vals) == 1 else cohort_cpus_effective
    )
    line_obj = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        # r14 VERDICT task 2: the driver benches at two core counts; these
        # two keys let it SEE that the env took effect (cpus_effective =
        # defaultParallelism of the cohort children) and give it one
        # timing that CAN scale with cores (the headline set is
        # overhead-bound at sf0.1; the canary's replicate fan-out is not).
        "cpus_effective": cpus_effective,
        "scaling_canary": {
            "q_stats_bootstrap": secondary.get("q_stats_bootstrap")
        },
        "isolation": "per-cohort-subprocess",
        "load_avg": load_avg_start,
        "probe_full_speed_sec": PROBE_FULL_SPEED_SEC,
        "cohort_probe_ratio": cohort_ratio,
        "group_totals_normalized": {
            g: (round(v, 2) if v is not None else None)
            for g, v in group_totals_normalized.items()
        },
        "regressions_normalized_gt20pct": flagged,
        "detail_file": detail_path,
    }
    line = json.dumps(line_obj)
    if len(line) >= 1990:  # stay inside the tail window, whole line
        for drop in (
            "group_totals_normalized",
            "cohort_probe_ratio",
            "load_avg",
        ):
            line_obj.pop(drop, None)
            line = json.dumps(line_obj)
            if len(line) < 1990:
                break
    print(line)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cohort":
        run_cohort(sys.argv[2], sys.argv[4])
    else:
        main()
