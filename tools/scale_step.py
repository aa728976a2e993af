#!/usr/bin/env python
"""Scale-step validation above the driver's largest fixture (r8 VERDICT
task 2): SCALING.md's carrier-overflow table asserts sf10 headroom from
algebra, but through round 8 nothing had ever RUN above sf0.1.  This
tool materializes an sf1-equivalent fixture set (10x the driver's sf0.1)
and re-runs the operators with the TIGHTEST documented carrier bounds
against their DuckDB oracles at that scale — exact-hash, the same
compare the driver applies.

Fixture construction: the driver's generator is not shipped
(TESTDATA.md documents only seed/shape), so sf1 is built by
DETERMINISTIC 10x replication of sf0.1 with key offsets:

  * lineitem + orders: 10 copies, l_orderkey/o_orderkey offset by
    copy_i * OFF (OFF = max orderkey + 1) — join keys stay consistent,
    dim FKs (custkey/partkey/suppkey) unchanged so referential
    integrity holds against the un-replicated dims.
  * events: 10 copies, event_id offset; ts/user/type/value unchanged,
    so per-day and per-type group sizes grow exactly 10x — precisely
    the growth direction the carrier bounds are written against
    (power sums Σx², Σx⁴, rank sums 2n², autocovariance products).
  * documents: 10 copies with doc_id offsets (text unchanged — every
    doc becomes a 10-way exact duplicate, which STRESSES dedup group
    sizes and suffix-tie handling on top of the carrier bounds).
  * embeddings: 10 copies with vec_id offsets (identical vectors →
    cosine-1.0 ties — the tie-break paths get a real workout).
  * dims: byte-copied as-is.

For overflow validation this is BETTER than a true sf1 draw: value
domains (cents < 1e5, 30 days, 5 types) are held fixed while n grows
10x, which is exactly the axis every bound in SCALING.md varies.

Usage:
    python tools/scale_step.py            # build (if absent) + validate
    python tools/scale_step.py --rebuild  # force fixture rebuild
    python tools/scale_step.py --sf10     # 100x sf0.1 for the SF10_OPS subset
    python tools/scale_step.py --text10   # 500k-doc corpus for the text family
    python tools/scale_step.py --embed10  # 20k mutated vectors for the embed family

Writes fixtures to /tmp/sf1_scale (ephemeral; never committed) and
prints one PASS/FAIL line per op plus a JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SRC_DIR = "/root/testdata/sf0.1"
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1_scale")
SF10_DIR = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sf10_scale")
COPIES = 10

# --sf10 mode (r10 VERDICT task 3): a second 10x replication (sf1 →
# sf10) for the ops with the TIGHTEST documented overflow horizons —
# events ≈ 1e7 rows (~2e6/type), lineitem ≈ 60M, orders ≈ 15M,
# embeddings ≈ 200k.  documents is carried over from sf1 UNREPLICATED:
# at 100-way clone density the dedup pair relations go quadratic in
# clone count (16G pairs), which validates nothing about CARRIER bounds
# — the axis sf10 probes is fact-table row growth, and the dedup ops'
# sf1 validation already covers their clone-density axis.
# --text10 mode (r11): the CORPUS axis at sf10 — 500k documents built
# by replicating sf1's 50k docs 10x with a per-copy suffix token
# appended to the text (doc_id offset + ' xq<copy>' mutation), so the
# corpus grows 10x in docs/tokens WITHOUT the 100-way exact-clone
# explosion that would make the pair relations quadratic in clone
# count: each sf0.1 doc now heads a family of ~100 highly-similar but
# DISTINCT texts — realistic near-dup structure at 100x driver scale.
# Other tables are carried over from sf1 (the ops below read only
# documents).
TEXT10_DIR = os.environ.get("SPARK_GRAFT_TEXT10_DIR", "/tmp/sf10_text")
TEXT10_OPS = [
    "q_text_stats",             # corpus profile at 1e8 tokens
    "q_text_yules_k",           # Σm²V HUGEINT/DECIMAL(38) vs 10x vocab mass
    "q_text_unigram_surprisal", # Σ tf·⌊−ln p·1e9⌋ ≈ 2.5e18 — nearest
    #                             BIGINT bound in the text family
    "q_text_heaps_law",         # x9·y9 HUGEINT OLS, ln(toks) at 1e8
    "q_text_zipf",              # rank-frequency OLS on the 10x vocab
    "q_dedup_minhash",          # banded LSH pairs at 500k docs — digest
    #                             comparator above the collect ceiling
    # r12 (r11 VERDICT task 3): the posting-join / nearest-horizon
    # carriers text10 had not yet run
    "q_text_bm25",              # tf·idf carrier joins on the 10x postings
    "q_text_dirichlet_ql",      # smoothed-LM log carriers, corpus cf mass
    "q_text_lm_kn",             # Kneser-Ney continuation counts at 1e8 tok
    "q_decontaminate",          # broadcast eval grams vs the 10x corpus
    "q_dedup_substring",        # suffix-ordering global sort at 1e8 tokens
    # r12 (r11 VERDICT task 1): capped candidate generation — the
    # bounded-workload proof with the skipped-mass audit at 500k docs
    "q_dedup_minhash_capped",
]

# --embed10 mode (r12, r11 VERDICT task 2): the EMBEDDING axis at 10x —
# 20k vectors built by replicating sf0.1's 2,000 vectors 10x with a
# deterministic per-copy perturbation (hash-derived ±0.01 per
# component), so the vector corpus grows 10x WITHOUT the exact-clone
# degeneracy of the sf1/sf10 replication (which collapses kNN/kmeans
# structure: every neighbor list fills with distance-0 clones).  Copy 0
# is the identity, so the base corpus is embedded verbatim.  Other
# tables are carried over from sf0.1 (the ops below read only
# embeddings).  NOTE the corpus-quadratic regimes: the one-table LSH
# bucket join at LSH_BITS=4 is ~n²/16 in-bucket pairs — at 20k vectors
# that is 25M exact dot products (tractable both engines); this is why
# embed10 is a 10x-of-sf0.1 axis, not a 10x-of-sf1 one.
EMBED10_DIR = os.environ.get("SPARK_GRAFT_EMBED10_DIR", "/tmp/sf10_embed")
EMBED10_OPS = [
    "q_embed_isotropy",         # HUGEINT Σe_i·e_j finish at 10x mass
    "q_embed_intrinsic_dim",    # TwoNN over the 256-node eval sample
    "q_embed_kmeans",           # decimal-exact means, 2 Lloyd rounds
    "q_embed_knn",              # one-table LSH graph, 25M in-bucket pairs
    "q_embed_knn_refine",       # 2-table init + NN-descent round
    "q_embed_knn_refine2",      # second descent round composes
    "q_embed_knn_recall_lift",  # recall@k vs exact on the eval sample
    "q_sim_search_pq",          # PQ codebook/ADC carriers at 10x corpus
]

# --stream10 mode (r13, r12 VERDICT task 3): the STREAMING axis — the
# admission ops were the only operator family never taken past fixture
# scale.  Two sub-axes matching the inputs each op streams:
#   events axis (SF10_DIR, 100x sf0.1 events): ddl_stream_dedup,
#     ddl_stream_session — the two STATEFUL streams (watermarked dedup
#     state, session-window merge state).
#   text axis (TEXT10_DIR, 500k docs): ddl_stream_decontaminate,
#     ddl_stream_binary_simhash — the two INDEX-probing streams
#     (stateless foreachBatch against a persisted index).
# Each registered ddl op asserts stream≡batch parity internally, so
# running it at scale IS the parity check.  On top, two instrumented
# probes stream the sf10 events through the same helpers with forced
# micro-batching and read the engine's stateOperators metrics, asserting
# the state-store contract the docstrings claim: state is bounded by
# (arrival rate × watermark horizon) / open-session cardinality — NOT by
# input size.
STREAM10_EVENT_DDLS = ["ddl_stream_dedup", "ddl_stream_session"]
STREAM10_TEXT_DDLS = ["ddl_stream_decontaminate", "ddl_stream_binary_simhash"]


def stream10_state_probes(spark) -> dict:
    """Instrumented state-growth runs over the sf10 events (the
    registered ddls prove CORRECTNESS at scale; these prove the STATE
    CONTRACT).  Forces real micro-batching (maxFilesPerTrigger=2 over a
    16-file landing) so the watermark advances mid-run and eviction is
    observable, then asserts from the engine's own stateOperators
    metrics:

    - dedup (dropDuplicatesWithinWatermark): max state ≈ the cold-start
      batch (watermark still -inf) — ≤ 25% of input for 2/16 files —
      and FINAL state collapses to the 2h watermark horizon, not the
      key universe: ≤ 2×horizon + 2% slack.
    - session (session_window): state = OPEN sessions; final ≤ the
      session output cardinality (never input rows), max ≤ 25% input.
    """
    import tempfile

    from pyspark.sql import functions as F

    from data_warehouse_hive_spark.streaming.stream import (
        read_events_stream,
        sessionized,
        stream_dedup,
    )
    from data_warehouse_hive_spark.tables import t as tbl

    ev = tbl(spark, SF10_DIR, "events")
    n_input = ev.count()
    mx = ev.agg(F.max("ts")).collect()[0][0]
    horizon_rows = ev.filter(
        F.col("ts") >= F.lit(mx) - F.expr("INTERVAL 2 HOURS")
    ).count()

    src = tempfile.mkdtemp(prefix="stream10_src_")
    ev.repartition(16).write.mode("overwrite").parquet(src)

    def run_probe(transform, name: str) -> dict:
        ckpt = tempfile.mkdtemp(prefix=f"stream10_ckpt_{name}_")
        q = (
            transform(read_events_stream(spark, src, max_files_per_trigger=2))
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()
        per_batch = [
            (p["batchId"], so["operatorName"], so["numRowsTotal"])
            for p in q.recentProgress
            for so in (p["stateOperators"] or [])
        ]
        assert per_batch, f"{name}: no stateOperators metrics captured"
        totals = [rows for _b, _o, rows in per_batch]
        return {
            "n_batches": len({b for b, _o, _r in per_batch}),
            "state_rows_max": max(totals),
            "state_rows_final": per_batch[-1][2],
            "per_batch": per_batch,
        }

    dedup = run_probe(stream_dedup, "dedup")
    assert dedup["state_rows_max"] <= 0.25 * n_input, dedup
    assert (
        dedup["state_rows_final"] <= 2 * horizon_rows + 0.02 * n_input
    ), (dedup, horizon_rows)

    session = run_probe(sessionized, "session")
    n_sessions = sessionized(ev).count()
    assert session["state_rows_max"] <= 0.25 * n_input, session
    assert session["state_rows_final"] <= n_sessions, (session, n_sessions)

    return {
        "n_input_rows": n_input,
        "watermark_horizon_rows": horizon_rows,
        "n_sessions_batch": n_sessions,
        "dedup": {k: v for k, v in dedup.items() if k != "per_batch"},
        "session": {k: v for k, v in session.items() if k != "per_batch"},
    }


SF10_OPS = [
    # corpus power sums / rank carriers — the bounds written vs n
    "q_agg_gini",
    "q_agg_moments",
    "q_stats_jarque_bera",
    "q_stats_dagostino",
    "q_stats_anderson_darling",
    "q_stats_cvm",
    "q_stats_lilliefors",
    "q_stats_ljung_box",
    "q_stats_durbin_watson",
    "q_stats_kruskal",
    "q_stats_mannwhitney",
    "q_stats_spearman",
    "q_stats_grubbs",
    "q_events_hurst",
    "q_stats_mood_median",
    "q_stats_bartlett",
    "q_stats_tost",
    "q_stats_welch_t",
    "q_stats_ansari_bradley",
    "q_stats_brier",
    "q_stats_auc",
    "q_orders_price_elasticity",
    # r10/r11 tight rows (SCALING.md "New tight-carrier rows")
    "q_stats_wasserstein",      # BIGINT saturates ~1e7 rows/type — AT sf10
    "q_stats_energy_distance",
    "q_stats_jackknife_ratio",
    "q_stats_conformal",
    "q_orders_decompose",
    "q_orders_anomaly_stl",
    "q_orders_did",
    "q_sql_scripting",
    "q_sql_scripting_for",
    # embeddings-corpus carrier
    "q_embed_isotropy",
    # corpus-growing REVENUE displays still on round() — the
    # q_orders_decompose sf10 finding's class; validate rather than
    # assume (each displays a per-group cents sum that reaches the
    # ~1e9-1e10 engine-round divergence zone at sf10)
    "q_orders_seasonal_decompose",
    "q_orders_lorenz",
    "q_orders_ltv_deciles",
    "q_orders_newsvendor",
    "q_orders_xyz_class",
    "q_orders_seasonal_index",
    "q_orders_mat",
    "q_orders_revenue_bridge",
    "q_orders_forecast_holt",
]

# The ops with the tightest documented carrier bounds (SCALING.md
# round-7/8 tables) — power sums, rank carriers, HUGEINT/DECIMAL(38)
# cross products — plus the ones the r8 verdict named explicitly.
TIGHT_BOUND_OPS = [
    "q_agg_gini",               # Σi·xᵢ DECIMAL(38) rank sums
    "q_agg_moments",            # Σx⁴ power sums
    "q_stats_jarque_bera",      # Σx⁴ cents (DECIMAL38/HUGEINT)
    "q_stats_dagostino",        # Σx⁴ + (n+1)²(n+3)(n+5)
    "q_stats_anderson_darling", # Σ c(2a+c)·⌊lnΦ·1e9⌋ DECIMAL(38)
    "q_stats_cvm",              # c·⌊Φ²·1e12⌋ HUGEINT sums
    "q_stats_lilliefors",       # EDF family sibling
    "q_stats_ljung_box",        # HUGEINT autocovariance products
    "q_stats_durbin_watson",    # (e·D)² DECIMAL(38)
    "q_orders_price_elasticity",# 1e9-scaled ln carriers, HUGEINT
    "q_stats_kruskal",          # 2n² midrank carrier
    "q_stats_mannwhitney",      # midrank U carrier
    "q_stats_spearman",         # midrank d² sums
    "q_stats_grubbs",           # packed argmax |xq·n−Σx|·1e5+xq
    "q_events_hurst",           # Σdev² block carriers
    "q_stats_mood_median",      # (aᵢN−nᵢA)² HUGEINT
    "q_stats_bartlett",         # Σ(n−1)·⌊v·1e4⌋ DECIMAL(38)
    "q_stats_tost",             # Σx² 1e6-scaled DECIMAL(38)
    "q_stats_welch_t",          # same family
    "q_stats_ansari_bradley",   # Σ S²/c·1e6 HUGEINT (≈N³/4 growth)
    "q_embed_isotropy",         # Σ(S_k/1e6)²·1e6 HUGEINT
    "q_stats_brier",            # 1e6-grid rational rounding
    # round 9: corpus-side tight carriers (documents/embeddings now
    # replicate too — see build_fixtures)
    "q_text_yules_k",           # Σm²V HUGEINT/DECIMAL(38)
    "q_dedup_substring",        # suffix ordering + LCP at 10x corpus
    "q_text_unigram_surprisal", # Σ tf·⌊−ln p·1e9⌋ BIGINT
    "q_stats_auc",              # doubled-midrank R2 ≤ 2n² BIGINT
    # round 10: new tight-carrier ops
    "q_stats_wasserstein",      # Σ gap·|ca·tb−cb·ta| HUGEINT/DECIMAL(38)
    "q_stats_energy_distance",  # order-statistic pair sums, HUGEINT terms
    "q_stats_jackknife_ratio",  # Sx·yᵢ−Sy·xᵢ cross products, Σu9² DEC38
    "q_dedup_binary_simhash",   # 64 per-doc bit sums over 32-bit halves
    "q_orders_decompose",       # T24/d24·cnt monthly carriers
    "q_stats_conformal",        # 1e6-pinned residual rank at 10x calib
    "q_graph_betweenness_approx",  # σ path counts at 10x clone density
    # round 11: the engine-side digest comparator (testing.py,
    # DIGEST_ROW_LIMIT) closes the one count-only sf1 cell — the
    # clone-dense pair relation is now VALUE-verified above the
    # collect ceiling (r10 VERDICT task 1)
    "q_dedup_simhash_pairs",    # 163M pairs at sf1 — digest compare
    # round 11: new/advice-touched ops with scale-sensitive paths
    "q_sql_scripting",          # Σc² DECIMAL(38)/HUGEINT per clip pass
    "q_sql_scripting_for",      # BIGINT cursor state over the quarter domain
    "q_win_cume_dist",          # total-order carrier sort at 10x ties
    "q_orders_did",             # 8-cell exact cents means at 10x
    "q_orders_anomaly_stl",     # mad9=0 guard + 1e9 remainder carriers
]


def build_fixtures(
    spark,
    src_dir: str = SRC_DIR,
    dst_dir: str = SF1_DIR,
    replicate_documents: bool = True,
) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst_dir, exist_ok=True)
    copies = spark.range(COPIES).select(F.col("id").alias("copy_i"))

    orders = spark.read.parquet(f"{src_dir}/orders.parquet")
    off = orders.agg(F.max("o_orderkey") + 1).collect()[0][0]
    (
        orders.crossJoin(copies)
        .withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("copy_i") * off
        )
        .drop("copy_i")
        .select(orders.columns)
        .repartition(16)
        .write.mode("overwrite")
        .parquet(f"{dst_dir}/orders.parquet")
    )
    li = spark.read.parquet(f"{src_dir}/lineitem.parquet")
    (
        li.crossJoin(copies)
        .withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("copy_i") * off
        )
        .drop("copy_i")
        .select(li.columns)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{dst_dir}/lineitem.parquet")
    )
    ev = spark.read.parquet(f"{src_dir}/events.parquet")
    eoff = ev.agg(F.max("event_id") + 1).collect()[0][0]
    (
        ev.crossJoin(copies)
        .withColumn(
            "event_id", F.col("event_id") + F.col("copy_i") * eoff
        )
        .drop("copy_i")
        .select(ev.columns)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{dst_dir}/events.parquet")
    )
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    if replicate_documents:
        doff = docs.agg(F.max("doc_id") + 1).collect()[0][0]
        (
            docs.crossJoin(copies)
            .withColumn(
                "doc_id", F.col("doc_id") + F.col("copy_i") * doff
            )
            .drop("copy_i")
            .select(docs.columns)
            .repartition(16)
            .write.mode("overwrite")
            .parquet(f"{dst_dir}/documents.parquet")
        )
    else:
        # carry over unreplicated (see SF10_OPS note: clone density is
        # the sf1 axis; sf10 probes fact-table row growth)
        docs.write.mode("overwrite").parquet(
            f"{dst_dir}/documents.parquet"
        )
    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    voff = emb.agg(F.max("vec_id") + 1).collect()[0][0]
    (
        emb.crossJoin(copies)
        .withColumn("vec_id", F.col("vec_id") + F.col("copy_i") * voff)
        .drop("copy_i")
        .select(emb.columns)
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{dst_dir}/embeddings.parquet")
    )
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
    ):
        dst = f"{dst_dir}/{name}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.unlink(dst)
        shutil.copy(f"{src_dir}/{name}.parquet", dst)


# --sf10-full mode (r14, r13 VERDICT task 5): walk EVERY oracle-carrying
# registry id at sf10 — the jump that breaks carriers (overflow, skew,
# memory) is usually 10×, and before r14 half the registry had never run
# above sf0.1.  Chunked child subprocesses (fresh JVM per chunk, so one
# pathological op cannot poison the rest), per-op watchdog
# (cancelAllJobs + duckdb interrupt at SPARK_GRAFT_SF10_OP_TIMEOUT,
# default 600 s), append-only JSONL results so a rerun RESUMES where the
# last one stopped.  Fixture note: sf10 carries documents over from sf1
# UNREPLICATED (the 100-way exact-clone axis would make pair relations
# quadratic in clone count — that axis is text10's job) and embeddings
# replicated 100-way exact-clone (the degenerate-tie regime; embed10
# covers the realistic-perturbation axis).
SF10_FULL_RESULTS = os.environ.get(
    "SPARK_GRAFT_SF10_FULL_RESULTS", "/tmp/sf10_full_results.jsonl"
)

# The embedding/similarity family runs on the EMBED10 fixture inside
# the full sweep, not on SF10: sf10 replicates embeddings as 100-way
# EXACT clones, which makes every bucket/pair join quadratic in clone
# count (q_dedup_embedding burned its whole 600 s watchdog there — the
# degenerate regime the embed10 axis was built to avoid) while
# validating nothing about the family's real scale behavior.  embed10
# is 10x sf0.1 vectors with per-copy perturbation — realistic near-dup
# structure, tractable both engines — so routing the family there
# gives each of its ~43 ids a genuine above-fixture run instead of a
# skip.  NOT a silent cap: the per-id `dir` field in the results
# records which fixture each op ran on.
import re as _re

# r15: q_graph_betweenness_approx added to the embed axis.  It reads ONLY
# embeddings (its graph is q_dedup_semantic's LSH-bucket cosine edge
# relation), so it belongs to exactly the family this routing exists for —
# on SF10's 100-way EXACT-clone embeddings the in-bucket pair join is
# quadratic in clone count (~2.5e9 candidate pairs, every intra-clone pair
# at cosine 1.0) and the clone cliques blow up σ path mass, the documented
# degenerate regime (q_dedup_embedding burned its watchdog there in r14).
# The r14 sweep ran it on SF10 only because its NAME misses the family
# tokens; the per-id `dir` field keeps recording which fixture ran.
_SF10_EMBED_AXIS = _re.compile(r"embed|sim_|knn|semantic|betweenness_approx")


def _sf10_full_chunk(ids: list[str]) -> None:
    """Child: compare each id vs its DuckDB oracle on the sf10
    fixtures, appending one JSONL record per op (flushed immediately,
    so a crash mid-chunk loses at most the in-flight op)."""
    import threading

    # sf10 facts are 100x the driver fixture (lineitem 60M rows): exact
    # order-statistic aggs legitimately need more than the 8g default;
    # chunks run serially so 24g is safe on this 128 GiB host.  Must be
    # set BEFORE the first get_spark builds the JVM.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    from data_warehouse_hive_spark.registry import load_all
    from data_warehouse_hive_spark.session import get_spark
    from data_warehouse_hive_spark.testing import (
        compare_to_oracle,
        duckdb_connection,
    )

    spark = get_spark(app_name="dwh-spark-sf10-full")
    registry = load_all()
    cons = {SF10_DIR: duckdb_connection(SF10_DIR)}
    op_timeout = int(os.environ.get("SPARK_GRAFT_SF10_OP_TIMEOUT", "600"))
    with open(SF10_FULL_RESULTS, "a") as out:
        for name in ids:
            spec = registry[name]
            run_dir = (
                EMBED10_DIR if _SF10_EMBED_AXIS.search(name) else SF10_DIR
            )
            if run_dir not in cons:
                cons[run_dir] = duckdb_connection(run_dir)
            con = cons[run_dir]
            t0 = time.perf_counter()
            timed_out: list[bool] = []

            def cancel(con=con) -> None:
                timed_out.append(True)
                try:
                    spark.sparkContext.cancelAllJobs()
                except Exception:
                    pass
                try:
                    con.interrupt()
                except Exception:
                    pass

            w = threading.Timer(op_timeout, cancel)
            w.daemon = True
            w.start()
            try:
                res = compare_to_oracle(
                    name, spec.fn(spark, run_dir), spec.oracle, con
                )
                ok, detail = res.ok, "; ".join(res.problems)
            except Exception as e:
                ok, detail = False, f"{type(e).__name__}: {e}"
            finally:
                w.cancel()
            if timed_out:
                ok = False
                detail = f"TIMEOUT>{op_timeout}s; " + detail[:300]
            dt = round(time.perf_counter() - t0, 2)
            # a dead JVM (driver OOM kills the py4j gateway) answers
            # ConnectionRefused for THIS op and would answer the same
            # for every op after it — record the real culprit once and
            # exit so the parent requeues the untouched rest instead of
            # poisoning the chunk with bogus failures
            jvm_dead = not ok and (
                "ConnectionRefused" in detail
                or "Answer from Java side is empty" in detail
                or "Py4JNetworkError" in detail
            )
            if jvm_dead:
                detail = "JVM_DEAD (driver crash/OOM during op); " + detail
            out.write(
                json.dumps(
                    {
                        "id": name,
                        "ok": ok,
                        "sec": dt,
                        "dir": os.path.basename(run_dir),
                        "detail": detail[:500],
                    }
                )
                + "\n"
            )
            out.flush()
            print(
                f"[{'PASS' if ok else 'FAIL'}] {name} ({dt}s)"
                + (f" — {detail[:200]}" if detail else ""),
                flush=True,
            )
            if jvm_dead:
                sys.exit(1)


def _sf10_full_parent(chunk_size: int = 25) -> None:
    """Parent: build fixtures once (subprocess), then drive the id list
    through chunked children; resumable via the JSONL."""
    import subprocess

    from data_warehouse_hive_spark.registry import load_all

    here = os.path.abspath(__file__)
    if not os.path.exists(f"{SF10_DIR}/lineitem.parquet"):
        print("building sf1+sf10 fixtures via subprocess", flush=True)
        rc = subprocess.run(
            [sys.executable, here, "--sf10-build-only"]
        ).returncode
        if rc != 0:
            raise RuntimeError(f"fixture build failed rc={rc}")
    if not os.path.exists(f"{EMBED10_DIR}/embeddings.parquet"):
        print("building embed10 fixtures via subprocess", flush=True)
        rc = subprocess.run(
            [sys.executable, here, "--embed10-build-only"]
        ).returncode
        if rc != 0:
            raise RuntimeError(f"embed10 build failed rc={rc}")
    registry = load_all()
    ids = sorted(n for n, s in registry.items() if s.oracle)
    done: set[str] = set()
    if os.path.exists(SF10_FULL_RESULTS):
        with open(SF10_FULL_RESULTS) as f:
            for ln in f:
                if not ln.strip():
                    continue
                r = json.loads(ln)
                # records written while the chunk JVM was already dead
                # are bogus (every op answers ConnectionRefused) — only
                # the culprit op's JVM_DEAD record is a real finding
                if "ConnectionRefused" in (r.get("detail") or "") and (
                    "JVM_DEAD" not in (r.get("detail") or "")
                ):
                    continue
                done.add(r["id"])
    todo = [n for n in ids if n not in done]
    op_timeout = int(os.environ.get("SPARK_GRAFT_SF10_OP_TIMEOUT", "600"))
    print(
        f"sf10-full: {len(ids)} oracle ids, {len(done)} done, "
        f"{len(todo)} to go (chunk={chunk_size})",
        flush=True,
    )
    while todo:
        chunk, todo = todo[:chunk_size], todo[chunk_size:]
        t0 = time.perf_counter()
        try:
            subprocess.run(
                [sys.executable, here, "--sf10-chunk", ",".join(chunk)],
                timeout=len(chunk) * op_timeout + 1200,
            )
        except subprocess.TimeoutExpired:
            pass  # fall through: mark the in-flight op below
        with open(SF10_FULL_RESULTS) as f:
            got = {json.loads(ln)["id"] for ln in f if ln.strip()}
        missing = [n for n in chunk if n not in got]
        if missing:
            if missing == chunk:
                # zero progress: the FIRST op killed the child before
                # it could write anything (or the child never started)
                # — record it so the resume skips it, else we loop
                with open(SF10_FULL_RESULTS, "a") as f:
                    f.write(
                        json.dumps(
                            {
                                "id": missing[0],
                                "ok": False,
                                "sec": None,
                                "detail": "CHILD_DIED: chunk subprocess"
                                " exited/killed while this op was in"
                                " flight",
                            }
                        )
                        + "\n"
                    )
                missing = missing[1:]
            # a JVM_DEAD child already recorded its culprit op itself —
            # the remaining ids are untouched, requeue them as-is
            todo = missing + todo
        print(
            f"chunk done in {time.perf_counter() - t0:.0f}s; "
            f"{len(todo)} remaining",
            flush=True,
        )
    with open(SF10_FULL_RESULTS) as f:
        recs = [json.loads(ln) for ln in f if ln.strip()]
    by_id = {r["id"]: r for r in recs}  # last record wins
    fails = {n: r for n, r in sorted(by_id.items()) if not r["ok"]}
    print(
        json.dumps(
            {
                "metric": "sf10_full_scale_step",
                "n_ops": len(by_id),
                "n_fail": len(fails),
                "failures": {
                    n: r["detail"][:200] for n, r in fails.items()
                },
                "results_file": SF10_FULL_RESULTS,
            }
        )
    )
    sys.exit(1 if fails else 0)


def main() -> None:
    if "--sf10-chunk" in sys.argv:
        ids = sys.argv[sys.argv.index("--sf10-chunk") + 1].split(",")
        _sf10_full_chunk(ids)
        return
    if "--sf10-full" in sys.argv:
        chunk_size = 25
        if "--chunk-size" in sys.argv:
            chunk_size = int(
                sys.argv[sys.argv.index("--chunk-size") + 1]
            )
        _sf10_full_parent(chunk_size)
        return

    from data_warehouse_hive_spark.registry import load_all
    from data_warehouse_hive_spark.session import get_spark
    from data_warehouse_hive_spark.testing import (
        compare_to_oracle,
        duckdb_connection,
    )

    rebuild = "--rebuild" in sys.argv
    build_only = (
        "--sf10-build-only" in sys.argv
        or "--embed10-build-only" in sys.argv
    )
    sf10 = (
        "--sf10" in sys.argv
        or "--stream10" in sys.argv
        or "--sf10-build-only" in sys.argv
    )
    text10 = "--text10" in sys.argv or "--stream10" in sys.argv
    embed10 = (
        "--embed10" in sys.argv or "--embed10-build-only" in sys.argv
    )
    stream10 = "--stream10" in sys.argv
    spark = get_spark(app_name="dwh-spark-scale-step")

    if embed10:
        # embed10 derives from sf0.1 directly — no sf1 build needed.
        if rebuild or not os.path.exists(
            f"{EMBED10_DIR}/embeddings.parquet"
        ):
            from pyspark.sql import functions as F

            print(
                f"building embed10 fixtures (10x sf0.1 vectors, mutated)"
                f" -> {EMBED10_DIR}", flush=True,
            )
            t0 = time.perf_counter()
            os.makedirs(EMBED10_DIR, exist_ok=True)
            emb = spark.read.parquet(f"{SRC_DIR}/embeddings.parquet")
            voff = emb.agg(F.max("vec_id") + 1).collect()[0][0]
            copies = spark.range(COPIES).select(
                F.col("id").alias("copy_i")
            )
            # per-component deterministic jitter in [-0.01, 0.01]:
            # hash(vec_id, copy_i, dim) is a fixed integer, so rebuilds
            # are byte-identical; copy 0 stays the untouched base.
            (
                emb.crossJoin(copies)
                .select(
                    (F.col("vec_id") + F.col("copy_i") * voff).alias(
                        "vec_id"
                    ),
                    F.when(F.col("copy_i") == 0, F.col("embedding"))
                    .otherwise(
                        F.transform(
                            F.col("embedding"),
                            lambda x, i: (
                                x
                                + (
                                    F.pmod(
                                        F.hash(
                                            F.col("vec_id"),
                                            F.col("copy_i"),
                                            i,
                                        ),
                                        F.lit(2001),
                                    )
                                    - 1000
                                ).cast("double")
                                / 100000.0
                            ).cast("float"),
                        )
                    )
                    .alias("embedding"),
                    "label",
                )
                .repartition(8)
                .write.mode("overwrite")
                .parquet(f"{EMBED10_DIR}/embeddings.parquet")
            )
            for name in ("region nation customer supplier part orders "
                         "lineitem events documents").split():
                dst = f"{EMBED10_DIR}/{name}.parquet"
                src = f"{SRC_DIR}/{name}.parquet"
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                elif os.path.exists(dst):
                    os.unlink(dst)
                if os.path.isdir(src):
                    shutil.copytree(src, dst)
                else:
                    shutil.copy(src, dst)
            print(
                f"  built in {time.perf_counter() - t0:.1f}s", flush=True
            )
    elif rebuild or not os.path.exists(f"{SF1_DIR}/lineitem.parquet"):
        print(f"building sf1 fixtures ({COPIES}x sf0.1) -> {SF1_DIR}",
              flush=True)
        t0 = time.perf_counter()
        build_fixtures(spark)
        print(f"  built in {time.perf_counter() - t0:.1f}s", flush=True)
    if sf10 and (
        rebuild or not os.path.exists(f"{SF10_DIR}/lineitem.parquet")
    ):
        print(f"building sf10 fixtures ({COPIES}x sf1) -> {SF10_DIR}",
              flush=True)
        t0 = time.perf_counter()
        build_fixtures(
            spark, src_dir=SF1_DIR, dst_dir=SF10_DIR,
            replicate_documents=False,
        )
        print(f"  built in {time.perf_counter() - t0:.1f}s", flush=True)
    if build_only:
        print("fixtures ready (sf1 + sf10)", flush=True)
        return

    if text10 and (
        rebuild or not os.path.exists(f"{TEXT10_DIR}/documents.parquet")
    ):
        from pyspark.sql import functions as F

        print(f"building text10 fixtures (10x sf1 docs, mutated) -> "
              f"{TEXT10_DIR}", flush=True)
        t0 = time.perf_counter()
        os.makedirs(TEXT10_DIR, exist_ok=True)
        docs = spark.read.parquet(f"{SF1_DIR}/documents.parquet")
        doff = docs.agg(F.max("doc_id") + 1).collect()[0][0]
        copies = spark.range(COPIES).select(F.col("id").alias("copy_i"))
        (
            docs.crossJoin(copies)
            .select(
                (F.col("doc_id") + F.col("copy_i") * doff).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" xq"),
                    F.col("copy_i").cast("string"),
                ).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + 3 + F.length(
                    F.col("copy_i").cast("string"))).alias("n_chars"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{TEXT10_DIR}/documents.parquet")
        )
        for name in ("region nation customer supplier part orders "
                     "lineitem events embeddings").split():
            dst = f"{TEXT10_DIR}/{name}.parquet"
            src = f"{SF1_DIR}/{name}.parquet"
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            elif os.path.exists(dst):
                os.unlink(dst)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
        print(f"  built in {time.perf_counter() - t0:.1f}s", flush=True)

    if stream10:
        # streaming axis: registered ddls at scale (internal parity
        # asserts ARE the check — they raise on stream≢batch) + the
        # instrumented state-contract probes.
        #
        # 100 TB state-store posture: ddl_stream_dedup's AvailableNow
        # cold-start admits the whole sf10 events landing (~11M keys) in
        # ONE micro-batch, and the default HDFSBackedStateStore keeps
        # every entry on the JVM heap — an 8g driver OOMs exactly as an
        # unsized production job would (observed r13 first run).  RocksDB
        # is what a real cluster runs for large state: native memory +
        # local disk, heap-bounded.  Run with SPARK_GRAFT_DRIVER_MEM=32g
        # for comfortable shuffle headroom at this SF.
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        # the 10M-row AvailableNow landing needs ~4 min; the ops read
        # this env at call time, so a bare --stream10 run works without
        # a manual export (the 120 s default suits only fixture scales)
        os.environ.setdefault("SPARK_GRAFT_STREAM_DRAIN_S", "900")
        registry = load_all()
        results: dict[str, dict] = {}
        n_fail = 0
        for name, run_dir in [
            (n, SF10_DIR) for n in STREAM10_EVENT_DDLS
        ] + [(n, TEXT10_DIR) for n in STREAM10_TEXT_DDLS]:
            t0 = time.perf_counter()
            try:
                rows = registry[name].fn(spark, run_dir).collect()
                ok, detail = True, "; ".join(
                    f"{k}={v}" for k, v in rows[0].asDict().items()
                )
            except Exception as e:
                ok, detail = False, f"{type(e).__name__}: {e}"
            dt = round(time.perf_counter() - t0, 2)
            results[name] = {"ok": ok, "sec": dt, "detail": detail[:500]}
            n_fail += 0 if ok else 1
            print(
                f"[{'PASS' if ok else 'FAIL'}] {name} @{run_dir} ({dt}s)"
                + (f" — {detail[:300]}" if detail else ""),
                flush=True,
            )
        t0 = time.perf_counter()
        try:
            probes = stream10_state_probes(spark)
            ok, detail = True, json.dumps(probes)
        except Exception as e:
            probes, ok, detail = {}, False, f"{type(e).__name__}: {e}"
        dt = round(time.perf_counter() - t0, 2)
        results["state_probes"] = {"ok": ok, "sec": dt, "detail": detail[:800]}
        n_fail += 0 if ok else 1
        print(
            f"[{'PASS' if ok else 'FAIL'}] state_probes ({dt}s) — "
            f"{detail[:400]}",
            flush=True,
        )
        print(json.dumps({
            "metric": "stream10_scale_step",
            "n_ops": len(results),
            "n_fail": n_fail,
            "results": results,
        }))
        sys.exit(1 if n_fail else 0)

    sf_dir = (
        EMBED10_DIR if embed10
        else TEXT10_DIR if text10
        else SF10_DIR if sf10
        else SF1_DIR
    )
    ops = (
        EMBED10_OPS if embed10
        else TEXT10_OPS if text10
        else SF10_OPS if sf10
        else TIGHT_BOUND_OPS
    )
    registry = load_all()
    con = duckdb_connection(sf_dir)
    results: dict[str, dict] = {}
    n_fail = 0
    for name in ops:
        spec = registry[name]
        t0 = time.perf_counter()
        try:
            res = compare_to_oracle(
                name, spec.fn(spark, sf_dir), spec.oracle, con
            )
            ok, detail = res.ok, "; ".join(res.problems)
        except Exception as e:  # overflow raises are exactly what we hunt
            ok, detail = False, f"{type(e).__name__}: {e}"
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"ok": ok, "sec": dt, "detail": detail[:500]}
        n_fail += 0 if ok else 1
        print(f"[{'PASS' if ok else 'FAIL'}] {name} ({dt}s)"
              + (f" — {detail[:300]}" if detail else ""), flush=True)
    summary = {
        "metric": (
            "embed10_scale_step" if embed10
            else "text10_scale_step" if text10
            else "sf10_scale_step" if sf10
            else "sf1_scale_step"
        ),
        "n_ops": len(ops),
        "n_fail": n_fail,
        "results": results,
    }
    print(json.dumps(summary))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
