"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Output protocol (driver-truncation-safe, VERDICT r7 #2): stdout carries
ONE COMPACT JSON line — total seconds, query count, max external-load
fraction, and the common-query ratio vs the previous run — small enough
to survive any tail capture. The full record (per-query p50 map,
per-query external-busy fractions, skew and growth sections, load
telemetry) is written to ``BENCH_DETAIL.json`` beside this file and
referenced by path from the compact line. BENCH_r07's timings were lost
because the old 15 KB single line outgrew the driver's 2 KB tail window.

Each query executes fully via a noop-format write (no driver collect, no
sink I/O in the timing) after a warm-up of the session + input footers.
Per-query numbers are the p50 of $SPARK_GRAFT_BENCH_RUNS runs (default
5) — single-run drift at sub-second query times was indistinguishable
from regression in round 1 (25 s vs 31 s on identical code).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))

#: reserved BENCH_PREV.json key for the machine-speed probe (never a
#: query name) — lets calibrated ratios compare era-over-era from the
#: artifacts alone (VERDICT r11 #1)
_CAL_KEY = "__calibration_topk_p50__"
_CAL_FOLD_KEY = "__calibration_fold_p50__"
#: reserved keys for the SOLO-WINDOW probes (the fresh adjudication
#: session's own machine-speed measurements): the stored solo_s
#: baselines were measured under THESE probes, not the start-of-run
#: ones, so solo-vs-solo calibration must divide era-over-era by them
#: (r14 review: using the previous run's START probe as the denominator
#: re-imports the very start-vs-end floor drift the solo-window probes
#: were added to remove)
_CAL_SOLO_KEY = "__calibration_solo_topk_p50__"
_CAL_SOLO_FOLD_KEY = "__calibration_solo_fold_p50__"


def _read_psi_cpu() -> dict | None:
    """Cgroup/host CPU pressure (PSI) totals in microseconds, if readable.
    ``some`` counts wall-time where at least one runnable task waited for a
    CPU — the direct signature of co-tenant contention."""
    for path in ("/sys/fs/cgroup/cpu.pressure", "/proc/pressure/cpu"):
        try:
            with open(path) as f:
                out = {}
                for line in f:
                    kind, *kvs = line.split()
                    out[kind] = {
                        k: float(v) for k, v in (kv.split("=") for kv in kvs)
                    }
                return out
        except OSError:
            continue
    return None


def _total_busy_ticks() -> int:
    """Aggregate busy clock ticks across all CPUs from /proc/stat (user +
    nice + system + irq + softirq + steal; idle/iowait excluded)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    u, n, s, _idle, _iow, irq, sirq, steal = (int(x) for x in parts[1:9])
    return u + n + s + irq + sirq + steal


def _subtree_busy_ticks() -> int:
    """CPU ticks consumed by THIS process tree (bench python + the Spark
    JVM + its Python workers): sum utime+stime+cutime+cstime over every
    /proc pid whose ancestry reaches os.getpid(). cutime/cstime fold in
    reaped children (short-lived Python workers)."""
    me = os.getpid()
    ppid: dict[int, int] = {}
    ticks: dict[int, int] = {}
    for ent in os.listdir("/proc"):
        if not ent.isdigit():
            continue
        try:
            with open(f"/proc/{ent}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        # comm may contain spaces/parens: split after the LAST ')'
        rest = raw.rsplit(")", 1)[1].split()
        pid = int(ent)
        ppid[pid] = int(rest[1])  # field 4 (ppid), index 1 after comm
        ticks[pid] = sum(int(x) for x in rest[11:15])  # utime..cstime
    total = 0
    for pid in ticks:
        p = pid
        for _ in range(64):  # ancestry walk, cycle-bounded
            if p == me:
                total += ticks[pid]
                break
            p = ppid.get(p, 0)
            if p <= 1:
                break
    return total


class _LoadMeter:
    """Samples host vs own-subtree CPU between marks so each measurement
    window carries an ``external_busy_frac``: the fraction of total machine
    CPU capacity consumed by processes OUTSIDE this bench's process tree
    during the window. ~0 on a quiet host; co-tenant load that inflates
    wall-times shows up directly here, which is what lets a >2× driver
    bench row be adjudicated as noise vs regression (VERDICT r6 #1)."""

    def __init__(self) -> None:
        self.ncpu = os.cpu_count() or 1
        self.clk = os.sysconf("SC_CLK_TCK")
        self._mark()

    def _mark(self) -> None:
        self.t0 = time.monotonic()
        self.busy0 = _total_busy_ticks()
        self.own0 = _subtree_busy_ticks()

    def window(self) -> float:
        """external_busy_frac since the last mark; re-marks."""
        dt = time.monotonic() - self.t0
        busy = _total_busy_ticks() - self.busy0
        own = _subtree_busy_ticks() - self.own0
        self._mark()
        if dt <= 0:
            return 0.0
        return round(max(0, busy - own) / self.clk / (dt * self.ncpu), 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from bookstore_aws_lakehouse_spark.session import get_spark

    bench_conf = {
            "spark.ui.enabled": "false",
            # local[32] on the default 1g driver heap GC-thrashes on the
            # bigger sections; the JVM then prints unified-logging GC
            # warnings on STDOUT, which can land AFTER the JSON line and
            # corrupt the one-line protocol — size the heap and silence
            # JVM logging to stdout outright
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
            "spark.driver.extraJavaOptions": "-Xlog:disable",
            # session-state inflation guard: even with the UI off, the
            # app/SQL status stores retain per-execution plan graphs and
            # per-stage metrics (defaults: 1000 executions / 1000 stages /
            # 100k tasks). Over ~95 multi-job queries that's thousands of
            # retained plans whose heap + GC pressure visibly slows the
            # TAIL of the run — the "end-of-round 1.2×" adjudicated in r8/
            # r9 notes. Cap retention at what a long-running production
            # driver would keep.
            "spark.sql.ui.retainedExecutions": "20",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "100",
            "spark.ui.retainedTasks": "2000",
            "spark.appStateStore.asyncTracking.enable": "true",
    }

    def mk_session(app_name: str):
        return get_spark(
            app_name=app_name,
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
            extra_conf=bench_conf,
        )

    spark = mk_session("bookstore-lakehouse-bench")

    from bookstore_aws_lakehouse_spark.registry import load_all
    GOLDEN, _ = load_all()

    headline = [
        "topk_books",
        "topk_books_by_title",
        "join_avg_by_author",
        "count_star_by_country",
        "drilldown_states",
        "q1_pricing_summary",
        "q6_forecast_revenue",
        "q3_shipping_priority",
        "window_topn_per_group",
        "rollup_geo",
        "group_avg_count",
    ]
    # extension headliners are registered lazily (modules may land later)
    for extra in [
        "etl_top100_books",
        "events_daily_agg",
        "events_sessionize",
        "q5_local_supplier_volume",
        "dedup_exact",
        "dedup_minhash_pairs",
        "dedup_ngram_jaccard",
        "dedup_clusters",
        "text_quality",
        "text_vocabulary_topk",
        "embedding_topk_cosine",
        "ann_lsh_buckets",
        "multimodal_features",
        "dataset_train_test_split",
        "asof_last_signup",
        "range_join_followups",
        "dq_snapshot_diff",
        "dedup_survivors",
        "dedup_simhash_pairs",
        "embedding_near_dup",
        "dataset_stratified_sample",
        "pii_pseudonymize",
        "q2_min_cost_supplier",
        "q21_waiting_suppliers",
        "text_bigram_lm_score",
        # r6 additions (VERDICT r5 #2): the widest join tree in the suite,
        # the other inverted-index consumer, and the previously-unbenched
        # chunking / split / IVF / window-frame / resize paths
        "q9_product_profit",
        "dedup_containment_pairs",
        "dataset_chunk_windows",
        "dataset_leakage_safe_split",
        "ann_ivf_topk",
        "ann_ivf_multiprobe",
        "window_range_frame",
        "multimodal_resize_real",
        # r7 additions: the write/maintenance path (partitioned merge,
        # compaction, snapshot-table merge), codebook training, and the
        # sketch aggregates
        "upsert_partitioned_roundtrip",
        "compact_roundtrip",
        "snapshot_merge_roundtrip",
        "snapshot_merge_partitioned_roundtrip",
        "kmeans_train_assign",
        "approx_distinct_accuracy",
        "hll_merge_across_groups",
        "graph_pagerank_purchases",
        "text_remove_boilerplate",
        # r8 additions: row-level snapshot DELETE + OPTIMIZE, the fixed-
        # codebook 2-iteration kmeans, and the Theta/KLL sketch rollups
        "snapshot_delete_roundtrip",
        "snapshot_optimize_roundtrip",
        "kmeans_converge_2iter",
        "theta_set_ops",
        "kll_quantile_merge",
        "snapshot_changes_feed",
        "embedding_pq_encode",
        "ann_ivfpq_topk",
        # r9 additions: bloom-index point lookup, schema-evolving append,
        # the Count-Min heavy hitters, the cluster-trained NB langid,
        # CDC-driven incremental mart refresh, the per-source percentile
        # curation gate, and residual IVFADC
        "snapshot_bloom_lookup",
        "snapshot_schema_evolution",
        "token_cms_heavy_hitters",
        "text_nb_langid_confusion",
        "snapshot_incremental_rollup",
        "dataset_percentile_filter",
        "ann_ivfpq_residual_topk",
        "dataset_temperature_mix",
        "bucketed_join_roundtrip",
        "events_observed_metrics",
        "token_heavy_hitters_mg",
        "dataset_curation_pipeline_v2",
        "ann_ivfpq_residual_multiprobe",
        "snapshot_constraint_enforcement",
        "snapshot_materialized_view_refresh",
        "snapshot_update_roundtrip",
        "dq_expectations_quarantine",
        "snapshot_python_datasource",
        "stream_snapshot_source_tail",
        "snapshot_clone_divergence",
        # r10 additions: the DataSource reading a schema-evolved table,
        # RESTORE + history audit, and the detected-hot-key salted join
        "snapshot_pyds_evolved_read",
        "snapshot_restore_roundtrip",
        "snapshot_history_audit",
        "join_salted_hot",
        "snapshot_merge_when_roundtrip",
        "snapshot_metadata_count",
        # r11 additions: merge-on-read DELETE (benched beside the CoW
        # snapshot_delete_roundtrip so the cost inversion is measured,
        # not asserted) and the stats-pruned atomic partition reload
        "snapshot_dv_delete",
        "snapshot_replace_where",
        "snapshot_asof_timestamp",
        "snapshot_vacuum_retention",
        "stream_snapshot_native_sink",
        # r12: OPTIMIZE ZORDER BY — the multi-column pruning rewrite
        "snapshot_zorder_prune",
        # r12: SemDeDup — cell-keyed embedding dedup
        "semantic_dedup",
        # r13: temporal Z-order pruning (datetime-probed scan_multi), the
        # BI dashboard-view facade, and the winnowed overlap index
        "snapshot_zorder_time_prune",
        "dashboard_catalog",
        "dedup_winnowed_pairs",
        # r14: the bounded-contract CC variant and the PII scrub pass
        "dedup_clusters_capped",
        "text_pii_redact",
        # r15: distributed PCA — one-pass moments + 3-step power method,
        # and the map-side projection/outlier scan
        "embedding_top_pc",
        "embedding_pca_scores_topk",
        # r16: top-r deflation and the footer-only file-metadata table
        "embedding_top_pcs",
        "snapshot_files",
        # r14 (VERDICT r13 #3/#4): the d=256 Arrow Gram-partial
        # covariance (the production-width physical path), the
        # eigenvalue spectrum, and the whitened reduce-before-ANN
        "embedding_wide_covariance",
        "embedding_pc_spectrum",
        "embedding_pca_reduce",
    ]:
        if extra in GOLDEN:
            headline.append(extra)

    # warm-up: JVM, parquet footers, codegen, AND the Python worker pool
    # (long-lived in production; first mapInPandas otherwise pays ~1s of
    # worker startup inside the measured window)
    GOLDEN["topk_books"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    import pandas as pd

    spark.range(32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # median-of-5 by default: the host is co-tenanted and a single noisy
    # neighbor inflates 1-in-3 runs enough to flip the median; 5 runs
    # cost ~1 extra minute and cut run-to-run drift roughly in half
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    meter = _LoadMeter()
    load_start = {"loadavg": os.getloadavg(), "psi_cpu": _read_psi_cpu()}
    # Machine-speed calibration (r11): a fixed, already-warm workload
    # timed before any headline row. The r11 thermal incident — a whole
    # run uniformly ~1.2× slow with ext_busy≈0 and fresh-session solos
    # matching the old record — was only attributable by re-running
    # controls; dividing two rounds' calibration numbers attributes it
    # from the artifacts alone (guest-invisible host slowness moves the
    # calibration and every row together; a code regression moves only
    # its rows).
    # median-of-5: the probe divides into every calibrated ratio, so its
    # own run-to-run noise multiplies straight into them (back-to-back
    # sf0.001 smokes measured a 21% probe swing on 3 runs)
    def _probe_topk() -> float:
        runs = []
        for _ in range(5):
            t0 = time.monotonic()
            GOLDEN["topk_books"](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.monotonic() - t0)
        return round(sorted(runs)[2], 3)

    cal = _probe_topk()
    # THERMAL GATE (r15): the manual idle-before-record protocol, as
    # code. A probe far above the previous record's means the box hasn't
    # recovered from whatever ran before this bench (the r15 run-2
    # incident: probe 0.836 vs prev 0.591 with ext_busy≈0 and PSI 0 —
    # frequency state, invisible to the load meter); measuring anyway
    # burns the round's artifact on a floor the calibration can only
    # partially reattribute. Cool down and re-probe (keep the best)
    # before starting the suite.
    gate = float(os.environ.get("SPARK_GRAFT_THERMAL_GATE", "1.2"))
    prev_probe = None
    try:
        with open(os.path.join(_REPO_DIR, "BENCH_PREV.json")) as f:
            sfk = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
            raw = json.load(f).get(str(float(sfk))) or {}
            rc = raw.get(_CAL_KEY)
            prev_probe = rc["s"] if isinstance(rc, dict) else rc
    except (OSError, ValueError, KeyError, TypeError):
        pass
    if prev_probe:
        retries = 0
        while cal / prev_probe > gate and retries < int(
            os.environ.get("SPARK_GRAFT_THERMAL_RETRIES", "3")
        ):
            retries += 1
            time.sleep(float(os.environ.get("SPARK_GRAFT_THERMAL_SLEEP", "120")))
            cal = min(cal, _probe_topk())
        if retries:
            load_start["thermal_gate"] = {
                "prev_probe_s": prev_probe,
                "retries": retries,
                "recovered": cal / prev_probe <= gate,
            }
    load_start["calibration_topk_p50"] = cal
    # Second, COMPUTE-bound probe (r12): an insufficiently-idled record
    # run measured every compute-dense row (ANN folds, kmeans) ~10%
    # inflated while the scan-bound topk probe moved <2% — scan floor
    # and core frequency state drift independently on this host. The
    # vector-fold probe (sign-LSH bucket projection, 512 multiplies/row,
    # no shuffle) moves with the frequency state; disagreement between
    # the two probes names WHICH floor shifted. Normalization stays
    # topk-based (the suite is scan-dominated); this one is diagnostic.
    if "ann_lsh_buckets" in GOLDEN:
        fold_runs = []
        for _ in range(5):
            t0 = time.monotonic()
            GOLDEN["ann_lsh_buckets"](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            fold_runs.append(time.monotonic() - t0)
        load_start["calibration_fold_p50"] = round(sorted(fold_runs)[2], 3)
    timings: dict[str, float] = {}
    query_ext_load: dict[str, float] = {}

    # etl_top100_books is bimodal by design: its first build materializes
    # the memoized 6-way denormalized staging table (~5 s), steady state
    # is ~0.8 s. Time the COLD build as its own named row so the p50 row
    # below is unimodal steady-state (VERDICT r7 #3) — a real ETL pays
    # the staging materialization once per run, not per query.
    if "etl_top100_books" in GOLDEN:
        meter.window()
        t0 = time.monotonic()
        GOLDEN["etl_top100_books"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["etl_top100_books_cold"] = round(time.monotonic() - t0, 3)
        query_ext_load["etl_top100_books_cold"] = meter.window()
        # Phase attribution for the suite's most expensive row (VERDICT
        # r9 #5): the cold pipeline is ONE lazy job, so the split runs
        # AFTER the headline timing (which stays methodology-identical
        # round over round) with each stage pinned so the next stage
        # times only its own work. Phases are warm — they attribute a
        # regression structurally (scan+join vs clean vs agg), they
        # don't decompose the cold number arithmetically.
        try:
            from bookstore_aws_lakehouse_spark.plans.etl import (
                CLEAN_PREFIX,
                build_raw_ratings,
                top100_books,
            )
            from bookstore_aws_lakehouse_spark.queries_streaming import (
                PHASE_TIMINGS as _etl_phases,
            )

            t0 = time.monotonic()
            raw = build_raw_ratings(spark, sf_dir).persist()
            raw.write.format("noop").mode("overwrite").save()
            t1 = time.monotonic()
            clean = CLEAN_PREFIX.run(raw).persist()
            clean.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            top100_books(clean, min_ratings=25).write.format("noop").mode(
                "overwrite"
            ).save()
            t3 = time.monotonic()
            raw.unpersist()
            clean.unpersist()
            _etl_phases["etl_top100_books_cold"] = {
                "scan_join_s": round(t1 - t0, 3),
                "clean_s": round(t2 - t1, 3),
                "agg_s": round(t3 - t2, 3),
            }
        except Exception:
            pass  # diagnostic only — never fail the bench for it

    def _timed_p50(name: str) -> tuple[float, float]:
        runs = []
        meter.window()  # re-mark so the query window excludes prior work
        for _ in range(n_runs):
            t0 = time.monotonic()
            GOLDEN[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        return round(sorted(runs)[len(runs) // 2], 3), meter.window()

    for name in headline:
        if name not in GOLDEN:
            continue
        timings[name], query_ext_load[name] = _timed_p50(name)

    # Quiet-box gate (VERDICT r10 #6): a row whose measurement window saw
    # >EXT_GATE external CPU is re-measured up to twice, keeping the
    # quietest window — BENCH_r10's growth numbers disagreed with the
    # quiet-box A/Bs by up to 1.6x because the artifact recorded a
    # co-tenant storm. Rows still hot after the retries are recorded as
    # waived: the artifact then says "this number is load-polluted"
    # instead of presenting it as clean. (The cold-ETL row can't re-run —
    # cold happens once per session — so it carries its window as-is.)
    ext_gate = float(os.environ.get("SPARK_GRAFT_EXT_GATE", "0.3"))
    gate_log: dict = {"threshold": ext_gate, "retried": {}, "waived": []}
    for _attempt in range(2):
        hot = [
            q
            for q in timings
            if q != "etl_top100_books_cold" and query_ext_load.get(q, 0.0) > ext_gate
        ]
        if not hot:
            break
        for name in hot:
            p50, eb = _timed_p50(name)
            gate_log["retried"].setdefault(name, []).append(
                {"s": p50, "ext_busy": eb}
            )
            if eb < query_ext_load[name]:
                timings[name], query_ext_load[name] = p50, eb
    gate_log["waived"] = sorted(
        q
        for q in timings
        if q != "etl_top100_books_cold" and query_ext_load.get(q, 0.0) > ext_gate
    )

    skew = _skew_section(spark, meter)
    growth = _growth_section(spark, sf_dir, GOLDEN, meter)
    load_end = {"loadavg": os.getloadavg(), "psi_cpu": _read_psi_cpu()}

    # streaming rows: harness setup (table builds) vs the streamed job
    # itself, from the queries' own phase instrumentation (VERDICT r8 #6)
    # — without the split, real reader/sink regressions hide inside
    # table-build noise. Last run's split; phases sum ≈ the p50 row.
    try:
        from bookstore_aws_lakehouse_spark.queries_streaming import (
            PHASE_TIMINGS as _stream_phases,
        )

        stream_phases = {
            q: dict(v) for q, v in _stream_phases.items() if q in timings
        }
    except ImportError:
        stream_phases = {}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    detail_path = os.path.join(_REPO_DIR, "BENCH_DETAIL.json")
    prev_path = os.path.join(_REPO_DIR, "BENCH_PREV.json")
    # common-set comparison vs the PREVIOUS run at the SAME scale factor:
    # sum of this run's p50s over the shared query names vs the previous
    # run's sum over the same names — the round-over-round signal the
    # judge reconstructs by hand when it's absent. The per-sf prev store
    # (BENCH_PREV.json) exists so a smoke run at another sf can never
    # clobber the sf0.1 record and silence the next ratio; the detail
    # file is the fallback for pre-store records.
    common_vs_prev = None
    prev_cal = None
    prev_fold_cal = None
    prev_solo_cal = None
    prev_solo_fold_cal = None
    prev_solo: dict = {}
    cal_now = load_start.get("calibration_topk_p50")
    fold_cal_now = load_start.get("calibration_fold_p50")
    try:
        sf_key = str(float(sf) if sf.replace(".", "").isdigit() else sf)
        prev_q: dict = {}
        try:
            with open(prev_path) as f:
                raw_prev = json.load(f).get(sf_key) or {}
            # the previous run's machine-speed probe lives in the store
            # under a reserved key (never a query name) — pop it before
            # building the query baseline
            rc = raw_prev.pop(_CAL_KEY, None)
            prev_cal = rc["s"] if isinstance(rc, dict) else rc
            rf = raw_prev.pop(_CAL_FOLD_KEY, None)
            prev_fold_cal = rf["s"] if isinstance(rf, dict) else rf
            rs = raw_prev.pop(_CAL_SOLO_KEY, None)
            prev_solo_cal = rs["s"] if isinstance(rs, dict) else rs
            rsf = raw_prev.pop(_CAL_SOLO_FOLD_KEY, None)
            prev_solo_fold_cal = rsf["s"] if isinstance(rsf, dict) else rsf
            # entries are {"s": seconds, "src": "run"|"solo"} since r10
            # (ADVICE r9: per-entry provenance); bare floats are the
            # pre-provenance format — accept both
            prev_q = {
                q: (v["s"] if isinstance(v, dict) else v)
                for q, v in raw_prev.items()
            }
            # solo-vs-solo baselines (VERDICT r13 #2): entries carry the
            # last fresh-session solo median alongside the in-run p50, so
            # a solo re-measure compares like-for-like (cold fresh-session
            # vs cold fresh-session) instead of against a warm in-run
            # record — the structural flaw behind r13's unfalsifiable
            # watch items (dq_snapshot_diff "solo_cal 2.0" on a 0.5 s row
            # at the SAME commit as the record run).
            prev_solo = {
                q: v["solo_s"]
                for q, v in raw_prev.items()
                if isinstance(v, dict) and v.get("solo_s")
            }
        except (OSError, ValueError, KeyError, TypeError):
            pass
        if not prev_q:
            with open(detail_path) as f:
                prev = json.load(f)
            prev_q = (
                (prev.get("queries") or {})
                if str(prev.get("sf")) == sf_key
                else {}
            )
            if prev_cal is None:
                prev_cal = (prev.get("load") or {}).get("start", {}).get(
                    "calibration_topk_p50"
                )
        shared = sorted(set(prev_q) & set(timings))
        prev_sum = sum(prev_q[q] for q in shared)
        if shared and prev_sum > 0:
            common_vs_prev = {
                "n_common": len(shared),
                "sum_s": round(sum(timings[q] for q in shared), 3),
                "prev_sum_s": round(prev_sum, 3),
                "ratio": round(sum(timings[q] for q in shared) / prev_sum, 3),
            }
            # Calibration normalization (VERDICT r11 #1): dividing two
            # rounds' machine-speed probes attributes a box-floor shift
            # from the artifacts alone — guest-invisible host slowness
            # moves the probe and every row together; a code regression
            # moves only its rows. calibrated_ratio is the ratio a
            # same-speed box would have recorded; it retires the manual
            # re-run-the-old-commit A/Bs of r10/r11.
            common_vs_prev["calibration_s"] = cal_now
            common_vs_prev["prev_calibration_s"] = prev_cal
            if cal_now and prev_cal:
                cal_factor = cal_now / prev_cal
                common_vs_prev["cal_factor"] = round(cal_factor, 3)
                common_vs_prev["calibrated_ratio"] = round(
                    common_vs_prev["ratio"] / cal_factor, 3
                )
            # diagnostic compute-floor probe: disagreement with the topk
            # factor names which floor shifted (scan vs frequency state)
            common_vs_prev["fold_calibration_s"] = fold_cal_now
            common_vs_prev["prev_fold_calibration_s"] = prev_fold_cal
            if fold_cal_now and prev_fold_cal:
                common_vs_prev["fold_cal_factor"] = round(
                    fold_cal_now / prev_fold_cal, 3
                )
    except (OSError, ValueError):
        pass

    # AUTO-ADJUDICATION (VERDICT r8 #1): any shared row that regressed
    # >1.3× vs the previous record is re-measured SOLO at the end of the
    # run (median-of-5, warm, own load window). The in-run p50 of a long
    # bench session carries accumulated JVM/session state; the solo
    # number is the one a standalone rerun would see. Recording both —
    # plus the load evidence — means no future round ships a ratio
    # nobody can explain: solo≈prev ⇒ session-state inflation, not a
    # code regression; solo≈run ⇒ real, go bisect.
    adjudication: dict[str, dict] = {}
    if common_vs_prev:
        adjudication = _adjudicate(
            spark, sf_dir, GOLDEN, prev_q, timings, meter, n_runs,
            mk_session=mk_session,
            cal_factor=common_vs_prev.get("cal_factor") or 1.0,
            fold_cal_factor=common_vs_prev.get("fold_cal_factor"),
            prev_probes=(prev_cal, prev_fold_cal),
            prev_solo=prev_solo,
            prev_solo_probes=(prev_solo_cal, prev_solo_fold_cal),
        )

    def _git_head() -> str | None:
        try:
            with open(os.path.join(_REPO_DIR, ".git", "HEAD")) as f:
                ref = f.read().strip()
            if ref.startswith("ref: "):
                with open(os.path.join(_REPO_DIR, ".git", ref[5:])) as f:
                    return f.read().strip()
            return ref
        except OSError:
            return None

    detail = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "load": {
            "start": load_start,
            "end": load_end,
            # per-query external CPU fraction: capacity consumed by
            # processes outside this bench's tree while that query's
            # runs executed. ~0 quiet; >0.1 means co-tenant load was
            # eating >10% of the machine during the measurement.
            "external_busy_frac_by_query": query_ext_load,
        },
        "skew": skew,
        "growth": growth,
        "ext_busy_gate": gate_log,
        "common_vs_prev": common_vs_prev,
        "adjudication": adjudication,
        "stream_phases": stream_phases,
        # the commit this bench measured — makes "builder's mid-round
        # record vs driver's end-of-round run" diffable by construction
        "commit": _git_head(),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    try:
        with open(prev_path) as f:
            prev_store = json.load(f)
    except (OSError, ValueError):
        prev_store = {}
    # Baseline hygiene (ADVICE r9): every entry carries provenance
    # ({"s": seconds, "src": "run"|"solo"}). The DEFAULT baseline is the
    # in-run p50 — methodology-consistent round over round, so a row
    # with an inherent fresh-vs-aged delta settles at its aged in-run
    # level instead of exceeding the 1.3× trigger against a fresh solo
    # number every future run (the perpetual re-adjudication treadmill
    # the old always-adopt-solo rule created). The solo number replaces
    # it ONLY when the in-run measurement was provably load-inflated
    # (its own window saw >10% external CPU) and solo came in faster —
    # there the in-run p50 would soften every future ratio at this sf.
    baseline = {q: {"s": v, "src": "run"} for q, v in timings.items()}
    for q, a in adjudication.items():
        solo = a.get("solo_s")
        if (
            solo is not None
            and solo < timings.get(q, solo)
            and query_ext_load.get(q, 0.0) > 0.1
        ):
            baseline[q] = {"s": solo, "src": "solo"}
        # every measured solo is stored as a PARALLEL baseline (VERDICT
        # r13 #2): the next run's solo compares against it like-for-like
        # (fresh session, warmed median, own probe window) while the
        # in-run "s" keeps serving the run-ratio methodology.
        if solo is not None and q in baseline:
            baseline[q]["solo_s"] = solo
    # a solo baseline survives quiet rounds (r14 review #1): a row
    # adjudicated in round N and quiet in N+1 must still carry its
    # solo_s into N+2, else the next regression falls back to the
    # cold-solo-vs-warm-record comparison this mechanism retires. The
    # carried value is replaced whenever a fresh solo is measured.
    for q, s in prev_solo.items():
        if q in baseline and "solo_s" not in baseline[q]:
            baseline[q]["solo_s"] = s
    # persist the solo-window probes beside the solo baselines: stored
    # solo_s values were measured under THESE floors, so the next run's
    # solo-vs-solo calibration divides era-over-era by them (r14 review
    # #2). Carried forward like the baselines when no fresh session ran.
    sw = adjudication.get("__solo_window__") or {}
    solo_topk = sw.get("topk_p50") or prev_solo_cal
    solo_fold = sw.get("fold_p50") or prev_solo_fold_cal
    if solo_topk:
        baseline[_CAL_SOLO_KEY] = {"s": solo_topk, "src": "cal"}
    if solo_fold:
        baseline[_CAL_SOLO_FOLD_KEY] = {"s": solo_fold, "src": "cal"}
    if cal_now:
        baseline[_CAL_KEY] = {"s": cal_now, "src": "cal"}
    if fold_cal_now:
        baseline[_CAL_FOLD_KEY] = {"s": fold_cal_now, "src": "cal"}
    prev_store[str(detail["sf"])] = baseline
    with open(prev_path, "w") as f:
        json.dump(prev_store, f, indent=1, sort_keys=True)

    # the ONLY stdout line. Per-query timings ride along (VERDICT r14 #2:
    # the driver's PERF comparator reads only this line, so without them
    # its per-query/regression/scaling tables come back empty every
    # round); compact separators + 3-decimal rounding keep the line ~4 KB
    # for 107 rows, well inside any sane tail capture.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": detail["value"],
                "unit": "sec",
                "n_queries": len(timings),
                "queries": {q: round(s, 3) for q, s in timings.items()},
                "sf": detail["sf"],
                "max_ext_busy": max(query_ext_load.values(), default=0.0),
                "common_vs_prev_ratio": (
                    common_vs_prev["ratio"] if common_vs_prev else None
                ),
                "calibrated_ratio": (
                    common_vs_prev.get("calibrated_ratio")
                    if common_vs_prev
                    else None
                ),
                "calibration_topk_p50": cal_now,
                "n_adjudicated": sum(
                    1 for a in adjudication.values() if "prev_s" in a
                ),
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


#: rows whose cost is dominated by compute/write (vector folds, sketch
#: builds, k-means assigns, the Z-rewrite) rather than the parquet scan
#: floor. On this host the two floors drift INDEPENDENTLY (r12: a bad
#: window inflated every compute-dense row ~10% while the scan-bound
#: topk probe moved <2%), so these rows adjudicate against the
#: compute-bound fold probe's factor; everything else keeps the topk
#: factor (the suite is scan-dominated). VERDICT r12 #1.
_FOLD_CLASS = {
    "snapshot_zorder_time_prune",
    "snapshot_zorder_prune",
    "events_observed_metrics",
    "approx_distinct_accuracy",
    "kmeans_train_assign",
    "kmeans_converge_2iter",
    "embedding_top_pc",
    "embedding_top_pcs",
    "embedding_pc_variance",
    "embedding_pca_scores_topk",
    "ann_ivfpq_residual_multiprobe",
    "ann_ivfpq_residual_topk",
    "ann_ivfpq_topk",
    "dedup_simhash_pairs",
    "embedding_near_dup",
}

#: rows force-adjudicated every run regardless of the 1.3× trigger.
#: Rotation (VERDICT r13 #2): the r12 trio is pruned except
#: events_observed_metrics (driver raw 1.18 met the ≤1.2 bar but
#: calibrated 1.36 — one more round); the r13 ≥1.4-calibrated set joins.
#: All four r13 rows were measured on the SAME commit the record run
#: benched, so the expected closure is solo-vs-solo ≤1.2 (the new
#: like-for-like baseline), not a code fix. Prune once a round's
#: adjudication shows each ≤ 1.2 on a solo-vs-solo comparison.
_WATCH_ROWS = {
    "events_observed_metrics",
    "dq_snapshot_diff",
    "dedup_simhash_pairs",
    "embedding_top_pcs",
    "embedding_near_dup",
}


def _adjudicate(
    spark,
    sf_dir: str,
    GOLDEN: dict,
    prev_q: dict,
    timings: dict,
    meter: "_LoadMeter",
    n_runs: int,
    mk_session=None,
    cal_factor: float = 1.0,
    fold_cal_factor: float | None = None,
    prev_probes: tuple = (None, None),
    prev_solo: dict | None = None,
    prev_solo_probes: tuple = (None, None),
) -> dict[str, dict]:
    """Re-measure every shared row that regressed >1.3× vs the previous
    record SOLO (median-of-n, warm, own load window).

    Ratios are CALIBRATION-NORMALIZED (VERDICT r11 #1): the trigger and
    the recorded ``*_ratio_cal`` fields divide by ``cal_factor`` — this
    run's machine-speed probe over the previous run's — so a uniformly
    slower box doesn't put every row on the adjudication treadmill, and
    a row that truly regressed still trips on a uniformly faster one.
    Raw ratios stay recorded alongside. Rows the bench
    synthesizes itself (e.g. etl_top100_books_cold) have no registry
    entry to re-run — and a "cold" row re-measured warm would be a
    different quantity anyway — so they get a no-solo marker instead of
    crashing the bench.

    When ``mk_session`` is provided and any suspect is re-runnable, the
    solo re-measures run in a FRESH SparkSession: the whole point of the
    solo number is "what would a standalone rerun see", and taking it at
    the tail of the aged 95-query session biased short Python-worker
    rows UP (r9 saw a 0.43 s row solo-measure at 0.90 s that way) —
    inflation masquerading as a regression verdict."""
    adjudication: dict[str, dict] = {}
    prev_solo = prev_solo or {}
    cal = cal_factor if cal_factor and cal_factor > 0 else 1.0
    fold_cal = (
        fold_cal_factor if fold_cal_factor and fold_cal_factor > 0 else cal
    )

    def _row_cal(q: str) -> tuple[float, str]:
        # per-row probe class: compute-dense rows normalize by the fold
        # probe, scan-dominated rows by the topk probe (VERDICT r12 #1)
        if q in _FOLD_CLASS:
            return fold_cal, "fold"
        return cal, "topk"

    suspects = [
        q
        for q in sorted(set(prev_q) & set(timings))
        if prev_q[q] >= 0.3
        and (
            timings[q] / prev_q[q] / _row_cal(q)[0] > 1.3
            or q in _WATCH_ROWS
        )
    ]
    # a lapsed forced adjudication must be visible in the artifact
    # (ADVICE r13): a watch row absent from the previous record, absent
    # from this run's timings, or under the 0.3 s floor silently fell
    # out of the force list's contract — record WHY instead of nothing.
    for q in sorted(_WATCH_ROWS):
        if q in suspects:
            continue
        if q not in timings:
            why = "not in this run's headline set"
        elif q not in prev_q:
            why = "no previous record at this sf (new or renamed row)"
        else:
            why = f"previous record {prev_q[q]} s under the 0.3 s floor"
        adjudication[q] = {"note": f"watch row NOT adjudicated: {why}"}
    own_session = mk_session is not None and any(q in GOLDEN for q in suspects)
    solo_cals: dict[str, float] = {}
    solo_era_cals: dict[str, float] = {}
    if own_session:
        spark.stop()
        spark = mk_session("bookstore-lakehouse-bench-adjudicate")
        # SOLO-WINDOW probes (r13): the run-window factors were measured
        # at the START of a ~half-hour bench; the host's scan and
        # frequency floors drift on that horizon (r13 saw a 2.1× fold
        # factor at start while end-of-run solos matched prev raw — the
        # factors no longer described the window the solos ran in). Re-
        # probe in the fresh session so each solo divides by the floor
        # of ITS OWN window; run-window ratios keep the start factors.
        def _probe(q: str, warm: int = 1, runs: int = 3):
            if q not in GOLDEN:
                return None
            for _ in range(warm):
                GOLDEN[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            ts = []
            for _ in range(runs):
                t0 = time.monotonic()
                GOLDEN[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(time.monotonic() - t0)
            return round(sorted(ts)[len(ts) // 2], 3)

        topk_now, fold_now = _probe("topk_books"), _probe("ann_lsh_buckets")
        prev_topk, prev_fold = prev_probes
        if topk_now is not None and prev_topk:
            solo_cals["topk"] = topk_now / prev_topk
        if fold_now is not None and prev_fold:
            solo_cals["fold"] = fold_now / prev_fold
        # solo-ERA factors (r14 review #2): the stored solo_s baselines
        # were measured under the PREVIOUS run's solo-window probes, so
        # solo-vs-solo divides this window's probe by THAT window's —
        # never by the previous run's start-of-run probe, whose floor
        # can drift over the ~30 min bench (the r13 incident).
        prev_solo_topk, prev_solo_fold = prev_solo_probes
        if topk_now is not None and prev_solo_topk:
            solo_era_cals["topk"] = topk_now / prev_solo_topk
        if fold_now is not None and prev_solo_fold:
            solo_era_cals["fold"] = fold_now / prev_solo_fold
        adjudication["__solo_window__"] = {
            "topk_p50": topk_now,
            "fold_p50": fold_now,
            "topk_factor": round(solo_cals["topk"], 3) if "topk" in solo_cals else None,
            "fold_factor": round(solo_cals["fold"], 3) if "fold" in solo_cals else None,
        }
    for q in suspects:
        qcal, qclass = _row_cal(q)
        if q not in GOLDEN:
            adjudication[q] = {
                "prev_s": prev_q[q],
                "run_s": timings[q],
                "solo_s": None,
                "run_ratio": round(timings[q] / prev_q[q], 2),
                "run_ratio_cal": round(timings[q] / prev_q[q] / qcal, 2),
                "cal_factor": round(qcal, 3),
                "probe_class": qclass,
                "note": "bench-synthesized row; solo re-measure not applicable",
            }
            continue
        runs = []
        # ONE discarded warmup before the median (VERDICT r13 #7): the
        # first fresh-session execution pays bimodal cold costs (JIT,
        # codegen cache, page cache — zorder measured 18.8 s cold vs
        # ~4 s warm) that the in-run record never paid; mixing it into
        # the median made solo distributions bimodal. The cold time is
        # recorded separately so the artifact keeps both modes.
        t0 = time.monotonic()
        GOLDEN[q](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        cold = round(time.monotonic() - t0, 3)
        # the load meter window opens AFTER the warmup so ext_busy
        # attributes to exactly the timed runs (r14 review #4: a spike
        # confined to the long cold run must not taint a clean median)
        meter.window()
        for _ in range(n_runs):
            t0 = time.monotonic()
            GOLDEN[q](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.monotonic() - t0)
        solo = round(sorted(runs)[len(runs) // 2], 3)
        # the solo divides by its OWN window's probe factor when the
        # fresh session re-probed; else falls back to the run-window one
        solo_cal = solo_cals.get(qclass, qcal) or qcal
        adjudication[q] = {
            "prev_s": prev_q[q],
            "run_s": timings[q],
            "solo_s": solo,
            "solo_cold_s": cold,
            "run_ratio": round(timings[q] / prev_q[q], 2),
            "solo_ratio": round(solo / prev_q[q], 2),
            "run_ratio_cal": round(timings[q] / prev_q[q] / qcal, 2),
            "solo_ratio_cal": round(solo / prev_q[q] / solo_cal, 2),
            "cal_factor": round(qcal, 3),
            "solo_cal_factor": round(solo_cal, 3),
            "probe_class": qclass,
            "ext_busy": meter.window(),
            "fresh_session": own_session,
        }
        # like-for-like comparison (VERDICT r13 #2): both sides are
        # fresh-session warmed medians under their own probe windows —
        # THE ratio for regression verdicts once a solo baseline exists.
        # Calibration divides era-over-era by the SOLO-window probes
        # (this window's over the baseline window's); the run-window
        # factor is only the fallback when no solo-era probe was stored.
        if prev_solo.get(q):
            svs_cal = solo_era_cals.get(qclass) or solo_cal
            adjudication[q]["solo_prev_s"] = prev_solo[q]
            adjudication[q]["solo_vs_solo"] = round(solo / prev_solo[q], 2)
            adjudication[q]["solo_vs_solo_cal"] = round(
                solo / prev_solo[q] / svs_cal, 2
            )
            adjudication[q]["solo_vs_solo_cal_factor"] = round(svs_cal, 3)
        if q in _WATCH_ROWS:
            adjudication[q]["note"] = (
                "watch row (VERDICT r13 #2): force-adjudicated against "
                "its probe class regardless of the 1.3x trigger"
            )
    if own_session:
        spark.stop()
    return adjudication


def _winnow_stages(spark, d: str) -> dict:
    """Per-stage wall-time attribution for the dedup_winnowed_pairs growth
    row (VERDICT r11 #2): its recorded ratio fluctuated 2.4–3.0× across
    rounds at LINEAR candidate growth, which time-plus-candidates alone
    can't adjudicate. Mirrors ``operators/dedup.py::winnowed_pairs``'s
    exact stages (same literals as q_dedup_winnowed_pairs: k=3, window=4,
    min_shared=2, max_df=100) with each stage pinned so the next times
    only its own work: postings (rolling-hash + winnow minima), stop-
    filter (df counts + join), join_agg (self-join + pair agg +
    min_shared cut). Stages are warm and attribute structurally — they
    don't decompose the timed min-of-N arithmetically (same contract as
    the cold-ETL phase split)."""
    import time as _t

    from pyspark.sql import functions as F

    from bookstore_aws_lakehouse_spark.operators.dedup import (
        winnowed_fingerprints,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    t0 = _t.monotonic()
    fps = winnowed_fingerprints(docs, "doc_id", "text", 3, 4).persist()
    fps.write.format("noop").mode("overwrite").save()
    t1 = _t.monotonic()
    counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
    filt = (
        fps.join(counts.filter(F.col("_df") <= 100), "fp")
        .select(F.col("doc_id"), "fp")
        .persist()
    )
    filt.write.format("noop").mode("overwrite").save()
    t2 = _t.monotonic()
    a = filt.select(F.col("doc_id").alias("id_a"), "fp")
    b = filt.select(F.col("doc_id").alias("id_b"), "fp")
    (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    ).write.format("noop").mode("overwrite").save()
    t3 = _t.monotonic()
    fps.unpersist()
    filt.unpersist()
    return {
        "postings_s": round(t1 - t0, 3),
        "stop_filter_s": round(t2 - t1, 3),
        "join_agg_s": round(t3 - t2, 3),
    }


def _time_stages(stages) -> dict:
    """Generic per-stage wall-time attribution for a growth row (VERDICT
    r11 #7 stretch, generalizing ``_winnow_stages``): each stage is a
    (label, thunk, pin) triple; the thunk builds the stage's DataFrame
    FROM THE OPERATOR'S OWN ``stages`` recorder (operators/dedup.py —
    the frames are recorded as the operator builds them, so the split
    can never drift from the implementation). Pinned stages persist
    before the noop write, so the next stage's plan substitutes the
    cached subtree via the CacheManager and times only its own work.
    Stages are warm and attribute structurally — they don't decompose
    the timed min-of-N arithmetically (same contract as the cold-ETL
    phase split)."""
    out: dict = {}
    pinned = []
    try:
        for label, thunk, pin in stages:
            t0 = time.monotonic()
            frame = thunk()
            if pin:
                frame = frame.persist()
                pinned.append(frame)
            frame.write.format("noop").mode("overwrite").save()
            out[f"{label}_s"] = round(time.monotonic() - t0, 3)
    finally:
        for f in pinned:
            f.unpersist()
    return out


def _shingle_stages(op_name: str, threshold: float):
    """Stage split for the jaccard/containment growth rows: postings
    (tokenize→shingle→md5), stop-filter (df counts + join), join_agg
    (inverted-index self-join + pair agg), score (sizes join + threshold
    cut). Literals mirror the golden rows (shingle_k=3, max_df=100)."""

    def run(spark, d: str) -> dict:
        from bookstore_aws_lakehouse_spark.operators import dedup as _dd

        op = getattr(_dd, op_name)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        st: dict = {}
        op(
            docs, "doc_id", "text", shingle_k=3, threshold=threshold,
            pin=False, stages=st,
        )
        order = ["postings", "stop_filter", "join_agg", "score"]
        labels = [k for k in order if k in st]
        return _time_stages(
            [
                (k, (lambda k=k: st[k]), k != labels[-1])
                for k in labels
            ]
        )

    return run


def _minhash_stages(spark, d: str) -> dict:
    """Stage split for dedup_minhash_pairs: signatures (shingle→minhash
    wide), banding (band-key explode + saturated-bucket cap; the cap's
    eager size probe runs at construction, outside the timers), join_agg
    (band self-join + pair agg). Literals mirror the golden row."""
    from bookstore_aws_lakehouse_spark.operators.dedup import minhash_band_pairs

    docs = spark.read.parquet(f"{d}/documents.parquet")
    st: dict = {}
    minhash_band_pairs(
        docs, "doc_id", "text", num_hashes=8, band_rows=2, shingle_k=3,
        stages=st,
    )
    order = ["signatures", "banding", "join_agg"]
    return _time_stages(
        [(k, (lambda k=k: st[k]), k != order[-1]) for k in order]
    )


def _multiprobe_stages(spark, d: str) -> dict:
    """Stage split for ann_ivfpq_residual_multiprobe: residuals (coarse
    assign + subtract — the index-build scan), probes (per-query nprobe
    cell selection), search (seeds/encode/LUT/ADC/top-k — the golden row
    end-to-end with the first two stages' subtrees already cached; its
    internal localCheckpoints copy from cache instead of recomputing).
    Composes the operator's own public stage functions — nothing
    re-implemented."""
    from pyspark.sql import functions as F

    from bookstore_aws_lakehouse_spark.operators.similarity import (
        coarse_probe_cells,
        vector_residuals,
    )
    from bookstore_aws_lakehouse_spark.queries_similarity import N_QUERIES

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return _time_stages(
        [
            ("residuals", lambda: vector_residuals(emb, centroids), True),
            ("probes", lambda: coarse_probe_cells(queries, centroids, 2), True),
            (
                "search",
                lambda: _GOLDEN_FOR_STAGES["ann_ivfpq_residual_multiprobe"](
                    spark, d
                ),
                False,
            ),
        ]
    )


#: golden registry handle for the stage splits (set by _growth_section —
#: avoids importing __spark_entry__ at module import time)
_GOLDEN_FOR_STAGES: dict = {}

#: per-row stage splits recorded in the growth artifact (VERDICT r11 #2
#: for winnowed; #7 stretch for the rest): names which stage grows when
#: a ratio disagrees with the linear candidate counters
GROWTH_STAGE_SPLITS = {
    "dedup_winnowed_pairs": lambda spark, d: _winnow_stages(spark, d),
    "dedup_ngram_jaccard": _shingle_stages("jaccard_pairs", 0.1),
    "dedup_containment_pairs": _shingle_stages("containment_pairs", 0.5),
    "dedup_minhash_pairs": _minhash_stages,
    "ann_ivfpq_residual_multiprobe": _multiprobe_stages,
}


def mutate_docs(docs, c: int):
    """Growth-corpus copy c of a documents DataFrame: every word whose
    hash(word, c) is 0 or 1 mod 3 (~2/3 of words) is rewritten to a
    copy-tagged token. Keyed on word CONTENT so duplicate parent docs
    stay duplicates within a family, while parent↔copy 3-gram survival
    is (1/3)³ ≈ 0.037 → Jaccard ≈ 0.02, and copy↔copy (1/9)³ ≈ 0.001 —
    an order of magnitude below the loosest dedup threshold (0.1), with
    margin for the variance content-keyed flips add on short docs (a 1/2
    rewrite rate measured 0.125 on one pair — too close). The
    constant-duplicate-density property is pinned by
    tests/test_bench_growth.py against this exact expression."""
    from pyspark.sql import functions as F

    words = F.split(F.col("text"), " ")
    mutated = F.transform(
        words,
        lambda x: F.when(
            F.pmod(F.hash(x, F.lit(c)), F.lit(3)) < 2,
            F.concat(x, F.lit(f"~{c}")),
        ).otherwise(x),
    )
    return docs.select(
        (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
        F.array_join(mutated, " ").alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def _growth_section(spark, sf_dir: str, GOLDEN, meter: "_LoadMeter") -> dict:
    """Sub-quadratic-growth proof for the banded dedup/ANN paths: time the
    same queries on the fixture corpus and on a 10×-synthesized one; an
    all-pairs shape would grow ~100×, the banded shapes should grow
    ~linearly (10–25× with fixed overheads amortizing).

    The synthesized copies must hold DUPLICATE DENSITY constant, or the
    ratio measures output-pair volume instead of scaling. Doc copy c is
    built by ``mutate_docs`` (see its docstring — the single source of
    truth for the mutation rate and the resulting Jaccard bounds, pinned
    by tests/test_bench_growth.py): ~2/3 of words rewritten, keyed on
    word CONTENT (not position) so near-dup parents stay near-dups
    within a family while parent↔copy and copy↔copy similarity lands an
    order of magnitude below every configured threshold. Each family
    thus reproduces the original corpus's pair structure — true pairs
    grow ~10×, exactly the linear workload a scale-up should present.
    (The previous stride-drop scheme — copy c drops every (c+2)-th
    word — left high-c copies ~90% shingle-identical to their parents
    and every same-parent copy pair mutually similar: a dup-density
    explosion that inflated measured ratios to 10-27×.) Embedding copy c
    rotates the dimensions by c (decorrelates sign-LSH and IVF cells).

    Each growth measurement is the MIN of ``SPARK_GRAFT_GROWTH_RUNS``
    (default 2) runs: these are single long jobs on a co-tenanted host,
    and min is the standard unloaded-machine statistic — a one-off
    scheduling spike otherwise doubles a ratio.
    """
    import functools
    import shutil
    import tempfile

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    names = [
        "dedup_minhash_pairs",
        "dedup_ngram_jaccard",
        "dedup_simhash_pairs",
        "ann_lsh_buckets",
        # iterative shapes (VERDICT r5 #3): the only scale-sensitive paths
        # that previously had no growth datapoint. Expected ≈linear: the
        # iteration COUNT stays 2-3 (near-clique components), so growth is
        # driven by per-round join volume, not round count.
        "dedup_clusters",
        "dedup_survivors",
        # r12 (VERDICT r11 #3): the bounded-contract CC variant — the cap
        # holds CC's input at ≤ 2k·|docs| edges however dense the
        # θ-passing graph gets, so its growth ratio should stay near the
        # pair-generation family's even where dedup_clusters' 25.6×
        # pair blowup drives a ~3.3× time ratio. The counter records the
        # post-cap edge count to make the bound observable per run.
        "dedup_clusters_capped",
        # r7 (VERDICT r6 #4): the two most expensive benched queries that
        # previously had no growth datapoint — the directed-containment
        # consumer of the inverted index, and the heaviest text shape
        # (per-doc bigram LM scoring over a corpus-level bigram table).
        "dedup_containment_pairs",
        "text_bigram_lm_score",
        # r7: the newest iterative shape. 10× disjoint graph copies (see
        # below) — iteration count is fixed (2), so growth is pure
        # per-iteration join/agg volume. (kmeans_train_assign is
        # deliberately absent: its centroid count also grows 10× under
        # vec_id%50 seeding, making the 10× corpus a 100× workload.)
        "graph_pagerank_purchases",
        # r8: the FIXED-codebook kmeans (seeds are vec_id < 16; the 10×
        # embedding copies live at vec_id ≥ 10M, so the centroid count
        # stays 16 and the ratio measures a true corpus scale-up —
        # expected ≈linear: per-iteration assign volume is corpus×16).
        "kmeans_converge_2iter",
        # r9: the Count-Min build — output is a FIXED depth×width grid, so
        # the 10× corpus should cost ≈10× scan/explode with an unchanged
        # shuffle ceiling (the bounded-sketch scale story, measured).
        "token_cms_heavy_hitters",
        # r9: NB training over 10× docs — the label set is fixed and the
        # mutated copies grow the vocab sublinearly, so the (label, token)
        # model grid grows far slower than the corpus; expect ≈linear
        # train/score cost dominated by the token explode.
        "text_nb_langid_confusion",
        # r10 (VERDICT r9 #3): the ANN family — previously the most
        # expensive benched rows with NO growth datapoint. Copy ids are
        # odd (see the emb_copies comment), so the vec_id%50 centroid
        # seeds and vec_id<16 PQ seeds stay FIXED and these measure a
        # true fixed-index corpus scale-up: ivfpq-residual =
        # corpus×centroids coarse assign + fixed query side (expect
        # ≈linear); semantic_dedup = within-cell pairs with 10× denser
        # cells — its auto-granularity sub-cells (r11) must hold the
        # candidate volume near-linear where fixed granularity is
        # Θ(Σ|cell|²); embedding_near_dup = sign-LSH with _auto_planes
        # holding bucket occupancy constant. The candidate counters
        # recorded alongside make each claim checkable per run.
        "ann_ivfpq_residual_multiprobe",
        "embedding_near_dup",
        "semantic_dedup",
        # r13: winnowing — the subsampled overlap index; postings are a
        # ~2/(w+1) deterministic sample of the shingle index, so growth
        # should track (or beat) dedup_ngram_jaccard's
        "dedup_winnowed_pairs",
        # r19 (pre-staged, pending until the r15 flip): the two-stage
        # LSH→exact-verify row — its cost contract is per-candidate, so
        # the growth entry (with the LSH-pair counter riding alongside)
        # is the measured form of that claim. Skipped with a note while
        # unregistered.
        "dedup_lsh_verified",
    ]
    factor = 10
    tmp = tempfile.mkdtemp(prefix="bench_growth_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

        doc_copies = [docs]
        for c in range(1, factor):
            doc_copies.append(mutate_docs(docs, c))
        functools.reduce(DataFrame.unionByName, doc_copies).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/documents.parquet")

        emb_copies = [emb]
        for c in range(1, factor):
            v = F.col("embedding")
            dim = F.size(v)
            rot = F.concat(F.slice(v, c + 1, 4096), F.slice(v, 1, c))
            # copy ids are ODD by construction — 2·(id + c·10M) + 1 — so
            # no copy row can satisfy the IVF-family centroid seeding
            # (vec_id % 50 == 0 needs an even id) OR the PQ seed rule
            # (vec_id < 16): the centroid/codebook set stays EXACTLY the
            # base corpus's, making this a true fixed-granularity corpus
            # scale-up. (The previous +c·10_000_007 offset only shifted
            # WHICH rows hit the % 50 == 0 grid — base ids cover every
            # residue class, so each copy contributed ~2% NEW seeds and
            # the centroid count silently grew 10× with the corpus; the
            # r10 growth numbers for the IVF rows therefore measured the
            # scaled-granularity workload, not the fixed one. Caught by
            # the candidate counters this section now records.)
            emb_copies.append(
                emb.select(
                    (
                        (F.col("vec_id") + c * 10_000_000) * 2 + 1
                    ).alias("vec_id"),
                    rot.alias("embedding"),
                    "label",
                )
            )
        functools.reduce(DataFrame.unionByName, emb_copies).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/embeddings.parquet")

        # 10× purchase graph for pagerank: copy c offsets every key into
        # its own id space → 10 DISJOINT subgraphs, so per-node structure
        # (and rank values) are copy-identical while edge volume grows
        # exactly 10× — the linear workload a scale-up should present.
        # Only the columns the query reads are shipped (column pruning
        # makes the rest dead weight).
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_suppkey"
        )
        o_copies, l_copies = [orders], [li]
        for c in range(1, factor):
            o_copies.append(
                orders.select(
                    (F.col("o_orderkey") + c * 100_000_000).alias("o_orderkey"),
                    (F.col("o_custkey") + c * 10_000_000).alias("o_custkey"),
                )
            )
            l_copies.append(
                li.select(
                    (F.col("l_orderkey") + c * 100_000_000).alias("l_orderkey"),
                    (F.col("l_suppkey") + c * 10_000_000).alias("l_suppkey"),
                )
            )
        functools.reduce(DataFrame.unionByName, o_copies).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/orders.parquet")
        functools.reduce(DataFrame.unionByName, l_copies).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/lineitem.parquet")

        # min-of-3 (was 2): r10 isolation run measured dedup_minhash_pairs
        # at 1.9x growth while the min-of-2 bench recorded 8.9x on the
        # same code — one extra run per measurement closes that gap
        g_runs = int(os.environ.get("SPARK_GRAFT_GROWTH_RUNS", "3"))

        def timed_min(name: str, d: str) -> float:
            best = float("inf")
            for _ in range(g_runs):
                t0 = time.monotonic()
                GOLDEN[name](spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            return best

        # candidate-volume counters (VERDICT r10 #4): count AFTER timing —
        # a separate untimed job per scale — so a 3-4x time ratio can be
        # attributed to inherent pair growth vs shuffle inefficiency
        try:
            from bookstore_aws_lakehouse_spark.instrumentation import (
                GROWTH_CANDIDATE_COUNTERS,
            )
        except ImportError:
            GROWTH_CANDIDATE_COUNTERS = {}
        try:
            from bookstore_aws_lakehouse_spark.instrumentation import (
                GROWTH_RECALL_FLOOR,
                GROWTH_RECALL_PROBES,
            )
        except ImportError:
            GROWTH_RECALL_PROBES, GROWTH_RECALL_FLOOR = {}, None

        # quiet-box gate (VERDICT r10 #6): growth ratios are the artifact
        # section most distorted by co-tenant load (r10's recorded 4.61x
        # vs 3.0x quiet for the same code) — re-measure hot windows,
        # keep the quietest
        ext_gate = float(os.environ.get("SPARK_GRAFT_EXT_GATE", "0.3"))

        out = {"factor": factor, "queries": {}}
        for name in names:
            if name not in GOLDEN:
                # no silent coverage caps: a listed-but-unregistered row
                # (pending-channel pre-staging) leaves a visible note so
                # the lapse is in the artifact, not just absent from it
                out["queries"][name] = {
                    "note": "not registered (pending) — activates at flip"
                }
                continue
            entry: dict = {}
            attempts = 0
            for _attempt in range(2):
                meter.window()  # per-query window: growth ratios need the
                # same load evidence as the headline rows (VERDICT r7 #5) —
                # a ratio measured under co-tenant load is un-adjudicable
                base = timed_min(name, sf_dir)
                big = timed_min(name, tmp)
                cur = {
                    "base_s": round(base, 3),
                    "x10_s": round(big, 3),
                    "ratio": round(big / base, 2) if base > 0 else None,
                    "ext_busy": meter.window(),
                }
                attempts += 1
                if not entry or cur["ext_busy"] < entry["ext_busy"]:
                    entry = cur
                if entry["ext_busy"] <= ext_gate:
                    break
            if attempts > 1:
                entry["gate_retries"] = attempts - 1
            if entry["ext_busy"] > ext_gate:
                entry["load_waived"] = True
            counter = GROWTH_CANDIDATE_COUNTERS.get(name)
            if counter is not None:
                try:
                    cb = counter(spark, sf_dir)
                    cx = counter(spark, tmp)
                    entry["candidates_base"] = cb
                    entry["candidates_x10"] = cx
                    entry["candidate_ratio"] = round(cx / cb, 2) if cb else None
                except Exception as exc:  # diagnostic only — never fail bench
                    entry["candidates_error"] = f"{type(exc).__name__}: {exc}"[:200]
                meter.window()  # counting jobs are outside every window
            recall_fn = GROWTH_RECALL_PROBES.get(name)
            if recall_fn is not None:
                # quality axis at both scales (VERDICT r12 #5): 10× data
                # means 10× denser cells at the same nprobe — the growth
                # entry must show recall held, not just that cost did.
                # Untimed w.r.t. the ratio above.
                try:
                    entry["recall_base"] = recall_fn(spark, sf_dir)
                    entry["recall_x10"] = recall_fn(spark, tmp)
                    entry["recall_floor"] = GROWTH_RECALL_FLOOR
                except Exception as exc:
                    entry["recall_error"] = f"{type(exc).__name__}: {exc}"[:200]
                meter.window()
            stage_fn = GROWTH_STAGE_SPLITS.get(name)
            if stage_fn is not None:
                # per-stage attribution (VERDICT r11 #2/#7) — names which
                # stage grows when the ratio disagrees with the linear
                # candidate counters; untimed w.r.t. the ratio above
                _GOLDEN_FOR_STAGES.update(GOLDEN)
                try:
                    entry["stages_base"] = stage_fn(spark, sf_dir)
                    entry["stages_x10"] = stage_fn(spark, tmp)
                except Exception as exc:
                    entry["stages_error"] = f"{type(exc).__name__}: {exc}"[:200]
                meter.window()
            out["queries"][name] = entry
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _skew_section(spark, meter: "_LoadMeter") -> dict:
    """Skew-join evidence on synthesized zipfian data (the fixtures have
    no heavy key): a 4M-row fact where ONE key holds 40% of rows joins a
    200k-row dim too big to broadcast. Three strategies, one timed run
    each (own key so the headline total stays round-comparable):

    - plain_noaqe  — sort-merge, no mitigation: the hot key's partition
      is the straggler every other task waits on.
    - aqe_skew     — AQE skew-join split (thresholds lowered so the
      optimization actually triggers at this data size; at production
      partition sizes the defaults trigger on their own).
    - salted_hot   — operators/joins.py::salted_join with hot_keys=[0]
      (the one skewed key), num_salts=16: replicates only the hot key's
      dim row instead of the whole dim ×16. This is the form that works
      where AQE can't see the skew (a single giant shuffle block, or the
      skew surviving INSIDE one task after AQE's split limit). The old
      blanket-salting row was retired (VERDICT r7 #6): replicating a
      200k-row dim 16× measurably LOST to the un-mitigated join on this
      data size — AQE plus hot-key-targeted salting supersede it.
    """
    from pyspark.sql import functions as F

    from bookstore_aws_lakehouse_spark.operators.joins import salted_join

    fact = spark.range(4_000_000).select(
        F.when(F.col("id") % 5 < 2, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(200_000)))
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("grp")
    )

    def agg_of(joined):
        return joined.groupBy("grp").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        )

    saved = {
        c: spark.conf.get(c)
        for c in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    out: dict = {}

    def timed_p50(df) -> float:
        # median-of-3: these are 1-2 s jobs on a co-tenanted host; a
        # single cold/noisy run has repeatedly flipped the three rows'
        # ordering and confused the round-over-round reading
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        return round(sorted(runs)[1], 3)

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        meter.window()

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        out["plain_noaqe"] = timed_p50(agg_of(fact.join(dim, "k")))

        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        out["aqe_skew"] = timed_p50(agg_of(fact.join(dim, "k")))

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        out["salted_hot"] = timed_p50(
            agg_of(salted_join(fact, dim, on="k", num_salts=16, hot_keys=[0]))
        )
        out["ext_busy"] = meter.window()
    finally:
        for c, v in saved.items():
            spark.conf.set(c, v)
    return out


if __name__ == "__main__":
    sys.exit(main())
