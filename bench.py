"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query executes fully via a noop-format write (no driver collect, no
sink I/O in the timing) after a warm-up of the session + input footers.
Per-query numbers are the p50 of $SPARK_GRAFT_BENCH_RUNS runs (default
3) — single-run drift at sub-second query times was indistinguishable
from regression in round 1 (25 s vs 31 s on identical code).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from bookstore_aws_lakehouse_spark.session import get_spark

    spark = get_spark(
        app_name="bookstore-lakehouse-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )

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

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in headline:
        if name not in GOLDEN:
            continue
        runs = []
        for _ in range(n_runs):
            t0 = time.monotonic()
            GOLDEN[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
