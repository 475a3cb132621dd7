"""Bucketed co-located join: prove the join on the bucket key runs with
ZERO Exchange — the write-once-shuffle-never property that makes repeated
fact-fact joins viable at 100 TB."""

from __future__ import annotations

import contextlib
import io

from bookstore_aws_lakehouse_spark.sources.writers import save_as_bucketed_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    save_as_bucketed_table(li, "b_lineitem", ["l_orderkey"], num_buckets=4, sort_cols=["l_orderkey"])
    save_as_bucketed_table(orders, "o_orders", ["o_orderkey"], num_buckets=4, sort_cols=["o_orderkey"])

    bl = spark.table("b_lineitem")
    bo = spark.table("o_orders")
    # force a non-broadcast join so the exchange question is real
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        plan = _plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it is actually correct
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_equals_plain_join(spark):
    from bookstore_aws_lakehouse_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("cold", 1)], ["k", "v"]
    )
    right = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "tag"])
    plain = {(r["k"], r["v"], r["tag"]) for r in left.join(right, "k").collect()}
    salted = {(r["k"], r["v"], r["tag"]) for r in salted_join(left, right, "k", num_salts=4).collect()}
    assert salted == plain


def test_incremental_dedup_bucketed_store(spark):
    """Cross-batch dedup against a BUCKETED fingerprint store: same
    survivors contract as the path-based version, and the store side of
    the anti-join must read without an Exchange (the store never
    reshuffles as it grows)."""
    from bookstore_aws_lakehouse_spark.operators.dedup import (
        incremental_dedup_bucketed,
    )

    spark.sql("DROP TABLE IF EXISTS fp_store_test")
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    s1 = incremental_dedup_bucketed(b1, "fp_store_test")
    assert {r["doc_id"] for r in s1.collect()} == {1, 2}  # in-batch dup collapsed

    b2 = spark.createDataFrame(
        [(10, "alpha beta"), (11, "epsilon zeta")], "doc_id long, text string"
    )
    s2 = incremental_dedup_bucketed(b2, "fp_store_test")
    assert {r["doc_id"] for r in s2.collect()} == {11}  # cross-batch dup dropped

    # the store side of the anti-join is bucket-scanned, not shuffled:
    # with broadcast disabled, the only Exchange allowed is the NEW side
    store = spark.table("fp_store_test")
    probe = spark.createDataFrame([("x",)], "fingerprint string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = probe.join(store, "fingerprint", "left_anti")
        plan = _plan(joined)
        import re

        exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
        assert len(exchanges) <= 1, plan  # probe side only; store side bucket-reads
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS fp_store_test")


def test_hot_key_salted_join_equals_plain_and_detects(spark):
    """The production salting form: only DETECTED hot keys are salted, so
    the replicated side grows by |hot| rows per salt, not its whole row
    count. Results must equal the plain join for inner and left joins
    (including unmatched-left rows), and detect_hot_keys must find
    exactly the heavy key."""
    from bookstore_aws_lakehouse_spark.operators.joins import (
        detect_hot_keys,
        salted_join,
    )

    left = spark.createDataFrame(
        [("hot", i) for i in range(300)]
        + [("cold%d" % i, i) for i in range(30)]
        + [("orphan", 1)],
        ["k", "v"],
    )
    right = spark.createDataFrame(
        [("hot", "H")] + [("cold%d" % i, "C%d" % i) for i in range(30)],
        ["k", "tag"],
    )
    hot = detect_hot_keys(left, "k", threshold_frac=0.5)
    assert hot == ["hot"]

    plain_inner = {(r.k, r.v, r.tag) for r in left.join(right, "k").collect()}
    salted_inner = {
        (r.k, r.v, r.tag)
        for r in salted_join(left, right, "k", num_salts=8, hot_keys=hot).collect()
    }
    assert salted_inner == plain_inner

    plain_left = {(r.k, r.v, r.tag) for r in left.join(right, "k", "left").collect()}
    salted_left = {
        (r.k, r.v, r.tag)
        for r in salted_join(
            left, right, "k", num_salts=8, how="left", hot_keys=hot
        ).collect()
    }
    assert salted_left == plain_left  # orphan appears exactly once

    # empty hot set degrades to the plain join (no replication)
    assert {
        (r.k, r.v, r.tag)
        for r in salted_join(left, right, "k", hot_keys=[]).collect()
    } == plain_inner


def test_hot_key_salting_replicates_only_hot_rows(spark):
    """Cost contract: with hot_keys, the replicated side's row count is
    |other| + (num_salts - 1) × |hot rows in other| — not num_salts ×
    |other|."""
    from pyspark.sql import functions as F

    from bookstore_aws_lakehouse_spark.operators.joins import salted_join

    left = spark.createDataFrame([("hot", 1), ("c", 2)], ["k", "v"])
    right = spark.createDataFrame(
        [("hot", "H")] + [("c%d" % i, "x") for i in range(99)], ["k", "tag"]
    )
    # peek at the salted right side via the join's internal construction:
    # replicate the expression here and count
    num_salts = 16
    salted_r = right.withColumn(
        "_salt",
        F.explode(
            F.when(
                F.col("k").isin(["hot"]),
                F.sequence(F.lit(0), F.lit(num_salts - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    assert salted_r.count() == 100 + (num_salts - 1)  # one hot row fans out
    # and the full blanket form would be 100 * num_salts
    out = salted_join(left, right, "k", num_salts=num_salts, hot_keys=["hot"])
    assert {(r.k, r.v, r.tag) for r in out.collect()} == {("hot", 1, "H")}
