"""Degenerate-input hardening: operators must behave on empty frames (a
real condition at scale — an empty partition, a filter that drops
everything, a day with no events)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.operators.dedup import (
    connected_components,
    jaccard_pairs,
    minhash_band_pairs,
)
from bookstore_aws_lakehouse_spark.operators.sort import top_k
from bookstore_aws_lakehouse_spark.operators.temporal import asof_join
from bookstore_aws_lakehouse_spark.operators.windows import top_n_per_group


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_top_k_empty(spark):
    df = spark.createDataFrame([], "k string, v double")
    assert top_k(df, [("v", True)], 5, tiebreak=["k"]).count() == 0


def test_top_n_per_group_empty(spark):
    df = spark.createDataFrame([], "g string, v double")
    assert top_n_per_group(df, ["g"], [("v", True)], 3).count() == 0


def test_dedup_ops_empty(spark):
    docs = _empty_docs(spark)
    assert jaccard_pairs(docs, "doc_id", "text").count() == 0
    assert minhash_band_pairs(docs, "doc_id", "text").count() == 0


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0


def test_asof_join_no_right_rows(spark):
    left = spark.createDataFrame([(1, 100), (1, 200)], "user_id long, t long")
    right = spark.createDataFrame([], "user_id long, t long")
    out = asof_join(left, right, time_col="t", by=["user_id"], value_cols=[])
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["t_asof"] is None for r in rows)


def test_single_token_doc_has_no_shingles(spark):
    docs = spark.createDataFrame([(1, "word")], "doc_id long, text string")
    # 3-gram shingles of a 1-token doc: none; no pairs, no crash
    assert jaccard_pairs(docs, "doc_id", "text", shingle_k=3).count() == 0


def test_incremental_dedup_across_batches(spark, tmp_path):
    from bookstore_aws_lakehouse_spark.operators.dedup import incremental_dedup

    store = str(tmp_path / "fingerprints")
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "Alpha  Beta GAMMA")],
        "doc_id long, text string",
    )
    # doc 3 is a near-exact dup of doc 1 (case/whitespace) → collapses in-batch
    out1 = {r["doc_id"] for r in incremental_dedup(b1, store).collect()}
    assert out1 == {1, 2}

    b2 = spark.createDataFrame(
        [(10, "delta epsilon"), (11, "brand new words")],
        "doc_id long, text string",
    )
    # doc 10 duplicates batch-1 content → dropped by the store
    out2 = {r["doc_id"] for r in incremental_dedup(b2, store).collect()}
    assert out2 == {11}

    # replaying batch 2 drops everything (store remembered doc 11 too)
    out3 = incremental_dedup(b2, store).count()
    assert out3 == 0


def test_simhash_pairs_empty_and_single(spark):
    from bookstore_aws_lakehouse_spark.operators.dedup import simhash_pairs

    assert simhash_pairs(_empty_docs(spark), "doc_id", "text").count() == 0
    one = spark.createDataFrame([(1, "only doc")], "doc_id long, text string")
    assert simhash_pairs(one, "doc_id", "text").count() == 0


def test_cosine_pairs_empty(spark):
    from bookstore_aws_lakehouse_spark.operators.similarity import cosine_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert cosine_pairs(empty).count() == 0
    assert cosine_pairs(empty, exact=True).count() == 0


def test_stratified_sample_empty_and_tiny_stratum(spark):
    from bookstore_aws_lakehouse_spark.operators.sampling import stratified_sample

    empty = spark.createDataFrame([], "doc_id long, lang string")
    assert stratified_sample(empty, "doc_id", "lang", 50).count() == 0
    # a stratum SMALLER than the target keeps all its rows (keep-rate caps
    # at SAMPLE_PPM = 1e6 ppm)
    tiny = spark.createDataFrame(
        [(i, "xx") for i in range(5)], "doc_id long, lang string"
    )
    assert stratified_sample(tiny, "doc_id", "lang", 50).count() == 5


def test_jaccard_max_df_bounds_hot_shingle_fanout(spark):
    """A shingle shared by every doc must NOT fan out into all-pairs
    candidates when max_df is active: docs sharing ONLY the hot shingle
    produce zero pairs."""
    docs = spark.createDataFrame(
        [(i, f"common phrase here unique{i} word{i} tail{i}") for i in range(30)],
        "doc_id long, text string",
    )
    # every doc contains the 'common phrase here' shingle; with max_df
    # below the corpus size it is dropped and nothing else is shared
    assert jaccard_pairs(docs, "doc_id", "text", threshold=0.01, max_df=10).count() == 0
    # without the guard, the hot shingle creates all 30*29/2 candidates
    assert (
        jaccard_pairs(docs, "doc_id", "text", threshold=0.01, max_df=None).count()
        == 30 * 29 / 2
    )


def test_null_text_docs_do_not_crash_dedup(spark):
    """NULL text (a real condition after a bad join or optional column):
    tokenize/shingle paths must treat it as no-tokens, not crash."""
    from bookstore_aws_lakehouse_spark.operators.dedup import (
        fingerprint_duplicates,
        simhash_pairs,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "a b c d e"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    assert jaccard_pairs(docs, "doc_id", "text", threshold=0.1).count() == 1
    pairs = simhash_pairs(docs, "doc_id", "text", max_hamming=3)
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(2, 3)}
    # the null doc still fingerprints (md5 of NULL is NULL -> its own group)
    assert fingerprint_duplicates(docs, "doc_id", "text").count() == 2


def test_incremental_dedup_passes_null_text_through(spark, tmp_path):
    """NULL-text docs can't be fingerprinted; they must pass through as
    survivors — a null-unsafe join would silently DROP them (data loss)."""
    from bookstore_aws_lakehouse_spark.operators.dedup import incremental_dedup

    store = str(tmp_path / "fp_store")
    batch = spark.createDataFrame(
        [(1, None), (2, "x y z"), (3, "x y z")], "doc_id long, text string"
    )
    surv = {r["doc_id"] for r in incremental_dedup(batch, store).collect()}
    assert surv == {1, 2}  # null passes through; in-batch dup collapsed
    # a second null-text doc in a later batch also survives (no NULL ever
    # enters the store or the anti-join)
    b2 = spark.createDataFrame([(9, None), (10, "x y z")], "doc_id long, text string")
    surv2 = {r["doc_id"] for r in incremental_dedup(b2, store).collect()}
    assert surv2 == {9}


def test_stratified_sample_giant_stratum_never_vanishes(spark):
    """A stratum more than 10^6/target times the target must still keep
    ~n/10^6 rows (rate clamps to >=1 ppm), never zero — the largest
    classes are the whole point of downsampling."""
    from bookstore_aws_lakehouse_spark.operators.sampling import (
        SAMPLE_PPM,
        stratified_sample,
    )

    # rate = floor(1 * 1e6 / 2000) = 500 ppm -> expect ~1 row, never 0 by
    # formula; the CLAMP path needs n > 1e6, impractical here, so assert
    # the formula floor behavior directly at a small scale instead:
    big = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    out = stratified_sample(big, "doc_id", "lang", 1)
    # 500 ppm of 2000 ~ 1 expected; deterministic hash -> fixed count >= 0
    # and, critically, the RATE is not zero:
    rate = max(1, min(SAMPLE_PPM, int(1 * SAMPLE_PPM / 2000)))
    assert rate == 500
    assert out.count() <= 10  # sane ceiling: ~binomial(2000, 5e-4)


def test_stratified_sample_null_stratum_not_dropped(spark):
    """NULL stratum values sample like any other class (null-safe join),
    instead of disappearing."""
    from bookstore_aws_lakehouse_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, None) for i in range(10)] + [(100 + i, "en") for i in range(10)],
        "doc_id long, lang string",
    )
    out = stratified_sample(df, "doc_id", "lang", 50)  # target > stratum: keep all
    assert out.count() == 20


def test_cosine_pairs_tolerates_null_vectors(spark):
    """A NULL embedding must not crash the pandas bucketing stage; it
    simply produces no pairs (matching the exact path's NULL-cosine
    semantics)."""
    from bookstore_aws_lakehouse_spark.operators.similarity import cosine_pairs

    df = spark.createDataFrame(
        [(1, None), (2, [1.0] * 64), (3, [1.0] * 64)],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cosine_pairs(df, threshold=0.4).collect()}
    assert pairs == {(2, 3)}


def test_asof_join_null_value_in_latest_right_row(spark):
    """The as-of row wins ATOMICALLY: when the most recent right row has a
    NULL value column, the result must carry that NULL — not an older
    row's value paired with the newer row's time."""
    left = spark.createDataFrame([(10, 3)], "user_id long, t long")
    right = spark.createDataFrame(
        [(10, 1, 5), (10, 2, None)], "user_id long, t long, v long"
    )
    row = asof_join(left, right, time_col="t", by=["user_id"], value_cols=["v"]).collect()[0]
    assert row["t_asof"] == 2 and row["v_asof"] is None


def test_snapshot_diff_null_keys_and_delimiter_values(spark):
    """NULL-keyed rows unchanged in both snapshots are NOT phantom
    added+removed pairs (null-safe key join), and delimiter characters
    inside values cannot make different rows hash alike (length-prefixed
    fields)."""
    from bookstore_aws_lakehouse_spark.operators.quality import snapshot_diff

    old = spark.createDataFrame(
        [(None, "same"), (1, "a\x1fb,c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(None, "same"), (1, "a,b\x1fc")], "k long, v string"
    )
    got = {(r["k"], r["status"]) for r in snapshot_diff(old, new, ["k"]).collect()}
    # NULL key row is unchanged -> absent; key 1 moved the delimiter -> changed
    assert got == {(1, "changed")}


def test_salted_join_rejects_outer_joins(spark):
    import pytest as _pytest

    from bookstore_aws_lakehouse_spark.operators.joins import salted_join

    l = spark.createDataFrame([("k", 1)], ["k", "v"])
    r = spark.createDataFrame([("k", "x")], ["k", "t"])
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(l, r, on="k", how="full")


def test_multimodal_null_payload_does_not_crash(spark):
    from bookstore_aws_lakehouse_spark.operators.multimodal import (
        attach_payload,
        extract_media_features,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "hello world")], "doc_id long, text string"
    )
    media = attach_payload(docs, "doc_id", "text")
    feats = {r["doc_id"]: r for r in extract_media_features(media, fake_decode=True).collect()}
    assert feats[1]["n_bytes"] is None and feats[1]["content_md5"] is None
    assert feats[2]["n_bytes"] == 11
    frames = sample_frames(media, fake=True).collect()
    assert {r["doc_id"] for r in frames} == {2}


def test_incremental_dedup_reliable_checkpoint(spark, tmp_path):
    """reliable=True routes the survivors pin through the dir-based
    checkpoint (cluster-durable) with identical results; without a
    checkpoint dir configured it must fail loudly, not silently degrade."""
    from bookstore_aws_lakehouse_spark.operators.dedup import incremental_dedup

    store = str(tmp_path / "fp_store")
    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "alpha text"), (3, "other")], ["doc_id", "text"]
    )
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    out1 = {r["doc_id"] for r in incremental_dedup(b1, store, reliable=True).collect()}
    assert out1 == {1, 3}
    b2 = spark.createDataFrame([(4, "alpha text"), (5, "new")], ["doc_id", "text"])
    out2 = {r["doc_id"] for r in incremental_dedup(b2, store, reliable=True).collect()}
    assert out2 == {5}


def test_cms_empty_corpus(spark):
    from bookstore_aws_lakehouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    empty = spark.createDataFrame([], "v string")
    sk = cms_build(empty, "v", depth=4, width=64)
    assert sk.count() == 0
    probes = spark.createDataFrame([("a",)], "v string")
    got = cms_estimate(sk, probes, "v", 4, 64).collect()
    assert [(r.v, r.est_n) for r in got] == [("a", 0)]


def test_nb_score_empty_test_set(spark):
    from bookstore_aws_lakehouse_spark.operators.classify import nb_score, nb_train

    train = spark.createDataFrame(
        [(1, "aa bb", "x"), (2, "cc dd", "y")], "doc_id long, text string, label string"
    )
    model, labels = nb_train(train)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert nb_score(empty, model, labels).count() == 0


def test_apply_rollup_delta_empty_delta_is_identity(spark):
    from bookstore_aws_lakehouse_spark.operators.incremental import (
        apply_rollup_delta,
    )

    mart = spark.createDataFrame([("g1", 2, 30)], "g string, n long, s long")
    delta = spark.createDataFrame([], "g string, d_count long, d_amt long")
    out = apply_rollup_delta(mart, delta, ["g"], "n", {"s": "amt"})
    assert [(r.g, r.n, r.s) for r in out.collect()] == [("g1", 2, 30)]


def test_bloom_index_empty_table(spark, tmp_path):
    from bookstore_aws_lakehouse_spark.sources.snapshots import (
        snapshot_bloom_index,
        snapshot_overwrite,
        snapshot_point_lookup,
    )

    table = str(tmp_path / "snap_empty")
    snapshot_overwrite(spark.createDataFrame([], "k int, v string"), table)
    v = snapshot_bloom_index(spark, table, "k")
    assert v == 2
    assert snapshot_point_lookup(spark, table, "k", 1).count() == 0


def test_cap_pair_neighbors_empty(spark):
    from bookstore_aws_lakehouse_spark.operators.dedup import cap_pair_neighbors

    pairs = spark.createDataFrame([], "id_a long, id_b long, jaccard double")
    assert cap_pair_neighbors(pairs, k=5).count() == 0


def test_redact_pii_empty(spark):
    from bookstore_aws_lakehouse_spark.operators.text import redact_pii

    docs = spark.createDataFrame([], "doc_id long, text string")
    out = redact_pii(docs, "text")
    assert out.count() == 0
    assert {"text_redacted", "n_email", "n_ipv4", "n_phone"} <= set(out.columns)


def test_semantic_cell_assignment_empty(spark):
    from bookstore_aws_lakehouse_spark.operators.similarity import (
        semantic_cell_assignment,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [], "centroid_id long, embedding array<double>"
    )
    # auto-granularity's counts are 0/0 → 0 planes; assignment is empty
    assert semantic_cell_assignment(emb, cents).count() == 0


def test_sampling_export_ops_empty_and_overdraw(spark):
    """The new export family on degenerate inputs: empty frames yield
    empty results everywhere, and k > |corpus| returns the whole corpus
    (a weighted draw can never invent rows)."""
    from bookstore_aws_lakehouse_spark.operators.sampling import (
        shard_stats,
        training_order,
        weighted_sample_per_group,
        weighted_sample_topk,
    )

    empty = spark.createDataFrame([], "doc_id long, lang string, w int, text string")
    assert weighted_sample_topk(empty, "doc_id", "w", k=5).count() == 0
    assert weighted_sample_per_group(empty, "doc_id", "w", "lang", k=5).count() == 0
    assert shard_stats(empty, "doc_id", "text", n_shards=4).count() == 0
    assert training_order(empty, "doc_id", n_shards=4).count() == 0

    tiny = spark.createDataFrame(
        [(1, "en", 3), (2, "en", 9), (3, "fr", 1)], "doc_id long, lang string, w int"
    )
    assert weighted_sample_topk(tiny, "doc_id", "w", k=100).count() == 3
    got = weighted_sample_per_group(tiny, "doc_id", "w", "lang", k=100)
    assert got.count() == 3


def test_verify_candidate_pairs_empty_pairs_and_docs(spark):
    from bookstore_aws_lakehouse_spark.operators.dedup import (
        verify_candidate_pairs,
    )

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    no_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert verify_candidate_pairs(docs, no_pairs, "doc_id", "text").count() == 0
    empty_docs = _empty_docs(spark)
    assert (
        verify_candidate_pairs(empty_docs, no_pairs, "doc_id", "text").count()
        == 0
    )


def test_pair_label_matrix_empty(spark):
    from bookstore_aws_lakehouse_spark.operators.dedup import pair_label_matrix

    labels = spark.createDataFrame([], "doc_id long, source string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert pair_label_matrix(pairs, labels, "doc_id", "source").count() == 0
