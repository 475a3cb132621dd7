"""The bench's 10× growth corpus must hold duplicate density CONSTANT —
otherwise the growth ratios measure output-pair volume instead of
scaling (the r3-r5 stride-drop corpus inflated ratios to 10-27×; see
SCALING.md §Dedup). These tests pin the three properties the
constant-density construction needs, using the engine's own
jaccard_pairs operator as the detector."""

from __future__ import annotations

from pyspark.sql import functions as F

DOC = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronauts debate quantum chromodynamics near a riverbank at dawn "
    "carrying umbrellas made of woven carbon fiber and singing old sea "
    "shanties about distant nebulae and forgotten cartographers"
)


def _pairs(df):
    from bookstore_aws_lakehouse_spark.operators.dedup import jaccard_pairs

    return {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(
            df, "doc_id", "text", shingle_k=3, threshold=0.1
        ).collect()
    }


def _with_meta(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def test_parent_and_copies_are_not_near_dups(spark):
    """A unique parent and its 9 mutated copies must produce ZERO
    jaccard pairs at the loosest configured threshold (0.1) — neither
    parent↔copy nor copy↔copy."""
    from bench import mutate_docs

    parent = _with_meta(spark, [(1, DOC)])
    frames = [parent] + [mutate_docs(parent, c) for c in range(1, 10)]
    import functools

    from pyspark.sql import DataFrame

    corpus = functools.reduce(DataFrame.unionByName, frames)
    assert _pairs(corpus) == set()


def test_duplicate_parents_stay_duplicates_in_every_family(spark):
    """Two exact-duplicate parents must remain a detected pair inside
    every mutated family (content-keyed mutation rewrites both copies
    identically) — pair volume grows exactly linearly with the factor."""
    from bench import mutate_docs

    dups = _with_meta(spark, [(1, DOC), (2, DOC)])
    for c in (1, 5, 9):
        fam = mutate_docs(dups, c)
        got = _pairs(fam)
        base = c * 10_000_000
        assert got == {(base + 1, base + 2)}, (c, got)


def test_mutation_actually_rewrites_most_words(spark):
    """Sanity on the mutation rate: ~2/3 of words change (a no-op
    mutation would silently reintroduce the dup-density explosion)."""
    from bench import mutate_docs

    parent = _with_meta(spark, [(1, DOC)])
    out = mutate_docs(parent, 3).collect()[0]["text"]
    orig = DOC.split(" ")
    new = out.split(" ")
    assert len(orig) == len(new)
    changed = sum(1 for a, b in zip(orig, new) if a != b)
    assert 0.45 <= changed / len(orig) <= 0.9


def test_stage_recorders_match_operator_frames(spark):
    """The growth harness's per-stage attribution reads frames the
    OPERATOR records as it builds (VERDICT r11 #7) — assert the recorded
    join_agg frame IS the candidate stage (equals shingle_candidates)
    and the score frame IS the operator's own output."""
    from bookstore_aws_lakehouse_spark.operators.dedup import (
        jaccard_pairs,
        shingle_candidates,
    )

    docs = _with_meta(
        spark,
        [(1, DOC), (2, DOC), (3, DOC.replace("quick", "slow")), (4, "x y z")],
    )
    st: dict = {}
    out = jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.1, pin=False,
        stages=st,
    )
    assert set(st) == {"postings", "stop_filter", "join_agg", "score"}
    cand = {
        (r["id_a"], r["id_b"], r["n_shared"])
        for r in shingle_candidates(docs, "doc_id", "text", 3, 100).collect()
    }
    rec = {
        (r["id_a"], r["id_b"], r["n_shared"])
        for r in st["join_agg"].collect()
    }
    assert rec == cand and cand
    assert sorted(st["score"].collect()) == sorted(out.collect())


def test_minhash_stage_recorder_matches_output(spark):
    from bookstore_aws_lakehouse_spark.operators.dedup import (
        minhash_band_pairs,
    )

    docs = _with_meta(spark, [(1, DOC), (2, DOC), (3, "a b c d e")])
    st: dict = {}
    out = minhash_band_pairs(
        docs, "doc_id", "text", num_hashes=8, band_rows=2, shingle_k=3,
        stages=st,
    )
    assert set(st) == {"signatures", "banding", "join_agg"}
    assert sorted(st["join_agg"].collect()) == sorted(out.collect())


def test_time_stages_attributes_and_leaves_no_residue(spark):
    """bench._time_stages pins every non-final stage and must drop every
    pin afterwards — a leaked pin degrades all later growth rows."""
    from bookstore_aws_lakehouse_spark.operators.dedup import jaccard_pairs

    import bench

    docs = _with_meta(spark, [(1, DOC), (2, DOC)])
    st: dict = {}
    jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.1, pin=False,
        stages=st,
    )
    order = ["postings", "stop_filter", "join_agg", "score"]
    timed = bench._time_stages(
        [(k, (lambda k=k: st[k]), k != "score") for k in order]
    )
    assert set(timed) == {f"{k}_s" for k in order}
    assert all(v >= 0 for v in timed.values())
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
