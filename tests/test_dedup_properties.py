"""Randomized cross-check of the n-gram dedup front end against a pure-
Python mirror.

``jaccard_pairs`` is the 100 TB-critical candidate generator (inverted-
index self-join); the oracle rows pin it on the fixture corpus, and the
edge-case tests pin hand-picked shapes — this adds randomized corpora
(unicode, empty strings, NULLs, shared fragments, repeated tokens) checked
pair-for-pair against an independent reimplementation of the DECLARED
semantics: split on a single space (empty tokens kept), k-token shingles
de-duplicated per doc, document-frequency filter BEFORE the pair join,
integer cross-multiplied threshold.
"""

from __future__ import annotations

import random

from bookstore_aws_lakehouse_spark.operators.dedup import jaccard_pairs

VOCAB = [
    "the", "quick", "brown", "fox", "héllo", "wörld", "日本", "语言",
    "a", "b", "", "x,y", "tok1", "tok2", "tok3", "zebra",
]


def _mk_corpus(rng: random.Random, n_docs: int) -> list[tuple[int, str | None]]:
    base = [
        " ".join(rng.choices(VOCAB, k=rng.randint(1, 12))) for _ in range(max(2, n_docs // 4))
    ]
    docs: list[tuple[int, str | None]] = []
    for i in range(n_docs):
        r = rng.random()
        if r < 0.1:
            docs.append((i, None))
        elif r < 0.2:
            docs.append((i, rng.choice(["", " ", "one"])))
        elif r < 0.6:
            # near-duplicate of a base doc: append / drop a token
            toks = rng.choice(base).split(" ")
            if rng.random() < 0.5 and len(toks) > 1:
                toks = toks[:-1]
            else:
                toks = toks + [rng.choice(VOCAB)]
            docs.append((i, " ".join(toks)))
        else:
            docs.append((i, " ".join(rng.choices(VOCAB, k=rng.randint(1, 12)))))
    return docs


def _mirror_pairs(
    docs: list[tuple[int, str | None]], k: int, threshold: float, max_df: int | None
) -> dict[tuple[int, int], tuple[int, int, int]]:
    """(id_a, id_b) -> (n_shared, n_a, n_b) per the declared semantics."""
    sets: dict[int, set[str]] = {}
    for i, text in docs:
        if text is None:
            continue
        toks = text.split(" ")  # empty tokens kept, like F.split(c, " ")
        if len(toks) < k:
            continue
        sh = {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}
        if sh:
            sets[i] = sh
    if max_df is not None:
        df_count: dict[str, int] = {}
        for sh in sets.values():
            for s in sh:
                df_count[s] = df_count.get(s, 0) + 1
        sets = {
            i: {s for s in sh if df_count[s] <= max_df} for i, sh in sets.items()
        }
        sets = {i: sh for i, sh in sets.items() if sh}
    t_ppm = int(round(threshold * 1_000_000))
    out: dict[tuple[int, int], tuple[int, int, int]] = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            union = len(sets[a]) + len(sets[b]) - inter
            if inter * 1_000_000 >= t_ppm * union:
                out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


def test_jaccard_pairs_matches_python_mirror_on_random_corpora(spark):
    rng = random.Random(20260815)
    for trial, max_df in [(0, None), (1, 3), (2, None)]:
        docs = _mk_corpus(rng, 30)
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {
            (r["id_a"], r["id_b"]): (r["n_shared"], r["n_a"], r["n_b"])
            for r in jaccard_pairs(
                df, "doc_id", "text", shingle_k=3, threshold=0.3, max_df=max_df
            ).collect()
        }
        want = _mirror_pairs(docs, k=3, threshold=0.3, max_df=max_df)
        assert got == want, (
            f"trial {trial} (max_df={max_df}): "
            f"extra={set(got) - set(want)} missing={set(want) - set(got)}"
        )


def test_containment_pairs_matches_python_mirror(spark):
    from bookstore_aws_lakehouse_spark.operators.dedup import containment_pairs

    rng = random.Random(99)
    docs = _mk_corpus(rng, 30)
    # plant a strict containment: doc 100 embeds doc 101's text
    docs.append((101, "alpha beta gamma delta epsilon"))
    docs.append((100, "pre alpha beta gamma delta epsilon post and more words"))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["id_sub"], r["id_super"]): (r["n_shared"], r["n_sub"])
        for r in containment_pairs(
            df, "doc_id", "text", shingle_k=3, threshold=0.5, max_df=None
        ).collect()
    }
    # mirror: directed containment from the same shingle sets
    sets: dict[int, set[str]] = {}
    for i, text in docs:
        if text is None:
            continue
        toks = text.split(" ")
        if len(toks) < 3:
            continue
        sets[i] = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
    want = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if inter and inter * 1_000_000 >= 500_000 * len(sets[a]):
                want[(a, b)] = (inter, len(sets[a]))
    assert got == want
    assert (101, 100) in got  # the planted embedding is found


def _md5_h64(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_simhash_pairs_matches_bruteforce_mirror(spark):
    """Pigeonhole chunk banding claims result-identity with the all-pairs
    Hamming scan — check both the signature math (md5 bit votes over ALL
    token occurrences, ties -> 0 bit) and the banding identity."""
    from bookstore_aws_lakehouse_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_pairs,
    )

    rng = random.Random(7)
    docs = [d for d in _mk_corpus(rng, 25) if d[1] is not None]
    # near-identical pair: one token appended. The base repeats 30 words
    # twice (60 tokens) so per-bit vote margins are wide enough that ONE
    # appended token flips ≤ 3 of the 60 signature bits (verified: this
    # exact pair lands at Hamming 3) — on a short doc most bits sit at a
    # vote tie and a single token flips far more than max_hamming of them.
    base = " ".join(
        (
            "red green blue cyan magenta yellow black white orange purple "
            "brown pink gray silver gold teal navy maroon olive lime "
            "aqua coral ivory khaki lavender plum salmon tan violet wheat"
        ).split()
        * 2
    )
    docs.append((200, base))
    docs.append((201, base + " extra"))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    }
    sigs: dict[int, int] = {}
    for i, text in docs:
        toks = text.split(" ")  # duplicates kept: every occurrence votes
        votes = [0] * SIMHASH_BITS
        for t in toks:
            h = _md5_h64(t)
            for b in range(SIMHASH_BITS):
                votes[b] += 1 if (h >> b) & 1 else -1
        sigs[i] = sum(1 << b for b in range(SIMHASH_BITS) if votes[b] > 0)
    want = {}
    ids = sorted(sigs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d <= 3:
                want[(a, b)] = d
    assert got == want
    assert (200, 201) in got


def test_saturated_bucket_cap_preserves_exact_dups(spark):
    """The oversized-bucket cap (VERDICT r9 #1) bounds candidate volume by
    splitting saturated buckets on subkey bits drawn from OUTSIDE the
    bucket's key. Contract: identical signatures share every subkey, so
    exact-duplicate pairs are NEVER lost, even with a cap small enough
    that every bucket saturates."""
    from bookstore_aws_lakehouse_spark.operators.dedup import (
        minhash_band_pairs,
        simhash_pairs,
    )

    # 30 identical docs: every (chunk, chunk_val) bucket holds ≥30 rows,
    # so max_bucket=5 forces the split path on every bucket
    docs = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = simhash_pairs(df, "doc_id", "text", max_hamming=3, max_bucket=5)
    assert got.filter("hamming = 0").count() == 30 * 29 // 2

    mh = minhash_band_pairs(df, "doc_id", "text", max_bucket=5)
    assert mh.count() == 30 * 29 // 2
    # identical docs agree on every band
    assert mh.filter("n_shared_bands = 4").count() == 30 * 29 // 2


def test_cap_warns_when_single_band_or_chunk(spark, caplog):
    """ADVICE r10: with one band (num_hashes == band_rows) or one chunk
    (max_hamming == 0) the bucket key is the FULL signature — saturated
    rows are exact signature duplicates, every signature-derived subkey
    is constant within the bucket, and the cap cannot split anything.
    The operators must say so instead of silently no-opping."""
    import logging

    from bookstore_aws_lakehouse_spark.operators.dedup import (
        minhash_band_pairs,
        simhash_candidates,
    )

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(5)],
        "doc_id bigint, text string",
    )
    with caplog.at_level(logging.WARNING):
        minhash_band_pairs(
            df, "doc_id", "text", num_hashes=2, band_rows=2, max_bucket=100
        )
    assert any("single band" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        simhash_candidates(df, "doc_id", "text", max_hamming=0, max_bucket=100)
    assert any("max_hamming=0" in r.message for r in caplog.records)
    caplog.clear()
    # multi-band / multi-chunk defaults stay silent
    with caplog.at_level(logging.WARNING):
        minhash_band_pairs(df, "doc_id", "text", max_bucket=100)
        simhash_candidates(df, "doc_id", "text", max_bucket=100)
    assert not [r for r in caplog.records if "ineffective" in r.message]


def test_saturated_bucket_cap_splits_mixed_corpus(spark):
    """On a mixed corpus a tiny cap must (a) keep results a SUBSET of the
    uncapped result (the split only removes candidates, never invents
    pairs), and (b) still find exact dups planted inside the saturated
    buckets."""
    import random

    from bookstore_aws_lakehouse_spark.operators.dedup import simhash_pairs

    rng = random.Random(11)
    docs = [d for d in _mk_corpus(rng, 20) if d[1] is not None]
    docs.append((300, "the quick brown fox jumps over the lazy dog today"))
    docs.append((301, "the quick brown fox jumps over the lazy dog today"))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    full = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(df, "doc_id", "text", max_bucket=None).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(df, "doc_id", "text", max_bucket=2).collect()
    }
    assert capped <= full
    assert (300, 301) in capped


def test_winnowing_guarantee_and_mirror(spark):
    """Winnowing contract (Schleimer et al. 2003): (a) any shared token
    run of length ≥ window + k - 1 produces ≥ 1 shared fingerprint —
    both docs' windows covering the run select the same minimum; (b) the
    Spark pipeline matches an independent pure-Python mirror
    fingerprint-for-fingerprint; (c) density: winnowed fingerprints are
    a strict subsample of the positional k-gram hashes."""
    import hashlib
    import random

    from bookstore_aws_lakehouse_spark.operators.dedup import (
        winnowed_fingerprints,
        winnowed_pairs,
    )

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def mirror(text, k=3, w=4):
        t = text.split(" ")
        if len(t) < k:
            return set()
        hs = [h64(" ".join(t[i : i + k])) for i in range(len(t) - k + 1)]
        if len(hs) < w:
            return {min(hs)}
        return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}

    rng = random.Random(42)
    docs = [d for d in _mk_corpus(rng, 20) if d[1] is not None]
    # planted shared run of exactly window + k - 1 = 6 tokens inside
    # otherwise-disjoint documents
    run = "aurora borealis shimmers over frozen tundra"
    docs.append((400, "alpha beta gamma " + run + " delta epsilon"))
    docs.append((401, "one two three four " + run + " five six seven"))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    got = {}
    for r in winnowed_fingerprints(df, "doc_id", "text").collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, text in docs:
        assert got.get(i, set()) == mirror(text), i
    assert got[400] & got[401], "guarantee: 6-token shared run -> shared fp"

    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnowed_pairs(
            df, "doc_id", "text", min_shared=1, max_df=None
        ).collect()
    }
    assert (400, 401) in pairs
    # mirror the pair counts too
    ids = sorted(got)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            n = len(got[a] & got[b])
            assert pairs.get((a, b), 0) == n, (a, b)


def test_cap_invariants_randomized(spark):
    """Randomized sweep of the saturated-bucket cap invariants across
    corpora and cap sizes (hypothesis-style, but seeded loops — each
    example costs two Spark jobs, so a small deterministic matrix beats
    hypothesis' default example count):

    1. capped result ⊆ uncapped result (the split only removes
       candidates, never invents pairs);
    2. every exact-duplicate (hamming-0 / all-bands) pair survives ANY
       cap — identical signatures share every subkey by construction;
    3. max_bucket=None reproduces the uncapped result exactly.
    """
    import random

    from bookstore_aws_lakehouse_spark.operators.dedup import (
        minhash_band_pairs,
        simhash_pairs,
    )

    for seed, cap in [(1, 1), (2, 3), (3, 7)]:
        rng = random.Random(seed)
        docs = [d for d in _mk_corpus(rng, 18) if d[1] is not None]
        # planted exact-duplicate family (3 copies)
        dup = " ".join(rng.choices(VOCAB, k=10))
        docs += [(500, dup), (501, dup), (502, dup)]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")

        full = {
            (r["id_a"], r["id_b"])
            for r in simhash_pairs(df, "doc_id", "text", max_bucket=None).collect()
        }
        capped = {
            (r["id_a"], r["id_b"])
            for r in simhash_pairs(df, "doc_id", "text", max_bucket=cap).collect()
        }
        assert capped <= full, (seed, cap)
        for pair in [(500, 501), (500, 502), (501, 502)]:
            assert pair in capped, (seed, cap, pair)

        mh_full = {
            (r["id_a"], r["id_b"])
            for r in minhash_band_pairs(df, "doc_id", "text", max_bucket=None).collect()
        }
        mh_capped = {
            (r["id_a"], r["id_b"])
            for r in minhash_band_pairs(df, "doc_id", "text", max_bucket=cap).collect()
        }
        assert mh_capped <= mh_full, (seed, cap)
        for pair in [(500, 501), (500, 502), (501, 502)]:
            assert pair in mh_capped, (seed, cap, pair)


def test_cap_pair_neighbors_invariants_randomized(spark):
    """Randomized sweep of the CC-input neighbor cap (VERDICT r11 #3),
    same pattern as the saturated-bucket sweep above:

    1. capped ⊆ input (the cap only removes edges);
    2. the capped set equals a pure-Python mirror of the declared rule
       (per-id rank by score DESC, neighbor ASC; keep rank ≤ k; a pair
       survives if EITHER endpoint keeps it);
    3. an exact-duplicate clique LARGER than k stays one connected
       component (every member keeps the clique's min id — score ties
       break id-ascending);
    4. k ≥ max degree reproduces the uncapped graph exactly.
    """
    import random

    from bookstore_aws_lakehouse_spark.operators.dedup import (
        cap_pair_neighbors,
        connected_components,
    )

    for seed, k in [(11, 1), (12, 3), (13, 5)]:
        rng = random.Random(seed)
        edges: dict[tuple[int, int], float] = {}
        for _ in range(60):
            a, b = rng.sample(range(30), 2)
            edges[(min(a, b), max(a, b))] = round(rng.random(), 6)
        # planted exact-dup clique of size k+4 (> k), score 1.0
        clique = list(range(100, 100 + k + 4))
        for i in range(len(clique)):
            for j in range(i + 1, len(clique)):
                edges[(clique[i], clique[j])] = 1.0
        rows = [(a, b, s) for (a, b), s in sorted(edges.items())]
        df = spark.createDataFrame(rows, "id_a bigint, id_b bigint, jaccard double")

        capped = {
            (r["id_a"], r["id_b"])
            for r in cap_pair_neighbors(df, k=k).collect()
        }
        assert capped <= set(edges), (seed, k)

        # python mirror of the declared rule
        directed: dict[int, list[tuple[float, int]]] = {}
        for (a, b), s in edges.items():
            directed.setdefault(a, []).append((s, b))
            directed.setdefault(b, []).append((s, a))
        expect = set()
        for i, nbrs in directed.items():
            nbrs.sort(key=lambda t: (-t[0], t[1]))
            for s, nb in nbrs[:k]:
                expect.add((min(i, nb), max(i, nb)))
        assert capped == expect, (seed, k)

        # clique stays one component under CC
        cc_in = spark.createDataFrame(
            sorted(capped), "id_a bigint, id_b bigint"
        )
        labels = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(cc_in).collect()
        }
        for m in clique:
            assert labels[m] == clique[0], (seed, k, m)

        # k >= max degree: cap is the identity
        max_deg = max(len(v) for v in directed.values())
        uncapped = {
            (r["id_a"], r["id_b"])
            for r in cap_pair_neighbors(df, k=max_deg).collect()
        }
        assert uncapped == set(edges), (seed, k)


def test_verify_candidate_pairs_matches_python_mirror(spark):
    """The verify stage's exact stats must equal the set-theoretic
    definition on EVERY candidate fed to it — including pairs sharing
    nothing (n_shared=0), pairs with a sub-k-token side (empty shingle
    set → NULL jaccard), and the accepted verdict at the ppm boundary."""
    from bookstore_aws_lakehouse_spark.operators.dedup import (
        verify_candidate_pairs,
    )

    rng = random.Random(20260816)
    docs = _mk_corpus(rng, 30)
    ids = [i for i, _ in docs]
    # arbitrary candidate set: random pairs, not LSH output — the
    # operator contract is per-pair, independent of the generator
    cand = sorted(
        {
            (a, b)
            for a, b in (
                sorted(rng.sample(ids, 2)) for _ in range(60)
            )
        }
    )
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    pairs = spark.createDataFrame(cand, "id_a bigint, id_b bigint")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in verify_candidate_pairs(
            df, pairs, "doc_id", "text", shingle_k=3, threshold=0.2
        ).collect()
    }
    assert set(out) == set(cand)

    def shset(text):
        if text is None:
            return set()
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    texts = dict(docs)
    for a, b in cand:
        sa, sb = shset(texts[a]), shset(texts[b])
        inter, union = len(sa & sb), len(sa | sb)
        r = out[(a, b)]
        assert (r["n_shared"], r["n_a"], r["n_b"]) == (inter, len(sa), len(sb))
        if union == 0:
            # undefined similarity → undefined verdict, never a vacuous
            # 0 >= 0 accept (review finding)
            assert r["jaccard"] is None and r["accepted"] is None
        else:
            assert abs(r["jaccard"] - inter / union) < 1e-12
            assert r["accepted"] == (inter * 1_000_000 >= 200_000 * union)


def test_pair_label_matrix_exact_counts(spark):
    from bookstore_aws_lakehouse_spark.operators.dedup import pair_label_matrix

    labels = spark.createDataFrame(
        [(1, "web"), (2, "web"), (3, "books"), (4, "code"), (5, "books")],
        "doc_id bigint, source string",
    )
    pairs = spark.createDataFrame(
        # (web,web) ×1; (books,web) ×2 sharing doc 3; (books,code) ×1
        [(1, 2), (2, 3), (1, 3), (4, 5)],
        "id_a bigint, id_b bigint",
    )
    got = {
        (r["label_lo"], r["label_hi"]): (r["n_pairs"], r["n_docs"])
        for r in pair_label_matrix(pairs, labels, "doc_id", "source").collect()
    }
    assert got == {
        ("web", "web"): (1, 2),
        ("books", "web"): (2, 3),
        ("books", "code"): (1, 2),
    }


def test_similarity_triangles_match_bruteforce_mirror(spark):
    """Every triangle the oriented three-way join emits must be exactly
    the a<b<c triples whose three edges all pass the mirror's jaccard
    threshold — found once each, no permutation duplicates."""
    from itertools import combinations

    rng = random.Random(77)
    # denser near-dup families than the default corpus so triangles exist
    base = [" ".join(rng.choices(VOCAB, k=8)) for _ in range(4)]
    docs = []
    for i in range(24):
        toks = rng.choice(base).split(" ")
        if rng.random() < 0.5:
            toks = toks + [rng.choice(VOCAB)]
        docs.append((i, " ".join(toks)))
    pairs = set(_mirror_pairs(docs, k=3, threshold=0.1, max_df=100))
    want = {
        (a, b, c)
        for a, b, c in combinations(sorted(i for i, _ in docs), 3)
        if (a, b) in pairs and (b, c) in pairs and (a, c) in pairs
    }
    assert want, "corpus produced no triangles — test is vacuous"

    from bookstore_aws_lakehouse_spark.operators.dedup import jaccard_pairs
    from bookstore_aws_lakehouse_spark.operators.graph import triangle_motifs

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    p = jaccard_pairs(df, "doc_id", "text", shingle_k=3, threshold=0.1)
    got_rows = triangle_motifs(p).collect()
    got = [(r["doc_a"], r["doc_b"], r["doc_c"]) for r in got_rows]
    assert len(got) == len(set(got)), "duplicate triangles emitted"
    assert set(got) == want


def test_verify_candidate_pairs_keeps_stale_candidates_with_null_verdict(spark):
    """A candidate referencing an id absent from docs must SURVIVE with
    NULL stats/verdict (left-join contract) — silently dropping it would
    make the precision report undercount (review finding)."""
    from bookstore_aws_lakehouse_spark.operators.dedup import (
        verify_candidate_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (1, 99)], "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in verify_candidate_pairs(docs, pairs, "doc_id", "text").collect()
    }
    assert set(out) == {(1, 2), (1, 99)}
    ok, stale = out[(1, 2)], out[(1, 99)]
    assert ok["accepted"] is not None and ok["n_a"] == 3
    assert stale["n_b"] is None and stale["jaccard"] is None
    assert stale["accepted"] is None


def test_minhash_estimate_pairs_matches_python_mirror(spark):
    """The signature-agreement estimate must equal an independent
    reimplementation (md5 shingle hash → 8 affine maps → min → match
    fraction) on arbitrary pairs, and NULL-propagate for endpoints with
    no signature (sub-k docs / absent ids)."""
    import hashlib

    from bookstore_aws_lakehouse_spark.operators.dedup import (
        MINHASH_P,
        minhash_estimate_pairs,
        minhash_params,
    )

    docs = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown dog jumps"),
        (3, "completely different words entirely here"),
        (4, "xy"),  # sub-k: no shingles, no signature
    ]
    pairs = [(1, 2), (1, 3), (1, 4), (1, 99)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pf = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in minhash_estimate_pairs(df, pf, "doc_id", "text").collect()
    }

    def sig(text):
        toks = text.split(" ")
        if len(toks) < 3:
            return None
        hs = {
            int(hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()[:15], 16)
            % MINHASH_P
            for i in range(len(toks) - 2)
        }
        return [
            min((a * h + b) % MINHASH_P for h in hs)
            for a, b in (minhash_params(s) for s in range(8))
        ]

    sigs = {i: sig(t) for i, t in docs}
    for a, b in pairs:
        r = out[(a, b)]
        sa, sb = sigs.get(a), sigs.get(b)
        if sa is None or sb is None:
            assert r["n_match"] is None and r["est_jaccard"] is None
        else:
            m = sum(1 for x, y in zip(sa, sb) if x == y)
            assert r["n_match"] == m and r["est_jaccard"] == m / 8
