"""Unit tests for the dedup family (operators/dedup.py) and the
similarity-search primitives (queries/similarity.py) on hand-built
rows with known answers."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.operators import dedup as D
from nyc_taxi_data_engineering_spark.queries.similarity import dot, sign_bucket


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_dedup_groups_and_canonical(spark):
    df = D.exact_dedup(_docs(spark, ["a b c", "x y", "a b c"]))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["canonical_doc_id"] == 0 and not rows[0]["is_duplicate"]
    assert rows[2]["canonical_doc_id"] == 0 and rows[2]["is_duplicate"]
    assert not rows[1]["is_duplicate"]
    assert rows[0]["content_hash"] == rows[2]["content_hash"] != rows[1]["content_hash"]


def test_jaccard_identical_docs_is_one(spark):
    df = D.shingle_jaccard_pairs(
        _docs(spark, ["a b c d e", "a b c d e", "q r s t u"]), threshold=0.5
    )
    rows = df.collect()
    assert len(rows) == 1
    assert (rows[0]["a_id"], rows[0]["b_id"], rows[0]["jaccard"]) == (0, 1, 1.0)


def test_jaccard_partial_overlap_value(spark):
    # shingles(0) = {a b c, b c d}; shingles(1) = {b c d, c d e} -> J = 1/3
    df = D.shingle_jaccard_pairs(_docs(spark, ["a b c d", "b c d e"]), threshold=0.1)
    assert df.collect()[0]["jaccard"] == round(1 / 3, 6)


def test_containment_short_in_long(spark):
    # doc 0's 2 shingles both appear in doc 1 (12 shingles): containment
    # 0->1 is 1.0 while Jaccard is 2/12 — the asymmetric case Jaccard misses.
    short = "a b c d"
    long = "a b c d p q r s t u v w x y z"
    df = D.shingle_containment_pairs(_docs(spark, [short, long]), threshold=0.9)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["inner_id"], r["outer_id"], r["containment"]) == (0, 1, 1.0)
    assert r["common_shingles"] == 2
    # symmetric near-dups yield both directions
    both = D.shingle_containment_pairs(_docs(spark, ["a b c d e", "a b c d e"]), threshold=0.9)
    assert sorted((r["inner_id"], r["outer_id"]) for r in both.collect()) == [(0, 1), (1, 0)]


def test_containment_threshold_and_df_cap(spark):
    # containment 0->1 = 2/3 (shingles of 'a b c d e': {abc,bcd,cde};
    # doc1 'a b c d x' has {abc,bcd,cdx} -> common 2, inner size 3)
    df = D.shingle_containment_pairs(_docs(spark, ["a b c d e", "a b c d x"]), threshold=0.5)
    vals = {(r["inner_id"], r["outer_id"]): r["containment"] for r in df.collect()}
    assert vals == {(0, 1): round(2 / 3, 6), (1, 0): round(2 / 3, 6)}
    capped = D.shingle_containment_pairs(
        _docs(spark, ["a b c", "a b c", "a b c"]), threshold=0.5, df_cap=2
    )
    assert capped.count() == 0


def test_df_cap_drops_hot_shingles(spark):
    # the shingle 'a b c' appears in all 3 docs; cap at 2 removes it
    texts = ["a b c", "a b c", "a b c"]
    assert D.shingle_jaccard_pairs(_docs(spark, texts), threshold=0.1).count() == 3
    assert D.shingle_jaccard_pairs(_docs(spark, texts), threshold=0.1, df_cap=2).count() == 0


def test_minhash_lsh_finds_identical_pair(spark):
    docs = _docs(spark, ["a b c d e f g h", "a b c d e f g h", "z y x w v u t s"])
    pairs = D.lsh_candidate_pairs(D.minhash_signatures(docs)).collect()
    exact = [p for p in pairs if (p["a_id"], p["b_id"]) == (0, 1)]
    assert exact and exact[0]["est_similarity"] == 1.0


def test_minhash_signature_seeds_differ(spark):
    """Guards the PySpark two-arg-lambda pitfall: each permutation must
    use its own seed, so components of one signature differ."""
    sig = D.minhash_signatures(_docs(spark, ["a b c d e f"])).collect()[0]
    vals = [sig[f"s{i}"] for i in range(D.MINHASH_HASHES)]
    assert len(set(vals)) > 1


def test_simhash_identical_and_neardup(spark):
    docs = _docs(spark, ["a b c d e f g h i j", "a b c d e f g h i j", "q r s t u v w x y z"])
    sim = D.simhash(docs)
    vals = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert vals[0] == vals[1] != vals[2]
    pairs = D.simhash_neardup_pairs(sim).collect()
    assert any((p["a_id"], p["b_id"], p["hamming"]) == (0, 1, 0) for p in pairs)


def test_simhash_block_join_exact_vs_brute_force(spark):
    """Pigeonhole exactness of the Manku block-combination join: on
    adversarial 64-bit values — flips straddling block boundaries, the
    sign bit, exactly-at-threshold distances — the blocked join must
    return EXACTLY the brute-force hamming<=3 pair set."""
    base = 0x0123_4567_89AB_CDEF
    vals = [
        base,
        base ^ 1,  # 1 flip, block 0
        base ^ (1 << 10) ^ (1 << 11),  # 2 flips across the block-0/1 boundary
        base ^ (1 << 21) ^ (1 << 22) ^ (1 << 63),  # 3 flips incl. the sign bit
        base ^ (1 << 0) ^ (1 << 15) ^ (1 << 33) ^ (1 << 55),  # 4 flips: excluded vs base
        -(base + 1),  # ~base: hamming 64 from base
        base ^ (1 << 63),  # sign bit only: hamming 1
    ]
    sim = spark.createDataFrame(
        [(i, v if v < 1 << 63 else v - (1 << 64)) for i, v in enumerate(vals)],
        "doc_id long, simhash long",
    )
    got = {
        (p["a_id"], p["b_id"], p["hamming"])
        for p in D.simhash_neardup_pairs(sim, max_hamming=3).collect()
    }
    rows = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    want = set()
    for a in range(len(vals)):
        for b in range(a + 1, len(vals)):
            h = bin((rows[a] ^ rows[b]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                want.add((a, b, h))
    assert got == want and len(want) >= 4


def test_dot_and_sign_bucket(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0, -2.0, 0.0, 0.0, 0.0, 0.0, 0.0],)], "v array<double>"
    )
    got = df.select(
        dot(F.col("v"), F.col("v")).alias("d"), sign_bucket(F.col("v")).alias("b")
    ).collect()[0]
    assert got["d"] == 5.0
    # signs: + + - + + + + + -> all bits except bit 2 -> 255 - 4
    assert got["b"] == 251


def test_cosine_of_parallel_vectors(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [2.0, 4.0, 6.0])], "vec_id long, v array<double>"
    )
    n = df.select("vec_id", F.col("v"), F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm"))
    a = n.select(F.col("vec_id").alias("a"), F.col("v").alias("av"), F.col("nrm").alias("an"))
    b = n.select(F.col("vec_id").alias("b"), F.col("v").alias("bv"), F.col("nrm").alias("bn"))
    cos = (
        a.join(b, F.col("a") < F.col("b"))
        .select((dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))).alias("c"))
        .collect()[0]["c"]
    )
    assert math.isclose(cos, 1.0, rel_tol=1e-12)


def test_embedding_neardup_lsh_matches_exact_allpairs(spark, sf_dir):
    """The LSH-bucketed near-dup operator must recover exactly the
    pairs the all-pairs exact join finds at the same threshold (the
    planted twins dominate; organic pairs sit far below 0.95). The
    all-pairs join lives only here, as the tiny-sf recall oracle."""
    from nyc_taxi_data_engineering_spark.queries.similarity import (
        NEARDUP_THRESHOLD,
        _planted_corpus,
        q_embedding_neardup_pairs,
    )

    corpus = _planted_corpus(spark, sf_dir)
    a = corpus.select(F.col("vec_id").alias("a_id"), F.col("v").alias("av"), F.col("nrm").alias("an"))
    b = corpus.select(F.col("vec_id").alias("b_id"), F.col("v").alias("bv"), F.col("nrm").alias("bn"))
    exact = {
        (r["a_id"], r["b_id"])
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id", (dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))).alias("cos")
        )
        .filter(F.col("cos") >= NEARDUP_THRESHOLD)
        .collect()
    }
    lsh = {(r["a_id"], r["b_id"]) for r in q_embedding_neardup_pairs(spark, sf_dir).collect()}
    assert lsh == exact
    assert len(exact) > 0  # planted twins make the check non-vacuous


def test_connected_components_chain_and_singleton(spark):
    """Transitivity across a 4-node chain (diameter 3, needs >1 round),
    a separate pair, and an isolated node as a singleton."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]], "doc_id long")
    comp = {
        r["id"]: r["component"]
        for r in D.connected_components(edges, nodes=nodes, node_col="doc_id").collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_raises_without_convergence(spark):
    import pytest

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a_id long, b_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(edges, max_iter=1)


def test_connected_components_adversarial_path_log_rounds(spark):
    """A 64-node path graph (diameter 63) — the adversarial chain shape
    from pairwise near-dups of drifting revisions. Plain min-label
    propagation moves the minimum one hop per round and would need 63
    rounds; pointer doubling must finish within O(log diameter), so 10
    rounds is ample — this fails if the shortcut step ever regresses."""
    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    comp = {
        r["id"]: r["component"]
        for r in D.connected_components(edges, max_iter=10).collect()
    }
    assert comp == {i: 0 for i in range(n)}


def test_oph_signature_dense_and_densified(spark):
    """Every doc gets exactly OPH_BINS rows with NO null signature —
    rotation densification fills empty bins from the next non-empty
    one (circularly), even for a one-shingle doc that fills 1/16."""
    docs = spark.createDataFrame(
        [(1, "tiny doc here"), (2, "a much longer document with many distinct words "
                                  "covering far more of the hash space than the tiny one")],
        "doc_id long, text string",
    )
    rows = D.oph_minhash_bins(docs).collect()
    assert len(rows) == 2 * D.OPH_BINS
    assert all(r["sig"] is not None for r in rows)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add(r["bin"])
    assert per_doc[1] == set(range(D.OPH_BINS))
    # determinism: identical input -> identical signature
    again = {(r["doc_id"], r["bin"]): r["sig"] for r in D.oph_minhash_bins(docs).collect()}
    assert all(again[(r["doc_id"], r["bin"])] == r["sig"] for r in rows)


def test_oph_lsh_identical_docs_estimate_one(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),
         (3, "completely different text with no shared shingles at all whatsoever")],
        "doc_id long, text string",
    )
    pairs = D.oph_lsh_pairs(D.oph_minhash_bins(docs)).collect()
    assert [(r["a_id"], r["b_id"], r["est_similarity"]) for r in pairs] == [(1, 2, 1.0)]


def _ids(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_all_statuses(spark):
    """Each status branch on hand-built rows: corpus {A, B}, batch has
    an exact corpus dup, a within-batch dup pair, a one-token edit of
    B (near-dup), and a fresh doc."""
    a = " ".join(f"w{i}" for i in range(20))
    b = " ".join(f"x{i}" for i in range(20))
    b_edit = b.rsplit(" ", 1)[0] + " zz"
    fresh = " ".join(f"q{i}" for i in range(20))
    new = " ".join(f"n{i}" for i in range(20))
    corpus = _ids(spark, [(1, a), (2, b)])
    batch = _ids(spark, [(10, a), (11, new), (12, new), (13, b_edit), (14, fresh)])
    status = {
        r["doc_id"]: r["status"]
        for r in D.incremental_dedup_status(batch, corpus).collect()
    }
    assert status == {
        10: "exact_dup_corpus",
        11: "kept",
        12: "exact_dup_batch",
        13: "neardup_corpus",
        14: "kept",
    }


def test_incremental_dedup_neardup_threshold_gates(spark):
    """The agreement floor gates the near-dup verdict: replacing token
    9 of this 20-token doc gives signature agreement 9/16 (verified by
    recomputing the md5 MinHash in pure Python) — it band-collides and
    drops at floor 0.5 but survives at floor 1.0."""
    toks = [f"x{i}" for i in range(20)]
    b = " ".join(toks)
    b_edit = " ".join(toks[:9] + ["zz"] + toks[10:])
    corpus = _ids(spark, [(1, b)])
    batch = _ids(spark, [(10, b_edit)])
    loose = D.incremental_dedup_status(batch, corpus, neardup_min=0.5).collect()
    strict = D.incremental_dedup_status(batch, corpus, neardup_min=1.0).collect()
    assert loose[0]["status"] == "neardup_corpus"
    assert strict[0]["status"] == "kept"


def test_pq_codebook_seeds_encode_to_themselves(spark, sf_dir):
    """A codebook-seed vector's subvectors are distance-0 from their
    own centroids, so its 8 codes must all equal its own c_id; every
    query returns exactly TOP_K ranked rows."""
    from nyc_taxi_data_engineering_spark.queries import similarity as S

    corpus = S._corpus(spark, sf_dir)
    sub = S._subspaces(corpus, "v", "vec_id", "sv")
    cent = sub.filter(
        F.col("vec_id").between(S.PQ_CENT_LO, S.PQ_CENT_HI)
    ).select((F.col("vec_id") - S.PQ_CENT_LO).alias("c_id"), "m", F.col("sv").alias("cv"))
    scored = (
        sub.filter(F.col("vec_id").between(S.PQ_CENT_LO, S.PQ_CENT_HI))
        .join(F.broadcast(cent), "m")
        .select("vec_id", "m", "c_id", F.round(S._l2sq(F.col("sv"), F.col("cv")), 6).alias("d"))
    )
    codes = (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct(F.col("d"), F.col("c_id"))).alias("best"))
        .select("vec_id", F.col("best.c_id").alias("code"))
    )
    bad = codes.filter(F.col("code") != F.col("vec_id") - S.PQ_CENT_LO).count()
    assert bad == 0

    out = S.q_pq_ann_topk(spark, sf_dir)
    per_q = out.groupBy("q_id").count().collect()
    assert len(per_q) == S.N_QUERIES and all(r["count"] == S.TOP_K for r in per_q)
    ranks = out.groupBy("q_id").agg(F.collect_set("rank").alias("rs")).collect()
    assert all(sorted(r["rs"]) == list(range(1, S.TOP_K + 1)) for r in ranks)


def test_ivfpq_shape_and_recall(spark, sf_dir):
    """IVF-PQ composition: every query returns TOP_K ranked rows, and
    recall@5 vs the exact brute-force top-5 stays WELL above chance.
    The synthetic corpus is near-isotropic (no planted neighbors), the
    hardest regime for a 16-entry sampled codebook — measured recalls
    at sf0.001: IVF-only 0.35, PQ-only 0.125, composed 0.075 vs 0.01
    chance (5/500). The composition compounds both losses by design
    (that is the cost of the ~4x candidate cut + 64x memory cut); the
    gate here is >= 5x random chance, with the measured value in the
    assertion message for the record."""
    from nyc_taxi_data_engineering_spark.queries import similarity as S

    out = S.q_ivfpq_ann_topk(spark, sf_dir).collect()
    per_q: dict[int, set[int]] = {}
    for r in out:
        per_q.setdefault(r["q_id"], set()).add(r["vec_id"])
    assert len(per_q) == S.N_QUERIES and all(len(v) == S.TOP_K for v in per_q.values())
    exact = S.q_ann_cosine_topk(spark, sf_dir).collect()
    truth: dict[int, set[int]] = {}
    for r in exact:
        truth.setdefault(r["q_id"], set()).add(r["vec_id"])
    n_corpus = S._corpus(spark, sf_dir).count()
    hits = sum(len(per_q[q] & truth[q]) for q in truth)
    recall = hits / (len(truth) * S.TOP_K)
    chance = S.TOP_K / n_corpus
    assert recall >= 5 * chance, (
        f"IVF-PQ recall@5 = {recall:.3f} vs chance {chance:.3f} — index is not ranking"
    )


def test_kmeans_separable_clusters(spark):
    """Two tight blobs + k=2: after 2 Lloyd rounds every point lands
    with its blob and centroids are the exact decimal blob means."""
    from nyc_taxi_data_engineering_spark.operators import kmeans as KM

    rows = [
        (0, [0.0, 0.0]), (1, [10.0, 10.0]),  # seeds: one per blob
        (2, [0.2, -0.2]), (3, [0.4, 0.0]),
        (4, [10.2, 9.8]), (5, [9.6, 10.0]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, v array<double>")
    assign, cent = KM.lloyd_kmeans(corpus, k=2, iters=2)
    got = {r["vec_id"]: r["c_id"] for r in assign.collect()}
    assert got == {0: 0, 2: 0, 3: 0, 1: 1, 4: 1, 5: 1}
    c0 = {r["pos"]: r["val"] for r in cent.filter("c_id = 0").collect()}
    # means accumulate in DECIMAL(18,9): 0.2 and 0.4 truncate to 9 dp
    # before summing, so the sum is exactly 0.6 (not the float fold)
    assert c0 == {0: 0.6 / 3, 1: -0.2 / 3}


def test_kmeans_empty_cluster_drops_out(spark):
    """A seed that captures nothing in round 1 vanishes from the
    codebook — documented Lloyd behavior, identical in the oracle."""
    from nyc_taxi_data_engineering_spark.operators import kmeans as KM

    # seeds are ids 0 and 1; id 1 sits right next to id 0, so cluster 1
    # wins nothing once round-1 means move: all mass near the origin.
    rows = [(0, [0.0]), (1, [0.1]), (2, [0.0]), (3, [0.05]), (4, [0.05])]
    corpus = spark.createDataFrame(rows, "vec_id long, v array<double>")
    assign, cent = KM.lloyd_kmeans(corpus, k=2, iters=2)
    cids = {r["c_id"] for r in assign.collect()}
    cent_ids = {r["c_id"] for r in cent.collect()}
    assert cent_ids == cids  # centroids exist exactly for surviving clusters


def test_crossdoc_repeated_spans_planted_paragraph(spark):
    """Two docs share one verbatim 100-char paragraph inside otherwise
    unrelated text; the detector must report EXACTLY that span in both
    docs (maximal, correct offset/length, same content md5) and nothing
    in the unrelated doc — the duplication class doc-level Jaccard
    misses."""
    from nyc_taxi_data_engineering_spark.operators import exact_substr as XS

    para = "".join(chr(ord("A") + (i * 7) % 26) for i in range(100))
    a_pre = "".join(chr(ord("a") + (i * 11) % 26) for i in range(57))
    b_pre = "".join(chr(ord("0") + (i * 3) % 10) for i in range(41))
    docs = spark.createDataFrame(
        [
            (0, a_pre + para + "tail-one ends here differently......"),
            (1, b_pre + para + "another closing run of words entirely"),
            (2, "completely unrelated filler text with no shared windows at all padded"
                " out to be comfortably longer than one window width"),
        ],
        "doc_id long, text string",
    )
    rows = XS.crossdoc_repeated_spans(docs).collect()
    got = {r["doc_id"]: r for r in rows}
    assert set(got) == {0, 1}
    assert (got[0]["span_start"], got[0]["span_len"]) == (len(a_pre), 100)
    assert (got[1]["span_start"], got[1]["span_len"]) == (len(b_pre), 100)
    assert got[0]["span_md5"] == got[1]["span_md5"]
    assert got[0]["n_grams"] == 100 - XS.SPAN_K + 1


def test_crossdoc_repeated_spans_short_docs_skipped(spark):
    """Docs shorter than the window contribute no positions (and the
    sequence() guard never generates a descending range)."""
    from nyc_taxi_data_engineering_spark.operators import exact_substr as XS

    docs = spark.createDataFrame(
        [(0, "tiny"), (1, "tiny"), (2, "x" * 64), (3, "x" * 64)],
        "doc_id long, text string",
    )
    rows = XS.crossdoc_repeated_spans(docs).collect()
    got = {r["doc_id"]: (r["span_start"], r["span_len"]) for r in rows}
    assert got == {2: (0, 64), 3: (0, 64)}


def test_crossdoc_span_scrub_canonical_keeps_others_cut(spark):
    """The min-doc_id holder keeps the shared paragraph; the other
    holder has exactly that span cut (clean text = its flanks), and
    an exact-duplicate pair scrubs to empty for the non-canonical
    copy."""
    import hashlib

    from nyc_taxi_data_engineering_spark.operators import exact_substr as XS

    para = "".join(chr(ord("A") + (i * 7) % 26) for i in range(100))
    a_pre = "".join(chr(ord("a") + (i * 11) % 26) for i in range(57))
    b_pre = "".join(chr(ord("0") + (i * 3) % 10) for i in range(41))
    b_post = "another closing run of words entirely"
    twin = "Y" * 64
    docs = spark.createDataFrame(
        [
            (0, a_pre + para + "tail-one ends here differently......"),
            (1, b_pre + para + b_post),
            (2, twin),
            (3, twin),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in XS.crossdoc_span_scrub(docs).collect()}
    assert len(got) == 4
    # doc 0 is canonical for the paragraph: untouched
    assert got[0]["n_cuts"] == 0 and got[0]["chars_removed"] == 0
    # doc 1 loses exactly the paragraph
    assert (got[1]["n_cuts"], got[1]["chars_removed"]) == (1, 100)
    want1 = (b_pre + b_post).encode()
    assert got[1]["clean_md5"] == hashlib.md5(want1).hexdigest()
    assert got[1]["clean_len"] == len(want1)
    # doc 2 is canonical for the twin; doc 3 scrubs to empty
    assert got[2]["n_cuts"] == 0
    assert (got[3]["n_cuts"], got[3]["chars_removed"], got[3]["clean_len"]) == (1, 64, 0)
    assert got[3]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_embedding_dedup_clusters_plants_with_original(spark, sf_dir):
    """Every planted perturbed twin (cos ~0.999 to its original) must
    share its original's cluster; organic vectors (max organic cos
    ~0.52, far below the 0.95 gate) stay singletons."""
    from nyc_taxi_data_engineering_spark.queries import similarity as S

    rows = {r["vec_id"]: r for r in S.q_embedding_dedup_clusters(spark, sf_dir).collect()}
    planted = [v for v in rows if v >= S.PLANT_OFFSET]
    assert planted, "no planted twins in corpus — test is vacuous"
    for v in planted:
        orig = v - S.PLANT_OFFSET
        assert rows[v]["cluster_id"] == rows[orig]["cluster_id"]
        assert rows[v]["cluster_size"] >= 2
        assert not rows[v]["is_canonical"]
    singles = [v for v, r in rows.items() if r["cluster_size"] == 1]
    assert len(singles) == len(rows) - 2 * len(planted)


# ---------------------------------------------------------------------------
# Prefix-filtered (PPJoin-style) Jaccard
# ---------------------------------------------------------------------------

def test_prefix_jaccard_matches_inverted_index(spark):
    """Losslessness on a mixed corpus: identical pair, near-dup pair,
    and unrelated docs — the prefix-filtered result must equal the
    full inverted-index join row-for-row at the same threshold."""
    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy dog tonight",   # exact dup of 0
        "the quick brown fox jumps over the lazy cat tonight",   # near-dup
        "completely different words about spark partitions here",
        "another unrelated document mentioning delta logs only",
    ]
    full = {
        (r["a_id"], r["b_id"]): (r["common_shingles"], r["jaccard"])
        for r in D.shingle_jaccard_pairs(_docs(spark, texts), threshold=0.5).collect()
    }
    # threshold 0.5 = 1/2 as a rational for the prefix arithmetic
    pref = {
        (r["a_id"], r["b_id"]): (r["common_shingles"], r["jaccard"])
        for r in D.prefix_filter_jaccard_pairs(
            _docs(spark, texts), threshold_num=1, threshold_den=2
        ).collect()
    }
    assert pref == full and (0, 1) in pref


def test_prefix_jaccard_identical_docs_is_one(spark):
    rows = D.prefix_filter_jaccard_pairs(
        _docs(spark, ["a b c d e f g h i j", "a b c d e f g h i j"])
    ).collect()
    assert len(rows) == 1
    assert (rows[0]["a_id"], rows[0]["b_id"], rows[0]["jaccard"]) == (0, 1, 1.0)


def test_prefix_index_is_smaller_than_full_index(spark):
    """The point of the filter: at tau=0.8 each doc indexes only
    |x| - ceil(0.8|x|) + 1 shingles (~20% + 1). Check the internal
    arithmetic via the public result being computable AND the prefix
    length formula on a 10-shingle doc: 10 - 8 + 1 = 3."""
    # 12 tokens -> 10 distinct 3-shingles
    doc = " ".join(f"w{i}" for i in range(12))
    out = D.prefix_filter_jaccard_pairs(_docs(spark, [doc, doc]))
    assert out.count() == 1  # still found via the 3-shingle prefix
