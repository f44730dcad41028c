"""Document deduplication family for the training-data pipeline
extensions (SURVEY.md §7.2 M7): exact, n-gram Jaccard, MinHash+LSH,
and SimHash near-dup detection. Seeds from the reference's fuzzy-match
MDM chain (C5, /root/reference/fuzzy_match.py:10-200), rebuilt on
shuffle-bounded set-similarity machinery instead of pandas pair loops.

Scale design (the 100 TB story):

- **Never O(n²).** Candidate generation is always a keyed equi-join —
  inverted shingle index (Jaccard), band-bucket join (MinHash LSH), or
  block-combination join (SimHash, Manku et al.) — so the shuffle is
  proportional to the number of *colliding* rows, not all pairs.
- **Map-side combine everywhere.** The SimHash bit sums and the
  common-shingle counts are hash aggregations; Spark's partial
  aggregation halves shuffle volume before the exchange.
- **Skew levers.** A stop-shingle (appearing in a huge fraction of
  docs) makes one join key hot; ``df_cap`` drops shingles above a
  document-frequency ceiling — the standard trick, exposed as an
  explicit knob so callers can tune it per corpus. LSH band width
  bounds collisions probabilistically.
- **All-native expressions.** Shingling, hashing, banding, Hamming
  distance are JVM-side Column expressions inside whole-stage codegen;
  there is no Python in any hot path.
"""

from __future__ import annotations

from functools import reduce
from itertools import combinations
from operator import add

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.functions import text as T
from nyc_taxi_data_engineering_spark.operators import session_cache

MINHASH_HASHES = 16
LSH_BANDS = 4  # 4 bands x 4 rows: P(candidate) = 1-(1-j^4)^4

# Manku-style SimHash blocking: the 64 bits split into 6 blocks
# (11,11,11,11,10,10). A pair within Hamming distance k agrees on at
# least 6-k whole blocks (pigeonhole), so joining on every
# C(6, 6-k)-combination of block values finds EVERY such pair. At the
# default k=3 that is C(6,3)=20 combinations with ~33-bit keys — wide
# enough that random collisions are ~n²/2³³ per combination instead of
# the n²/128 the old 8-bit byte buckets produced on organic corpora.
SIMHASH_BLOCK_SIZES = (11, 11, 11, 11, 10, 10)
SIMHASH_BLOCK_STARTS = (0, 11, 22, 33, 44, 54)
SIMHASH_BLOCKS = len(SIMHASH_BLOCK_SIZES)


def content_hash(c: Column) -> Column:
    """md5 of the raw text — the exact-dup equivalence key."""
    return F.md5(c)


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via hash-groupBy: every doc tagged with its content
    hash, the canonical (minimum-id) doc of its group, and a duplicate
    flag. One shuffle on the hash; at scale this is the cheapest pass
    and always runs before the probabilistic family."""
    w = Window.partitionBy("content_hash")
    return (
        docs.select(id_col, content_hash(F.col(text_col)).alias("content_hash"))
        .withColumn("canonical_doc_id", F.min(id_col).over(w))
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_doc_id"))
    )


def _shingle_sets(docs: DataFrame, id_col: str, text_col: str, w: int) -> DataFrame:
    # Two-phase on purpose: tokenize once per row into an attribute,
    # then shingle from the array — inlining the split into the
    # transform lambda would re-split the text once per shingle.
    toksed = docs.select(id_col, T.tokens(F.col(text_col)).alias("_toks"))
    return toksed.select(id_col, T.word_shingles_of(F.col("_toks"), w).alias("shingles"))


def shingle_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = T.SHINGLE_WORDS,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle
    index: explode distinct word w-grams, equi-join docs sharing a
    shingle, count common shingles per pair, then
    ``jaccard = common / (|A| + |B| - common)``.

    The join key is the shingle, so work scales with collisions (the
    candidate pairs), not |docs|². ``df_cap`` drops shingles whose
    document frequency exceeds the cap — the skew lever for corpora
    with boilerplate n-grams.

    Two physical choices, both measured end-to-end cold (the bench
    regime): the shingle sets are cached — they feed three consumers
    (sizes, both self-join sides), and one materialization beats three
    recomputations of the tokenize+shingle projection (4.8s → 2.75s at
    sf0.1; at corpus scale swap for ``persist(DISK_ONLY)`` or a staged
    write if the sets outgrow executor memory). The join/groupBy key is
    ``xxhash64(shingle)``, an 8-byte long instead of a ~20-char string,
    shrinking shuffle bytes and comparison cost (64-bit collisions are
    negligible at any realistic shingle cardinality)."""
    sets = _shingle_sets(docs, id_col, text_col, w).cache()
    sizes = sets.select(id_col, F.size("shingles").alias("n"))
    inv = sets.select(id_col, F.explode("shingles").alias("s")).select(
        id_col, F.xxhash64("s").alias("s")
    )
    if df_cap is not None:
        hot = inv.groupBy("s").count().filter(F.col("count") > df_cap).select("s")
        inv = inv.join(hot, "s", "left_anti")
    a = inv.alias("a")
    b = inv.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .agg(F.count("*").alias("common_shingles"))
    )
    na = sizes.select(F.col(id_col).alias("a_id"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("b_id"), F.col("n").alias("nb"))
    jac = F.col("common_shingles") / (F.col("na") + F.col("nb") - F.col("common_shingles"))
    return (
        common.join(na, "a_id")
        .join(nb, "b_id")
        .select("a_id", "b_id", "common_shingles", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def shingle_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = T.SHINGLE_WORDS,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: directional shingle containment
    ``|S_inner ∩ S_outer| / |S_inner|`` — the measure that catches a
    short document embedded in a long one (quote farms, boilerplate
    wrappers, page-in-site), which symmetric Jaccard misses: a 50-word
    doc fully contained in a 5 000-word doc has Jaccard ≈ 0.01 but
    containment 1.0 on the short side (Broder's containment coefficient,
    the classic companion to resemblance).

    Scale shape: identical to :func:`shingle_jaccard_pairs` — inverted
    shingle index, keyed equi-join, ``df_cap`` hot-shingle lever. The
    common-shingle counts are computed ONCE per unordered pair (a<b),
    then fanned to the two directional rows by a cheap projection
    union — no second self-join. Emits (inner_id, outer_id,
    common_shingles, containment) rows with containment ≥ threshold;
    a mutual near-dup pair yields both directions."""
    sets = _shingle_sets(docs, id_col, text_col, w).cache()
    sizes = sets.select(id_col, F.size("shingles").alias("n"))
    inv = sets.select(id_col, F.explode("shingles").alias("s")).select(
        id_col, F.xxhash64("s").alias("s")
    )
    if df_cap is not None:
        hot = inv.groupBy("s").count().filter(F.col("count") > df_cap).select("s")
        inv = inv.join(hot, "s", "left_anti")
    a = inv.alias("a")
    b = inv.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .agg(F.count("*").alias("common_shingles"))
    )
    na = sizes.select(F.col(id_col).alias("a_id"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("b_id"), F.col("n").alias("nb"))
    sized = common.join(na, "a_id").join(nb, "b_id")
    fwd = sized.select(
        F.col("a_id").alias("inner_id"),
        F.col("b_id").alias("outer_id"),
        "common_shingles",
        F.round(F.col("common_shingles") / F.col("na"), 6).alias("containment"),
    )
    rev = sized.select(
        F.col("b_id").alias("inner_id"),
        F.col("a_id").alias("outer_id"),
        "common_shingles",
        F.round(F.col("common_shingles") / F.col("nb"), 6).alias("containment"),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= threshold)


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = MINHASH_HASHES,
) -> DataFrame:
    """Per-doc MinHash signature as ``num_hashes`` columns s0..sN-1
    (min md5 over seed-prefixed shingles). Shingles are materialized
    in one projection then referenced by every hash column — Spark's
    CollapseProject keeps multi-referenced expensive expressions from
    being inlined, so shingling happens once per row."""
    sets = _shingle_sets(docs, id_col, text_col, T.SHINGLE_WORDS)
    mins = [T.seeded_min_hash(F.col("shingles"), i).alias(f"s{i}") for i in range(num_hashes)]
    return sets.select(id_col, *mins)


def lsh_band_keys(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = MINHASH_HASHES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """``(id, band, bucket)`` LSH keys from a signature frame: each
    band of ``r = num_hashes // bands`` signature columns hashes to one
    bucket key. This is the joinable form of a signature — self-join it
    for within-corpus pairs (:func:`lsh_candidate_pairs`) or join
    batch-side keys against a persisted corpus-side index for
    incremental dedup (:func:`incremental_dedup_status`)."""
    r = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.md5(F.concat_ws("|", *[f"s{i * r + j}" for j in range(r)])).alias("bucket"),
        )
        for i in range(bands)
    ]
    return sig.select(id_col, F.explode(F.array(*band_structs)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
    )


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = MINHASH_HASHES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """MinHash-LSH candidate pairs: hash each band of the signature to
    a bucket key, equi-join on (band, bucket), dedupe pairs, and score
    each candidate by signature agreement (estimated Jaccard).

    The band join is the scale path: a pair shuffles together only if
    it collides in ≥1 band, so candidate volume follows the S-curve
    ``1-(1-j^r)^b`` instead of n²."""
    banded = lsh_band_keys(sig, id_col, num_hashes, bands)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("a_id"), *[F.col(f"s{i}").alias(f"a_s{i}") for i in range(num_hashes)])
    sb = sig.select(F.col(id_col).alias("b_id"), *[F.col(f"s{i}").alias(f"b_s{i}") for i in range(num_hashes)])
    matches = reduce(
        add,
        [F.when(F.col(f"a_s{i}") == F.col(f"b_s{i}"), 1).otherwise(0) for i in range(num_hashes)],
    )
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", (matches / F.lit(float(num_hashes))).alias("est_similarity"))
    )


def incremental_dedup_status(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = MINHASH_HASHES,
    bands: int = LSH_BANDS,
    neardup_min: float = 0.5,
) -> DataFrame:
    """Incremental (batch-vs-corpus) dedup: classify every incoming
    ``batch`` document against an already-ingested ``corpus`` snapshot.
    Returns ``(id, status)`` with status one of, in precedence order:

    - ``exact_dup_corpus`` — content hash already present in the corpus
    - ``exact_dup_batch`` — hash new to the corpus but duplicated
      within the batch; only the minimum-id copy survives
    - ``neardup_corpus`` — exact-unique, but MinHash-LSH band collision
      with a corpus doc at signature agreement ≥ ``neardup_min``
    - ``kept`` — admit into the corpus

    This is the per-snapshot dedup a continuously refreshed corpus
    runs (each crawl dedups against everything already ingested, not
    just itself). Scale shape: the exact stage is one hash equi-join
    (batch ≪ corpus, so the batch side is the small probe side); the
    near-dup stage joins batch band keys against the corpus band
    index — at production scale the corpus signatures/bands are
    persisted once per snapshot and only the batch side is computed
    fresh, so per-refresh cost is proportional to the batch, not the
    corpus. No stage is ever all-pairs."""
    bh = batch.select(id_col, content_hash(F.col(text_col)).alias("h"))
    ch = corpus.select(content_hash(F.col(text_col)).alias("h")).distinct()
    flags = (
        bh.join(ch.withColumn("in_corpus", F.lit(True)), "h", "left")
        .withColumn("in_corpus", F.coalesce("in_corpus", F.lit(False)))
        .withColumn("canon", F.min(id_col).over(Window.partitionBy("h")))
    )
    survivors = flags.filter(~F.col("in_corpus") & (F.col(id_col) == F.col("canon"))).select(id_col)
    bsig = minhash_signatures(batch.join(survivors, id_col), id_col, text_col, num_hashes)
    csig = minhash_signatures(corpus, id_col, text_col, num_hashes)
    bband = lsh_band_keys(bsig, id_col, num_hashes, bands)
    cband = lsh_band_keys(csig, id_col, num_hashes, bands)
    cand = (
        bband.alias("a")
        .join(
            cband.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(F.col(f"a.{id_col}").alias("b_id"), F.col(f"b.{id_col}").alias("c_id"))
        .distinct()
    )
    sa = bsig.select(
        F.col(id_col).alias("b_id"), *[F.col(f"s{i}").alias(f"a_s{i}") for i in range(num_hashes)]
    )
    sb = csig.select(
        F.col(id_col).alias("c_id"), *[F.col(f"s{i}").alias(f"b_s{i}") for i in range(num_hashes)]
    )
    matches = reduce(
        add,
        [F.when(F.col(f"a_s{i}") == F.col(f"b_s{i}"), 1).otherwise(0) for i in range(num_hashes)],
    )
    near = (
        cand.join(sa, "b_id")
        .join(sb, "c_id")
        .filter(matches / F.lit(float(num_hashes)) >= neardup_min)
        .select(F.col("b_id").alias(id_col))
        .distinct()
        .withColumn("is_near", F.lit(True))
    )
    return flags.join(near, id_col, "left").select(
        id_col,
        F.when(F.col("in_corpus"), "exact_dup_corpus")
        .when(F.col(id_col) != F.col("canon"), "exact_dup_batch")
        .when(F.coalesce("is_near", F.lit(False)), "neardup_corpus")
        .otherwise("kept")
        .alias("status"),
    )


OPH_BINS = 16  # one permutation, 16 bins -> same 4x4 banding as MinHash(16)


def oph_minhash_bins(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bins: int = OPH_BINS,
) -> DataFrame:
    """One-Permutation Hashing signature (Li/Owen/Zhang, NIPS 2012) as
    dense ``(id, bin, sig)`` rows: each distinct shingle is hashed
    ONCE, the hash space is cut into ``n_bins`` bins, and the
    signature is the per-bin minimum — k-permutation MinHash's
    accuracy at 1/k of the hash compute. The k-hash variant
    (minhash_signatures) evaluates k md5s per shingle, and the sf10
    probe put that at 33 s/decade for k=16; one permutation makes the
    per-shingle work a single md5 plus integer ops.

    Empty bins (P = (1-1/k)^|set|, material for short docs) are filled
    by ROTATION densification (Shrivastava & Li, ICML 2014): a bin
    borrows the value of the next non-empty bin to its right,
    circularly — expressed as two first_value-ignore-nulls windows
    over the dense per-doc frame (16 rows per doc; the exchange is 16n
    skinny rows, far below the k-hash variant's per-row compute).

    Scale shape: one explode + hash per distinct shingle, one
    (id, bin) hash agg with map-side combine, one per-doc window over
    16-row partitions. Every stage is keyed — no pairwise anything."""
    sets = _shingle_sets(docs, id_col, text_col, T.SHINGLE_WORDS)
    mins = (
        sets.select(id_col, F.explode("shingles").alias("sh"))
        .select(id_col, F.md5(F.concat(F.lit("oph:"), F.col("sh"))).alias("h"))
        .select(
            id_col,
            (F.conv(F.substring("h", 1, 4), 16, 10).cast("int") % n_bins).alias("bin"),
            "h",
        )
        .groupBy(id_col, "bin")
        .agg(F.min("h").alias("m"))
    )
    dense = sets.select(
        id_col, F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
    ).join(mins, [id_col, "bin"], "left")
    fwd = Window.partitionBy(id_col).orderBy("bin").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    wrap = Window.partitionBy(id_col).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return dense.select(
        id_col,
        "bin",
        F.coalesce(
            F.first("m", ignorenulls=True).over(fwd),
            F.first("m", ignorenulls=True).over(wrap),
        ).alias("sig"),
    )


def oph_lsh_pairs(
    bins_df: DataFrame,
    id_col: str = "doc_id",
    n_bins: int = OPH_BINS,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """LSH candidate pairs over OPH signatures: band = ``r`` adjacent
    bins hashed to one bucket key, candidates equi-join on
    (band, bucket), each pair scored by the fraction of agreeing bins
    (estimated Jaccard — exactly the MinHash estimator, since each
    bin's min is a uniform min-hash of the set restricted to that
    partition of hash space). Same S-curve 1-(1-j^r)^b as the k-hash
    banding."""
    r = n_bins // bands
    banded = (
        bins_df.select(id_col, (F.col("bin") / r).cast("int").alias("band"), "bin", "sig")
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("bin", "sig"))),
                        lambda s: s["sig"],
                    ),
                    "|",
                )
            ).alias("bucket")
        )
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )
    sa = bins_df.select(F.col(id_col).alias("a_id"), "bin", F.col("sig").alias("a_sig"))
    sb = bins_df.select(F.col(id_col).alias("b_id"), "bin", F.col("sig").alias("b_sig"))
    return (
        pairs.join(sa, "a_id")
        .join(sb, ["b_id", "bin"])
        .groupBy("a_id", "b_id")
        .agg(
            (
                F.sum(F.when(F.col("a_sig") == F.col("b_sig"), 1).otherwise(0))
                / F.lit(float(n_bins))
            ).alias("est_similarity")
        )
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc 64-bit SimHash over whitespace tokens (with
    multiplicity): md5 each token once, aggregate per-bit sums in ONE
    hash aggregation (map-side partial combine applies), then assemble
    the sign bits into a signed long.

    Semantics: bit b (0..63) is set iff the sum over tokens of ±1 —
    bit (3 - b%4) of hex nibble b//4 of the token's md5, i.e. the
    digest's first 64 bits — is >= 0. Implemented arithmetically: the
    16 leading nibbles are decoded once per token into two 32-bit ints
    (``conv`` on 8-hex-char slices), each bit tested with shift/AND,
    and the ±1 sum rewritten as ``2*popcount_b >= n_tokens`` — integer
    codegen beats the equivalent substring+isin string aggregates ~3x,
    with identical results (ties included). Bit 63 contributes the
    BIGINT sign weight -2^63, so the value spans the full signed-long
    range; Hamming distance via xor+bit_count is sign-agnostic. The
    explode+agg formulation keeps work proportional to total tokens
    and parallel by (doc, token)."""
    toks = docs.select(id_col, F.explode(T.tokens(F.col(text_col))).alias("tok")).select(
        id_col, F.md5("tok").alias("h")
    )
    ints = toks.select(
        id_col,
        *[
            F.conv(F.substring("h", 8 * k + 1, 8), 16, 10).cast("long").alias(f"v{k}")
            for k in range(T.SIMHASH_BITS // 32)
        ],
    )

    def bit(b: int) -> Column:
        # bit b = bit (3 - b%4) of global nibble ni = b//4; nibble ni
        # sits at nibble position (7 - ni%8) of 32-bit int ni//8
        ni = b // 4
        shift = 4 * (7 - ni % 8) + (3 - b % 4)
        return F.shiftright(F.col(f"v{ni // 8}"), shift).bitwiseAND(F.lit(1))

    def weight(b: int) -> Column:
        if b == T.SIMHASH_BITS - 1:  # -2^63, additively (2^63 overflows)
            return F.lit(-9223372036854775807) - F.lit(1)
        return F.lit(1 << b)

    sums = ints.groupBy(id_col).agg(
        F.count("*").alias("n"),
        *[F.sum(bit(b)).alias(f"c{b}") for b in range(T.SIMHASH_BITS)],
    )
    value = reduce(
        add,
        [
            F.when(F.col(f"c{b}") * 2 >= F.col("n"), weight(b)).otherwise(F.lit(0))
            for b in range(T.SIMHASH_BITS)
        ],
    )
    return sums.select(id_col, value.cast("long").alias("simhash"))


def _simhash_block(c: Column, i: int) -> Column:
    """Block i of a 64-bit simhash as an unsigned value (shiftright
    UNSIGNED — block 5 contains the sign bit)."""
    return F.shiftrightunsigned(c, SIMHASH_BLOCK_STARTS[i]).bitwiseAND(
        F.lit((1 << SIMHASH_BLOCK_SIZES[i]) - 1)
    )


def simhash_neardup_pairs(
    sim: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs via Manku block combinations: split the
    64-bit hash into 6 blocks; a pair within Hamming distance
    ``max_hamming`` agrees on at least ``6 - max_hamming`` whole blocks
    (pigeonhole), so equi-joining on every C(6, 6-max_hamming)
    combination of block values — packed into one long key — finds
    EVERY such pair with zero false negatives. At the default k=3:
    20 combinations, ~33-bit keys, so random (non-near-dup) collisions
    are ~20·n²/2³³ — candidate volume tracks true-pair density, where
    8-bit byte buckets were a guaranteed n²/128 on organic corpora.
    Each doc explodes to 20 (combo, key) rows; the join, the distinct,
    and the xor+bit_count rescore are all keyed operations."""
    if not 0 < max_hamming < SIMHASH_BLOCKS:
        raise ValueError(f"max_hamming must be in 1..{SIMHASH_BLOCKS - 1}, got {max_hamming}")
    # Optimization r12 (guide §8 "decide with small rows"): the signature
    # table feeds BOTH sides of the block self-join, and for the media
    # callers it is a mapInArrow decode pipeline (PPM/PCM bytes through
    # Python) that would otherwise re-execute once per side — measured
    # 17.6 -> 5.1 s on image_dedup_clusters at sf0.01. The persisted
    # proxy is (id, simhash): 16 bytes/row at ANY corpus scale, the
    # canonical fingerprints-only intermediate.
    sim = session_cache(sim.select(id_col, "simhash"))
    combos = list(combinations(range(SIMHASH_BLOCKS), SIMHASH_BLOCKS - max_hamming))
    pack_shift = max(SIMHASH_BLOCK_SIZES)
    blocks = [
        F.struct(
            F.lit(p).alias("pos"),
            reduce(
                lambda acc, nxt: acc.bitwiseOR(nxt),
                [
                    F.shiftleft(_simhash_block(F.col("simhash"), c), pack_shift * j)
                    for j, c in enumerate(combo)
                ],
            ).alias("key"),
        )
        for p, combo in enumerate(combos)
    ]
    blocked = sim.select(id_col, "simhash", F.explode(F.array(*blocks)).alias("blk")).select(
        id_col, "simhash", F.col("blk.pos").alias("pos"), F.col("blk.key").alias("key")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            F.col("a.simhash").alias("a_sim"),
            F.col("b.simhash").alias("b_sim"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim")))
    return (
        pairs.select("a_id", "b_id", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup pairs — the step that turns
    pairwise dedup output into CLUSTERS (keep one canonical doc per
    component, drop the rest). Returns (id, component) where component
    is the minimum node id in the cluster; ``nodes`` (optional) adds
    isolated nodes as singleton components.

    Algorithm: min-label propagation with pointer doubling. Each round
    (1) propagates — every node takes the min label among itself and
    its neighbors (keyed join + hash-agg), then (2) shortcuts — every
    node re-reads its label's label (a self-join on the label column),
    halving the remaining pointer depth. Propagation alone needs
    O(max cluster diameter) rounds, which an adversarial chain (a
    path graph from pairwise near-dups of drifting revisions) can push
    to O(n); the shortcut step makes distance-to-minimum shrink
    geometrically, bounding rounds at O(log diameter) — the same bound
    the alternating-star algorithm (Kiveris et al., CC-MR) achieves,
    at two keyed equi-joins per round. ``max_iter`` stays as the
    safety valve (raises if not converged; 25 rounds covers diameters
    beyond any real corpus). Each round localCheckpoints the labels:
    without it the iterated join lineage grows quadratically and the
    driver, not the data, becomes the bottleneck.
    """
    # Materialize the symmetric edge list ONCE: ``edges`` is typically the
    # output of an expensive candidate-pair pipeline (shingle inverted-index
    # join), and every propagation round + convergence probe re-reads it.
    # Without this materialization the edge pipeline re-executes per round
    # and dominates the runtime; with it each round touches only the (small)
    # pair list. At cluster scale this is the persist-the-edge-list step
    # every iterative graph job starts with. repartition("src")+persist
    # rather than localCheckpoint (optimization r12, guide §2.4/§3.1): the
    # InMemoryRelation keeps size stats and outputPartitioning, so the
    # per-round propagate join can broadcast a near-dup pair list that is
    # tiny relative to the node set (the common case) or reuse the src
    # layout under SMJ — a pinned LogicalRDD has neither and forced a
    # fresh edge shuffle every round. Loop-invariant with a flat plan, so
    # the pin() cache-manager caveat for per-round state does not apply.
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .repartition("src")
    )
    sym = session_cache(sym)
    ids = sym.select(F.col("src").alias("id")).distinct()
    if nodes is not None:
        ids = ids.unionByName(nodes.select(F.col(node_col).alias("id"))).distinct()
    labels = ids.withColumn("component", F.col("id")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("_nbr_min"))
        )
        propagated = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("_nbr_min"), F.col("component"))
            ).alias("component"),
            F.col("component").alias("_old"),
        )
        # Pointer doubling: component values are always node ids, so
        # look up each label's own label and adopt it (labels only
        # decrease, so the parent's label is ≤ ours). This is what
        # turns O(diameter) propagation into O(log diameter) rounds.
        parents = propagated.select(
            F.col("id").alias("component"), F.col("component").alias("_parent")
        )
        new_labels = (
            propagated.join(parents, "component", "left")
            .select(
                "id",
                F.coalesce(F.col("_parent"), F.col("component")).alias("component"),
                "_old",
            )
            .localCheckpoint(eager=True)
        )
        # Convergence probe off the just-checkpointed round output —
        # carrying _old through the round replaces a third keyed join
        # (new vs previous labels) with a filter over local blocks.
        changed = new_labels.filter(F.col("component") != F.col("_old")).limit(1).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = T.SHINGLE_WORDS,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via PREFIX FILTERING
    (AllPairs / PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    WWW'08): index only each document's RAREST ``|x| - ceil(tau*|x|) +
    1`` shingles under the global (document-frequency asc, shingle
    asc) order, generate candidates from prefix collisions alone, then
    verify each candidate pair EXACTLY against the full cached shingle
    sets. Lossless for Jaccard >= tau: any qualifying pair shares at
    least one token inside both prefixes (overlap >= ceil(tau *
    max(|x|,|y|)) forces the pigeonhole), so the result is identical
    to the full inverted-index join — the registered oracle IS the
    brute inverted-index SQL, making the gate a standing losslessness
    proof.

    Why this beats the plain inverted index at scale: the index (and
    the self-join's collision volume) shrinks by ~(1-tau) per doc —
    at tau=0.8 only ~20% of shingles are indexed, and because the
    prefix keeps the RAREST shingles, the hottest join keys (the
    boilerplate n-grams that df_cap exists to drop) fall out of the
    index for free on most docs. Verification joins each candidate
    pair once against the cached sets — per-candidate work, zero
    re-shuffle of the corpus.

    The threshold enters the prefix length as the RATIONAL
    ``threshold_num/threshold_den`` so ceil(tau*n) is pure integer
    arithmetic — ``(num*n + den - 1) DIV den`` — identical in both
    engines (a double 0.8*n crosses integer boundaries differently in
    IEEE doubles vs DuckDB decimals). The final jaccard filter uses
    the same rounded-value comparison as shingle_jaccard_pairs."""
    threshold = threshold_num / threshold_den
    sets = _shingle_sets(docs, id_col, text_col, w).cache()
    sizes = sets.select(id_col, F.size("shingles").alias("n"))
    inv = sets.select(id_col, F.explode("shingles").alias("tok")).select(
        id_col, F.col("tok"), F.xxhash64("tok").alias("s")
    )
    dfreq = inv.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    order = Window.partitionBy(id_col).orderBy("df", "s")
    alpha = F.expr(f"({threshold_num} * n + {threshold_den - 1}) DIV {threshold_den}")
    prefix = (
        inv.join(dfreq, "s")
        .withColumn("rn", F.row_number().over(order))
        .join(sizes, id_col)
        .filter(F.col("rn") <= F.col("n") - alpha + F.lit(1))
        .select(id_col, "s")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )
    sa = sets.select(F.col(id_col).alias("a_id"), F.col("shingles").alias("sha"))
    sb = sets.select(F.col(id_col).alias("b_id"), F.col("shingles").alias("shb"))
    verified = (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("sha", "shb")).alias("common_shingles"),
            F.size("sha").alias("na"),
            F.size("shb").alias("nb"),
        )
    )
    jac = F.col("common_shingles") / (F.col("na") + F.col("nb") - F.col("common_shingles"))
    return verified.select(
        "a_id", "b_id", "common_shingles", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)
