"""Sketch queries over the documents token stream: KMV distinct
estimation per source and count-min heavy-hitter estimates, both
hash-deterministic (operators/sketches) so the DuckDB oracle replays
the sketch bit-for-bit — estimates AND their error against the exact
answer are asserted every round, which is the whole point of shipping
deterministic sketches instead of approx_count_distinct."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table_parallel as load_table
from nyc_taxi_data_engineering_spark.functions import text as T
from nyc_taxi_data_engineering_spark.operators import sketches as K
from nyc_taxi_data_engineering_spark.queries.registry import query

CMS_TOP = 20

_SQL_TOKS = f"""
toks AS (
    SELECT source, unnest({T.sql_tokens('text')}) AS tok FROM documents
),
tok2 AS (SELECT source, tok FROM toks WHERE len(tok) > 0)
"""


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .filter(F.length("tok") > 0)
    )


@query(
    "kmv_distinct_tokens",
    oracle=f"""
WITH {_SQL_TOKS},
exact AS (SELECT source, COUNT(DISTINCT tok) AS n_exact FROM tok2 GROUP BY source),
hashed AS (SELECT DISTINCT source, {K.hash_fraction_sql('tok')} AS u FROM tok2),
kept AS (
    SELECT source, u FROM (
        SELECT source, u, row_number() OVER (PARTITION BY source ORDER BY u) AS rnk
        FROM hashed
    ) WHERE rnk <= {K.KMV_K}
),
sk AS (
    SELECT source,
           COUNT(*) AS n_hashes_kept,
           round(MAX(u), 9) AS kth_min,
           round(CASE WHEN COUNT(*) < {K.KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                      ELSE ({K.KMV_K} - 1) / MAX(u) END, 3) AS est_distinct
    FROM kept GROUP BY source
)
SELECT s.source, e.n_exact, s.n_hashes_kept, s.kth_min, s.est_distinct,
       round(s.est_distinct / e.n_exact - 1, 3) AS rel_error
FROM sk s JOIN exact e USING (source)
""",
)
def q_kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token cardinality: KMV(64) estimate next to
    the exact count and the relative error. At 100 TB the exact column
    disappears and the sketch (one distinct-hash shuffle, mergeable
    k-minima) IS the answer; here the exact twin keeps the estimator's
    error under the oracle gate."""
    toks = _tokens(spark, sf_dir)
    exact = toks.groupBy("source").agg(F.count_distinct("tok").alias("n_exact"))
    sk = K.kmv_distinct(toks, "source", "tok")
    return sk.join(exact, "source").select(
        "source",
        "n_exact",
        "n_hashes_kept",
        "kth_min",
        "est_distinct",
        F.round(F.col("est_distinct") / F.col("n_exact") - 1, 3).alias("rel_error"),
    )


_CMS_COUNTER_SELECTS = "\n    UNION ALL ".join(
    f"SELECT {j} AS hash_row, {K.cms_bucket_sql('tok', j)} AS bucket, COUNT(*) AS cnt"
    f" FROM tok2 GROUP BY {K.cms_bucket_sql('tok', j)}"
    for j in range(K.CMS_DEPTH)
)

_CMS_MIN = "least(" + ", ".join(f"c{j}.cnt" for j in range(K.CMS_DEPTH)) + ")"
_CMS_JOINS = "\n".join(
    f"JOIN counters c{j} ON c{j}.hash_row = {j} AND c{j}.bucket = {K.cms_bucket_sql('cand.tok', j)}"
    for j in range(K.CMS_DEPTH)
)


@query(
    "cms_heavy_hitters",
    oracle=f"""
WITH {_SQL_TOKS},
counters AS (
    {_CMS_COUNTER_SELECTS}
),
cand AS (
    SELECT tok, COUNT(*) AS true_cnt FROM tok2
    GROUP BY tok ORDER BY true_cnt DESC, tok LIMIT {CMS_TOP}
)
SELECT cand.tok, cand.true_cnt,
       {_CMS_MIN} AS cms_est,
       {_CMS_MIN} - cand.true_cnt AS overestimate
FROM cand
{_CMS_JOINS}
""",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimates for the corpus's top-{CMS_TOP}
    tokens, next to their true counts. The counter table is ≤ d·w =
    1024 rows from ONE explode + hash agg — at 100 TB it broadcasts
    and every subsequent frequency probe skips the corpus entirely;
    the overestimate column (always ≥ 0, bounded by collision mass)
    is the sketch's contract, asserted by the oracle every round."""
    toks = _tokens(spark, sf_dir).select("tok")
    counters = K.cms_counters(toks, "tok")
    cand = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "tok")
        .limit(CMS_TOP)
    )
    return K.cms_estimate(cand, counters, "tok").select(
        "tok",
        "true_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("true_cnt")).alias("overestimate"),
    )


HIST_QUANTILES = [0.5, 0.9, 0.99]


@query(
    "histogram_quantiles_orders",
    oracle=f"""
WITH est AS ({K.histogram_quantiles_sql('orders', 'o_totalprice', HIST_QUANTILES)}),
ex AS (
    SELECT unnest([{', '.join(str(q) for q in HIST_QUANTILES)}]) AS quantile,
           unnest([{', '.join(f'round(quantile_cont(o_totalprice, {q}), 6)' for q in HIST_QUANTILES)}]) AS exact_value
    FROM orders
)
SELECT e.quantile, e.est_value, x.exact_value,
       round(e.est_value - x.exact_value, 6) AS est_error
FROM est e JOIN ex x USING (quantile)
ORDER BY e.quantile
""",
)
def q_histogram_quantiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price quantiles from the 256-bucket fixed-grid histogram
    sketch (operators/sketches histogram_quantiles) next to the exact
    sort-based percentiles — the error column is bounded by one bucket
    width and asserted by the oracle every round. At 100 TB the exact
    side disappears and the mergeable histogram (two scans, no sort,
    per-partition merge by addition) IS the percentile path."""
    orders = load_table(spark, sf_dir, "orders")
    est = K.histogram_quantiles(orders, "o_totalprice", HIST_QUANTILES)
    exact = orders.agg(
        *[
            F.round(F.expr(f"percentile(o_totalprice, {q})"), 6).alias(f"x{i}")
            for i, q in enumerate(HIST_QUANTILES)
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(float(q)).alias("quantile"), F.col(f"x{i}").alias("exact_value"))
                    for i, q in enumerate(HIST_QUANTILES)
                ]
            )
        ).alias("e")
    ).select("e.quantile", "e.exact_value")
    return (
        est.join(exact, "quantile")
        .select(
            "quantile",
            "est_value",
            "exact_value",
            F.round(F.col("est_value") - F.col("exact_value"), 6).alias("est_error"),
        )
        .orderBy("quantile")
    )


@query(
    "hll_distinct_tokens",
    oracle=f"""
WITH {_SQL_TOKS},
exact AS (SELECT source, COUNT(DISTINCT tok) AS n_exact FROM tok2 GROUP BY source),
{K.hll_sql('tok2', 'source', 'tok')}
SELECT e.source, e.n_exact, s.n_registers_used, s.est_distinct,
       round(s.est_distinct / e.n_exact - 1, 3) AS rel_error
FROM est s JOIN exact e USING (source)
""",
)
def q_hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct tokens by HyperLogLog(1024) next to the
    exact count — the industry-standard mergeable cardinality sketch,
    made oracle-checkable by keeping the whole estimator in integer
    arithmetic (2^-rho terms as exact 2^(52-rho) integers, one final
    division; rho via length(bin(x)), never a log). One hash agg to
    the <= 1024-row register table per group, mergeable by MAX —
    at 100 TB the register tables union across shards for free.
    Companion to kmv_distinct_tokens: two independent estimators,
    both with their error under the hash gate."""
    toks = _tokens(spark, sf_dir)
    exact = toks.groupBy("source").agg(F.count_distinct("tok").alias("n_exact"))
    est = K.hll_estimate(K.hll_registers(toks, "source", "tok"), "source")
    return est.join(exact, "source").select(
        "source",
        "n_exact",
        "n_registers_used",
        "est_distinct",
        F.round(F.col("est_distinct") / F.col("n_exact") - 1, 3).alias("rel_error"),
    )


from nyc_taxi_data_engineering_spark.operators import sampling as SA  # noqa: E402
from nyc_taxi_data_engineering_spark.queries.sampling import SPLIT_SEED, SPLITS  # noqa: E402

_SPLIT_SQL = SA.assign_split_sql("doc_id", SPLITS, SPLIT_SEED)


@query(
    "kmv_split_overlap",
    oracle=f"""
WITH base AS (
    SELECT {_SPLIT_SQL} AS split,
           [w for w in {T.sql_tokens('text')} if len(w) > 0] AS toks
    FROM documents
),
tok2 AS (
    SELECT split, unnest({T.sql_word_ngrams('toks', 2)}) AS tok
    FROM base WHERE split IN ('train', 'test')
),
exact AS (
    SELECT
      (SELECT COUNT(DISTINCT tok) FROM tok2 WHERE split = 'train') AS train_exact,
      (SELECT COUNT(DISTINCT tok) FROM tok2 WHERE split = 'test') AS test_exact,
      (SELECT COUNT(*) FROM (
          SELECT tok FROM tok2 WHERE split = 'train'
          INTERSECT
          SELECT tok FROM tok2 WHERE split = 'test')) AS overlap_exact
),
hashed AS (SELECT DISTINCT split, {K.hash_fraction_sql('tok')} AS u FROM tok2),
kept AS (
    SELECT split, u FROM (
        SELECT split, u, row_number() OVER (PARTITION BY split ORDER BY u) AS rnk
        FROM hashed
    ) WHERE rnk <= {K.KMV_K}
),
uni AS (
    SELECT u FROM (
        SELECT DISTINCT u FROM kept ORDER BY u LIMIT {K.KMV_K}
    )
),
marked AS (
    SELECT uni.u,
           (EXISTS (SELECT 1 FROM kept a WHERE a.split = 'train' AND a.u = uni.u))::INT AS in_a,
           (EXISTS (SELECT 1 FROM kept b WHERE b.split = 'test' AND b.u = uni.u))::INT AS in_b
    FROM uni
),
sk AS (
    SELECT COUNT(*) AS n_kept,
           MAX(u) AS kth,
           SUM(in_a * in_b) AS n_both
    FROM marked
)
SELECT e.train_exact, e.test_exact, e.overlap_exact,
       round(CASE WHEN sk.n_kept < {K.KMV_K} THEN CAST(sk.n_kept AS DOUBLE)
                  ELSE ({K.KMV_K} - 1) / sk.kth END, 3) AS union_est,
       round(sk.n_both * 1.0 / sk.n_kept, 6) AS jaccard_est,
       round(sk.n_both * 1.0 / sk.n_kept
             * CASE WHEN sk.n_kept < {K.KMV_K} THEN CAST(sk.n_kept AS DOUBLE)
                    ELSE ({K.KMV_K} - 1) / sk.kth END, 3) AS intersection_est
FROM sk, exact e
""",
)
def q_kmv_split_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV SET OPERATIONS — the theta-sketch workflow on the train/test
    BIGRAM-vocabulary question "how much does my held-out split share
    with training?" (bigrams, not unigrams, so the corpus cardinality
    actually exceeds k and the (k-1)/h_k estimator path is exercised): each split keeps only its k smallest distinct token
    hashes (mergeable, bounded state), the UNION sketch is the k
    smallest of the merged minima, Jaccard is estimated by the fraction
    of union-sketch hashes present in BOTH input sketches, and
    intersection = jaccard x union estimate — all without ever
    materializing either vocabulary. The exact counts ride along so the
    estimator's answer sits under the hash gate (the kmv_distinct_tokens
    pattern). Scale shape: ONE distinct-hash shuffle on (split, hash);
    everything after runs on <= 2k rows. At 100 TB each partition
    pre-sketches and the minima merge — the reason production systems
    ship theta/KMV sketches instead of COUNT(DISTINCT) for overlap
    questions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        SA.assign_split(docs.select("doc_id", "text"), "doc_id", SPLITS, SPLIT_SEED)
        .filter(F.col("split").isin("train", "test"))
        .select(
            "split",
            F.explode(
                T.word_ngrams(
                    F.filter(T.tokens(F.col("text")), lambda w: F.length(w) > 0), 2
                )
            ).alias("tok"),
        )
    )
    tr = toks.filter(F.col("split") == "train").select("tok").distinct()
    te = toks.filter(F.col("split") == "test").select("tok").distinct()
    exact = (
        tr.agg(F.count(F.lit(1)).alias("train_exact"))
        .crossJoin(te.agg(F.count(F.lit(1)).alias("test_exact")))
        .crossJoin(tr.join(te, "tok").agg(F.count(F.lit(1)).alias("overlap_exact")))
    )
    from pyspark.sql import Window

    hashed = toks.select("split", K.hash_fraction(F.col("tok")).alias("u")).distinct()
    w = Window.partitionBy("split").orderBy("u")
    kept = hashed.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= K.KMV_K
    )
    uni = kept.select("u").distinct().orderBy("u").limit(K.KMV_K)
    in_a = kept.filter(F.col("split") == "train").select("u", F.lit(1).alias("in_a"))
    in_b = kept.filter(F.col("split") == "test").select("u", F.lit(1).alias("in_b"))
    marked = (
        uni.join(in_a, "u", "left")
        .join(in_b, "u", "left")
        .select(
            "u",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
    )
    sk = marked.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("u").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    union_est = F.when(
        F.col("n_kept") < K.KMV_K, F.col("n_kept").cast("double")
    ).otherwise((K.KMV_K - 1) / F.col("kth"))
    jac = F.col("n_both") * F.lit(1.0) / F.col("n_kept")
    return sk.crossJoin(F.broadcast(exact)).select(
        "train_exact",
        "test_exact",
        "overlap_exact",
        F.round(union_est, 3).alias("union_est"),
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * union_est, 3).alias("intersection_est"),
    )


from nyc_taxi_data_engineering_spark.operators.sketches import (
    HLL_ALPHA,
    HLL_M,
    HLL_RHO_BITS,
    _HLL_SCALE,
)

WAU_WINDOW = 7


@query(
    "hll_wau_events",
    oracle=f"""
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
regs AS (
    SELECT d,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % {HLL_M} AS reg,
           MAX(CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 5, 13))::BIGINT = 0
                    THEN {HLL_RHO_BITS + 1}
                    ELSE {HLL_RHO_BITS + 1}
                         - length(bin(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 5, 13))::BIGINT))
               END) AS max_rho
    FROM ud GROUP BY d, reg
),
scat AS (
    SELECT r.d + CAST(g.i AS INTEGER) AS target_day, r.reg, r.max_rho
    FROM regs r, UNNEST(generate_series(0, {WAU_WINDOW - 1})) AS g(i)
),
merged AS (
    SELECT s.target_day, s.reg, MAX(s.max_rho) AS max_rho
    FROM scat s JOIN days t ON t.d = s.target_day
    GROUP BY s.target_day, s.reg
),
est AS (
    SELECT target_day,
           CAST(COUNT(*) AS BIGINT) AS n_registers_used,
           CAST(SUM((CAST(1 AS BIGINT) << GREATEST({HLL_RHO_BITS} - max_rho, 0))) AS BIGINT)
             AS s_observed
    FROM merged GROUP BY target_day
),
exact_scat AS (
    SELECT u.d + CAST(g.i AS INTEGER) AS target_day, u.user_id
    FROM ud u, UNNEST(generate_series(0, {WAU_WINDOW - 1})) AS g(i)
),
exact AS (
    SELECT e.target_day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS wau_exact
    FROM exact_scat e JOIN days t ON t.d = e.target_day
    GROUP BY e.target_day
)
SELECT strftime(x.target_day, '%Y-%m-%d') AS day,
       x.wau_exact,
       round({HLL_ALPHA!r} * {_HLL_SCALE!r}
             / CAST(s_observed + ({HLL_M} - n_registers_used)
                    * (CAST(1 AS BIGINT) << {HLL_RHO_BITS}) AS DOUBLE), 3) AS wau_est,
       round(abs(round({HLL_ALPHA!r} * {_HLL_SCALE!r}
             / CAST(s_observed + ({HLL_M} - n_registers_used)
                    * (CAST(1 AS BIGINT) << {HLL_RHO_BITS}) AS DOUBLE), 3) - wau_exact)
             / wau_exact, 6) AS rel_error
FROM exact x JOIN est ON est.target_day = x.target_day
ORDER BY day
""",
)
def q_hll_wau_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{WAU_WINDOW}-day WAU via MERGEABLE HLL register tables —
    the 100 TB path for COUNT DISTINCT over sliding windows, where the
    exact scatter (events_dau_wau_stickiness) reshuffles user ids: here
    each day keeps a {HLL_M}-register sketch, the day-offset scatter
    moves REGISTERS (m rows/day, independent of users), and the window
    merge is a MAX hash agg — per-day state is constant, so the
    window's cost no longer grows with distinct users. Exact WAU rides
    along for the per-day relative error, putting the approximation
    quality itself under the hash gate (md5 registers are
    engine-deterministic; the estimate's one float op replays
    bit-for-bit)."""
    from nyc_taxi_data_engineering_spark.operators.sketches import hll_registers

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"), "user_id"
    )
    ud = ev.distinct()
    days = ud.select("d").distinct()
    regs = hll_registers(ud, "d", "user_id")
    offs = F.explode(F.sequence(F.lit(0), F.lit(WAU_WINDOW - 1))).alias("i")
    scat = regs.select("d", "reg", "max_rho", offs).select(
        F.date_add("d", F.col("i")).alias("target_day"), "reg", "max_rho"
    )
    merged = (
        scat.join(days.select(F.col("d").alias("target_day")), "target_day")
        .groupBy("target_day", "reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), greatest({HLL_RHO_BITS} - max_rho, 0))"
    )
    est = merged.groupBy("target_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_registers_used"),
        F.sum(term).cast("bigint").alias("s_observed"),
    )
    exact = (
        ud.select(F.date_add("d", F.col("i")).alias("target_day"), "user_id", offs)
        .select("target_day", "user_id")
        .join(days.select(F.col("d").alias("target_day")), "target_day")
        .groupBy("target_day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau_exact"))
    )
    s_total = (
        F.col("s_observed")
        + (F.lit(HLL_M).cast("long") - F.col("n_registers_used"))
        * F.lit(1 << HLL_RHO_BITS).cast("long")
    ).cast("double")
    est_v = F.round(F.lit(HLL_ALPHA) * F.lit(_HLL_SCALE) / s_total, 3)
    return (
        exact.join(est, "target_day")
        .select(
            F.date_format("target_day", "yyyy-MM-dd").alias("day"),
            "wau_exact",
            est_v.alias("wau_est"),
            F.round(
                F.abs(est_v - F.col("wau_exact")) / F.col("wau_exact"), 6
            ).alias("rel_error"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Bloom filter decontamination gate
# ---------------------------------------------------------------------------

from nyc_taxi_data_engineering_spark.operators.bloom import (  # noqa: E402
    BLOOM_BITS_PER_KEY,
    packed_bloom_build,
    packed_bloom_positions_sql,
    packed_bloom_probe,
)

_BLOOM_SPLIT_SEED = "bloomsplit"
_BLOOM_REF_BUCKET = 0  # bucket 0 of 10 = the held-out reference split


def _bloom_pos_unnest_sql(key_expr: str) -> str:
    return "unnest([" + ", ".join(packed_bloom_positions_sql(key_expr, "m")) + "]) AS pos"


@query(
    "bloom_decontamination_docs",
    oracle=f"""
WITH d AS (
    SELECT doc_id, md5(text) AS fp,
           {SA.hash_bucket_sql('doc_id', seed=_BLOOM_SPLIT_SEED, n_buckets=10)} AS bkt
    FROM documents
),
ref AS (SELECT DISTINCT fp FROM d WHERE bkt = {_BLOOM_REF_BUCKET}),
probe AS (SELECT doc_id, fp FROM d WHERE bkt <> {_BLOOM_REF_BUCKET}),
mm AS (SELECT GREATEST(CAST({BLOOM_BITS_PER_KEY} * COUNT(*) AS BIGINT), 1) AS m FROM ref),
rpos AS (SELECT {_bloom_pos_unnest_sql('fp')} FROM ref, mm),
words AS (
    SELECT pos // 32 AS word_idx,
           bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS w
    FROM rpos GROUP BY pos // 32
),
ppos AS (SELECT fp, {_bloom_pos_unnest_sql('fp')} FROM (SELECT DISTINCT fp FROM probe), mm),
tested AS (
    SELECT p.fp,
           MIN(CASE WHEN (COALESCE(w.w, 0) >> CAST(p.pos % 32 AS INT)) & 1 = 1
                    THEN 1 ELSE 0 END) AS bloom_hit
    FROM ppos p LEFT JOIN words w ON p.pos // 32 = w.word_idx
    GROUP BY p.fp
),
truth AS (
    SELECT pr.doc_id, t.bloom_hit,
           CASE WHEN pr.fp IN (SELECT fp FROM ref) THEN 1 ELSE 0 END AS is_true
    FROM probe pr JOIN tested t ON t.fp = pr.fp
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
       CAST(SUM(bloom_hit) AS BIGINT) AS n_flagged,
       CAST(SUM(is_true) AS BIGINT) AS n_true_dups,
       CAST(SUM(CASE WHEN bloom_hit = 1 AND is_true = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_positives,
       CAST(SUM(CASE WHEN bloom_hit = 0 AND is_true = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_negatives,
       CASE WHEN COUNT(*) - SUM(is_true) > 0
            THEN CAST(SUM(CASE WHEN bloom_hit = 1 AND is_true = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) - SUM(is_true) AS DOUBLE)
            ELSE NULL END AS fp_rate
FROM truth
""",
)
def q_bloom_decontamination_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the broadcastable membership gate
    every 100 TB training pipeline screens with: fingerprint (md5 of
    text) each document, build an m-bit / 4-hash Bloom filter from the
    held-out reference split (bucket 0 of the deterministic hash
    split), packed 32-bits-per-BIGINT-word so the whole filter is
    (m/32) rows — broadcast-sized for tens of millions of reference
    keys — then probe every other doc with k broadcast word lookups and
    ZERO shuffle of the corpus. The exact semi-join truth rides along
    to certify the sketch itself under the hash gate: false negatives
    must be 0 (Bloom's guarantee), and the measured FP rate lands near
    the designed (1-e^(-k·keys/m))^k ≈ 0.24%. m sizes from the OBSERVED
    reference count, so the bound holds at any sf. Both engines derive
    identical md5 bit positions, so every word — and therefore every
    flag — matches bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("fp")
    )
    bkt = SA.hash_bucket(F.col("doc_id"), seed=_BLOOM_SPLIT_SEED, n_buckets=10)
    docs = docs.withColumn("bkt", bkt)
    ref = docs.filter(F.col("bkt") == _BLOOM_REF_BUCKET).select("fp")
    probe = docs.filter(F.col("bkt") != _BLOOM_REF_BUCKET).select("doc_id", "fp")
    words = packed_bloom_build(ref, "fp")
    flagged = packed_bloom_probe(probe, "fp", words)
    truth = flagged.join(
        F.broadcast(ref.distinct().withColumn("is_true", F.lit(1))), "fp", "left"
    ).select("doc_id", "bloom_hit", F.coalesce("is_true", F.lit(0)).alias("is_true"))
    fp_cases = F.sum(
        F.when((F.col("bloom_hit") == 1) & (F.col("is_true") == 0), 1).otherwise(0)
    )
    return truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe"),
        F.sum("bloom_hit").cast("bigint").alias("n_flagged"),
        F.sum("is_true").cast("bigint").alias("n_true_dups"),
        fp_cases.cast("bigint").alias("n_false_positives"),
        F.sum(
            F.when((F.col("bloom_hit") == 0) & (F.col("is_true") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_negatives"),
        # CASE-guarded like every other ratio (ADVICE r9): all-probes-
        # are-true-dups makes the denominator 0, and double 0/0 is an
        # engine divergence (Spark NULL vs DuckDB NaN/inf).
        F.when(
            (F.count(F.lit(1)) - F.sum("is_true")) > 0,
            fp_cases.cast("double")
            / (F.count(F.lit(1)) - F.sum("is_true")).cast("double"),
        ).alias("fp_rate"),
    )
