"""Training-data contamination + repetition-quality queries.

Beyond-reference extensions (the reference has no corpus tooling;
SURVEY §2 text rows cover only scalar normalization). These are the
release gates of an LLM data pipeline:

- ``ngram_contamination_docs`` — benchmark-leakage audit: which held-out
  (test-split) documents share 8-gram spans with the train split. The
  GPT-3/PaLM-style n-gram overlap check, expressed as an inverted-index
  equi-join — never an all-pairs document comparison.
- ``doc_repetition_metrics`` — Gopher-style repetition quality signals:
  duplicate-token fraction and top-bigram coverage per document, used to
  drop boilerplate/spam before training.

Both reuse the whitespace tokenizer and hash-split assignment that the
rest of the corpus family uses (``functions/text.py``,
``operators/sampling.py``), so the audit runs over the SAME splits the
sampling queries materialize, and both have exact DuckDB oracles built
from the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.functions import text as T
from nyc_taxi_data_engineering_spark.operators import sampling as S
from nyc_taxi_data_engineering_spark.queries.registry import query
from nyc_taxi_data_engineering_spark.queries.sampling import SPLIT_SEED, SPLITS

CONTAM_N = 8  # n-gram width of the leakage check (GPT-3 used 8..13)
REPEAT_N = 2  # bigram width for the repetition coverage metric


def _doc_tokens(spark: SparkSession, sf_dir: str, min_tokens: int) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= min_tokens)


_SQL_TOKS = T.sql_tokens("text")


@query(
    "ngram_contamination_docs",
    oracle=f"""
WITH eligible AS (
  SELECT doc_id,
         {S.assign_split_sql('doc_id', SPLITS, SPLIT_SEED)} AS split,
         {T.sql_word_ngrams('toks', CONTAM_N)} AS grams
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
  WHERE len(toks) >= {CONTAM_N}
),
test_grams AS (
  SELECT DISTINCT doc_id, unnest(grams) AS gram FROM eligible WHERE split = 'test'
),
train_grams AS (
  SELECT DISTINCT unnest(grams) AS gram FROM eligible WHERE split = 'train'
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS test_grams,
       CAST(COUNT(tr.gram) AS BIGINT) AS hit_grams,
       COUNT(tr.gram) / COUNT(*) AS contamination_rate
FROM test_grams t
LEFT JOIN train_grams tr USING (gram)
GROUP BY t.doc_id
""",
)
def q_ngram_contamination_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-leakage audit: for every test-split document, how many
    of its distinct 8-grams also occur anywhere in the train split.

    Scale shape: explode → distinct per side → equi-join on the gram
    string. The train side dedupes to its vocabulary of 8-grams before
    the join (map-side combine shrinks the shuffle), and the join is a
    hash equi-join keyed on the gram — candidate generation is inverted-
    index style, never test×train all-pairs. At 100 TB the train-gram
    vocabulary is the big side; it partitions uniformly by gram hash, and
    the audit stays one shuffle per side plus one join."""
    docs = _doc_tokens(spark, sf_dir, CONTAM_N)
    split = S.assign_split(docs, "doc_id", SPLITS, SPLIT_SEED)
    grams = split.select(
        "doc_id", "split", F.explode(T.word_ngrams(F.col("toks"), CONTAM_N)).alias("gram")
    )
    test_grams = grams.filter(F.col("split") == "test").select("doc_id", "gram").distinct()
    train_grams = (
        grams.filter(F.col("split") == "train")
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    joined = test_grams.join(train_grams, "gram", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("test_grams"),
        F.count("hit").alias("hit_grams"),
        (F.count("hit") / F.count(F.lit(1))).alias("contamination_rate"),
    )


@query(
    "doc_repetition_metrics",
    oracle=f"""
WITH base AS (
  SELECT doc_id, toks, {T.sql_word_ngrams('toks', REPEAT_N)} AS grams
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
  WHERE len(toks) >= {REPEAT_N}
),
tok AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS total_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS distinct_tokens
  FROM base
),
bigram_counts AS (
  SELECT doc_id, gram, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(grams) AS gram FROM base)
  GROUP BY doc_id, gram
),
bigram_stats AS (
  SELECT doc_id,
         CAST(MAX(c) AS BIGINT) AS top_bigram_count,
         CAST(SUM(c) AS BIGINT) AS total_bigrams
  FROM bigram_counts
  GROUP BY doc_id
)
SELECT t.doc_id,
       total_tokens,
       distinct_tokens,
       (total_tokens - distinct_tokens) / total_tokens AS dup_token_frac,
       top_bigram_count,
       total_bigrams,
       top_bigram_count / total_bigrams AS top_bigram_frac
FROM tok t
JOIN bigram_stats USING (doc_id)
""",
)
def q_doc_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality metrics per document:
    duplicate-token fraction (1 - type/token ratio) and top-bigram
    coverage (what fraction of the doc the single most frequent bigram
    occupies). High values flag boilerplate, spam, and degenerate text.

    Scale shape: the token-level metrics are pure array expressions
    (shuffle-free, whole-stage codegen); the bigram mode needs one
    explode + two-level hash agg keyed by (doc_id, gram) then doc_id —
    both partial-aggregated map-side. The final join is doc_id-keyed
    between two already-aggregated sides. Ratios divide exact BIGINT
    counts, so Spark and the oracle produce bit-identical doubles."""
    base = _doc_tokens(spark, sf_dir, REPEAT_N)
    tok = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("total_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("distinct_tokens"),
    )
    bigram_counts = (
        base.select("doc_id", F.explode(T.word_ngrams(F.col("toks"), REPEAT_N)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bigram_stats = bigram_counts.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_count"),
        F.sum("c").alias("total_bigrams"),
    )
    return (
        tok.join(bigram_stats, "doc_id")
        .select(
            "doc_id",
            "total_tokens",
            "distinct_tokens",
            ((F.col("total_tokens") - F.col("distinct_tokens")) / F.col("total_tokens")).alias(
                "dup_token_frac"
            ),
            "top_bigram_count",
            "total_bigrams",
            (F.col("top_bigram_count") / F.col("total_bigrams")).alias("top_bigram_frac"),
        )
    )


FUZZY_MIN_MATCHES = 8  # >= 8/16 signature agreement (est Jaccard 0.5)

# MinHash signature / band SQL fragments shared with queries/dedup.py
from nyc_taxi_data_engineering_spark.queries.dedup import (  # noqa: E402
    _band_selects,
    _H as _MH,
    _SIG_COLS,
)


@query(
    "fuzzy_contamination_docs",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         {S.assign_split_sql('doc_id', SPLITS, SPLIT_SEED)} AS split,
         {_SIG_COLS}
  FROM documents
),
sig AS (SELECT * FROM base),
bands AS (
    {_band_selects('sig')}
),
hits AS (
    SELECT DISTINCT tb.doc_id AS test_id, rb.doc_id AS train_id
    FROM bands tb
    JOIN sig ts ON ts.doc_id = tb.doc_id AND ts.split = 'test'
    JOIN bands rb ON rb.band = tb.band AND rb.bucket = tb.bucket
    JOIN sig rs ON rs.doc_id = rb.doc_id AND rs.split = 'train'
),
scored AS (
    SELECT h.test_id, h.train_id,
           ({' + '.join(f'(CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END)' for i in range(_MH))}) AS matches
    FROM hits h
    JOIN sig sa ON sa.doc_id = h.test_id
    JOIN sig sb ON sb.doc_id = h.train_id
),
kept AS (SELECT * FROM scored WHERE matches >= {FUZZY_MIN_MATCHES}),
ranked AS (
    SELECT test_id, train_id, matches,
           row_number() OVER (PARTITION BY test_id ORDER BY matches DESC, train_id) AS rn,
           COUNT(*) OVER (PARTITION BY test_id) AS n_train_matches
    FROM kept
)
SELECT test_id AS doc_id,
       CAST(n_train_matches AS BIGINT) AS n_train_matches,
       train_id AS best_train_doc,
       matches / {float(_MH)} AS est_similarity
FROM ranked WHERE rn = 1
""",
)
def q_fuzzy_contamination_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUP benchmark leakage — the paraphrase-robust companion to
    the exact 8-gram audit: test-split documents whose MinHash LSH
    band keys collide with any train-split document, scored by
    signature agreement and kept at >= 0.5 estimated Jaccard. Exact
    n-gram overlap misses lightly edited test-set copies (the common
    contamination mode in crawled corpora); band collision catches
    them at the same sub-quadratic cost as the dedup path: split
    assignment is the hash the sampling family already uses, the
    test×train join is the keyed band-bucket equi-join, and the
    per-test-doc argmax folds into a max(struct) HASH AGG on the Spark
    side (the oracle's window runs over the tiny candidate set).
    Output: one row per contaminated test doc — match count, worst
    (highest-similarity, lowest-id) train doc, estimated similarity."""
    from nyc_taxi_data_engineering_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    split = S.assign_split(docs.select("doc_id", "text"), "doc_id", SPLITS, SPLIT_SEED)
    sigs = D.minhash_signatures(docs).join(
        split.select("doc_id", "split"), "doc_id"
    )
    bands = D.lsh_band_keys(sigs)
    sp = sigs.select("doc_id", "split")
    tb = bands.join(sp.filter(F.col("split") == "test"), "doc_id").select(
        F.col("doc_id").alias("test_id"), "band", "bucket"
    )
    rb = bands.join(sp.filter(F.col("split") == "train"), "doc_id").select(
        F.col("doc_id").alias("train_id"), "band", "bucket"
    )
    hits = tb.join(rb, ["band", "bucket"]).select("test_id", "train_id").distinct()
    n = D.MINHASH_HASHES
    sa = sigs.select(
        F.col("doc_id").alias("test_id"), *[F.col(f"s{i}").alias(f"a{i}") for i in range(n)]
    )
    sb = sigs.select(
        F.col("doc_id").alias("train_id"), *[F.col(f"s{i}").alias(f"b{i}") for i in range(n)]
    )
    matches = None
    for i in range(n):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        matches = term if matches is None else matches + term
    scored = (
        hits.join(sa, "test_id")
        .join(sb, "train_id")
        .select("test_id", "train_id", matches.alias("matches"))
        .filter(F.col("matches") >= FUZZY_MIN_MATCHES)
    )
    return (
        scored.groupBy("test_id")
        .agg(
            F.count(F.lit(1)).alias("n_train_matches"),
            F.max(F.struct(F.col("matches"), (-F.col("train_id")).alias("neg"))).alias("best"),
        )
        .select(
            F.col("test_id").alias("doc_id"),
            "n_train_matches",
            (-F.col("best.neg")).alias("best_train_doc"),
            (F.col("best.matches") / F.lit(float(n))).alias("est_similarity"),
        )
    )
