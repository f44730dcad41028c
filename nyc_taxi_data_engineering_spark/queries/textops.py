"""Text-analysis queries over the ``documents`` table (M7 training-data
pipeline extensions): token counting, quality scoring, language ID,
fingerprinting. All native Column expressions — zero Python UDFs.

Oracles are generated from the same constants/regexes as the Spark
expressions (functions/text.py) so both sides share one definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table_parallel as load_table
from nyc_taxi_data_engineering_spark.functions import text as T
from nyc_taxi_data_engineering_spark.queries.registry import query


@query(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       length(text) AS n_chars,
       len({T.sql_tokens('text')}) AS ws_tokens,
       {T.sql_token_count_bpe('text')} AS bpe_tokens,
       round(length(text) * 1.0 / len({T.sql_tokens('text')}), 6) AS chars_per_token
FROM documents
""",
    bench=True,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.col("text")
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(c).alias("n_chars"),
        T.token_count_ws(c).alias("ws_tokens"),
        T.token_count_bpe(c).alias("bpe_tokens"),
        F.round(F.length(c) / T.token_count_ws(c), 6).alias("chars_per_token"),
    )


@query(
    "text_quality_scores",
    oracle=f"""
SELECT doc_id,
       len({T.sql_tokens('text')}) AS n_tokens,
       round(len(list_distinct({T.sql_tokens('text')})) * 1.0 / len({T.sql_tokens('text')}), 6)
           AS type_token_ratio,
       round({T.sql_punct_count('text')} * 1.0 / length(text), 6) AS punct_ratio,
       round({T.sql_stopword_count('text')} * 1.0 / len({T.sql_tokens('text')}), 6)
           AS stopword_ratio,
       {T.sql_quality_score('text')} AS quality_score,
       CASE WHEN {T.sql_quality_score('text')} >= 0.7 THEN 'HIGH'
            WHEN {T.sql_quality_score('text')} >= 0.5 THEN 'MEDIUM'
            ELSE 'LOW' END AS quality_bucket
FROM documents
""",
)
def q_text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.col("text")
    feats = T.quality_features(c)
    score = T.quality_score(c)
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["type_token_ratio"].alias("type_token_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        score.alias("quality_score"),
        T.quality_bucket(score).alias("quality_bucket"),
    )


@query(
    "text_langid_confusion",
    oracle=f"""
SELECT lang AS labeled_lang, {T.sql_lang_id('text')} AS predicted_lang,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang, predicted_lang
""",
)
def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-word language-ID heuristic vs the
    labeled ``lang`` column (heuristic + ground truth in one query)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            T.lang_id(F.col("text")).alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


TOP_TOKENS_K = 50


@query(
    "corpus_top_tokens",
    oracle=f"""
SELECT token,
       COUNT(*) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (
  SELECT doc_id, unnest({T.sql_tokens('text')}) AS token FROM documents
)
WHERE len(token) > 0
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT {TOP_TOKENS_K}
""",
)
def q_corpus_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: top-K tokens by occurrence count with
    document frequency. explode → hash-agg (map-side combine shrinks
    the shuffle to the vocabulary) → orderBy+limit, which Spark plans
    as TakeOrderedAndProject: each task keeps only its local top-K, so
    the driver merges |tasks|×K rows — no global sort, no single-task
    window. Tie-break on token keeps the K-boundary deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(TOP_TOKENS_K)
    )


@query(
    "token_length_histogram",
    oracle=f"""
SELECT len(token) AS token_len,
       COUNT(*) AS n_tokens,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_tokens
FROM (
  SELECT unnest({T.sql_tokens('text')}) AS token FROM documents
)
WHERE len(token) > 0
GROUP BY token_len
""",
)
def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution over the corpus — the standard
    pre-training length-diagnostics histogram. One explode + one
    hash-agg keyed by length (tiny key domain → near-total map-side
    combine; the shuffle carries |lengths| rows per task)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy(F.length("token").alias("token_len"))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct_tokens"),
        )
    )


@query(
    "text_fingerprints",
    oracle=f"""
SELECT doc_id,
       {T.sql_fingerprint('text')} AS fingerprint,
       len({T.sql_word_shingles('text')}) AS n_shingles
FROM documents
""",
    bench=True,
)
def q_text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash doc fingerprint (min-md5 over char 8-shingles) plus
    the word-shingle cardinality used by the dedup family."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", T.tokens(F.col("text")).alias("_toks"))
        .select(
            "doc_id",
            T.fingerprint("text").alias("fingerprint"),
            F.size(T.word_shingles_of(F.col("_toks"))).alias("n_shingles"),
        )
    )
