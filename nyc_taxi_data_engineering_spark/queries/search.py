"""Keyword-search queries: BM25 top-k over ``documents``
(operators/search.py) — lexical retrieval beside the ANN family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_data_engineering_spark.catalog import load_table_parallel as load_table
from nyc_taxi_data_engineering_spark.functions.text import sql_tokens
from nyc_taxi_data_engineering_spark.operators.search import BM25_B, BM25_K1, bm25_topk
from nyc_taxi_data_engineering_spark.queries.registry import query

SEARCH_QUERIES = [
    ("q1", "spark window agg"),
    ("q2", "customer join stream"),
    ("q3", "vector hash merge"),
]
TOP_K = 5

_QT = "\n    UNION ALL ".join(
    f"SELECT '{qid}' AS query_id, unnest([{', '.join(repr(t) for t in sorted(set(text.split())))}]) AS term"
    for qid, text in SEARCH_QUERIES
)

# Literal-for-literal twin of operators/search.bm25_topk's contribution:
# same association order so doubles match bit-for-bit.
_CONTRIB = (
    f"ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))"
    f" * (tf.tf * {BM25_K1 + 1}) /"
    f" (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / (s.sum_dl * 1.0 / s.n_docs)))"
)


@query(
    "bm25_search_topk",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
qt AS (
    {_QT}
),
contrib AS (
    SELECT qt.query_id, tf.doc_id, {_CONTRIB} AS c
    FROM qt
    JOIN tf USING (term)
    JOIN dfreq d USING (term)
    JOIN dl USING (doc_id), stats s
),
score AS (
    SELECT query_id, doc_id,
           CAST(SUM(CAST(c AS DECIMAL(18,9))) AS DOUBLE) AS score
    FROM contrib GROUP BY query_id, doc_id
),
r AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
    FROM score
)
SELECT query_id, doc_id, rank::INT AS rank, score FROM r WHERE rank <= {TOP_K}
""",
)
def q_bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 for three fixed keyword queries — inverted-index
    keyed joins only; scores summed in exact decimal for engine parity."""
    return bm25_topk(load_table(spark, sf_dir, "documents"), SEARCH_QUERIES, k=TOP_K)
