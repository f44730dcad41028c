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
           CAST(CAST(SUM(CAST(c AS DECIMAL(18,9))) AS STRING) AS DOUBLE) AS score
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


# ---------------------------------------------------------------------------
# Hybrid retrieval: lexical BM25 + dense cosine, fused by Reciprocal
# Rank Fusion (Cormack et al. 2009: score = sum over arms of
# 1/(K + rank), K = 60). The RAG-stack shape: two independent top-20
# retrievals per query, one tiny full-outer fusion join, fused top-10.
# Each keyword query is paired with a pinned anchor embedding
# (vec_id 0/1/2 — doc_id and vec_id share the 0..n id space), so both
# arms rank the SAME item space and the fusion is meaningful.
# ---------------------------------------------------------------------------

ARM_K = 20  # per-arm retrieval depth
RRF_C = 60  # the standard RRF constant
FUSED_K = 10
_ANCHORS = [("q1", 0), ("q2", 1), ("q3", 2)]

_ANCHOR_SQL = " UNION ALL ".join(
    f"SELECT '{qid}' AS query_id, {vid} AS vec_id" for qid, vid in _ANCHORS
)


@query(
    "hybrid_rrf_search",
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
lex_score AS (
    SELECT query_id, doc_id,
           CAST(CAST(SUM(CAST(c AS DECIMAL(18,9))) AS STRING) AS DOUBLE) AS score
    FROM contrib GROUP BY query_id, doc_id
),
lex AS (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS lex_rank
    FROM lex_score
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
-- zero-norm vectors excluded, twin of similarity._corpus's contract
n AS (SELECT * FROM (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e) WHERE nrm > 0),
anchors AS ({_ANCHOR_SQL}),
qv AS (
    SELECT a.query_id, n.v, n.nrm, n.vec_id AS anchor_id
    FROM anchors a JOIN n ON n.vec_id = a.vec_id
),
ds AS (
    SELECT q.query_id, c.vec_id AS doc_id,
           list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
             / (q.nrm * c.nrm) AS cos
    FROM qv q JOIN n c ON c.vec_id <> q.anchor_id
),
dense AS (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS dense_rank
    FROM ds
),
fused AS (
    SELECT COALESCE(l.query_id, d.query_id) AS query_id,
           COALESCE(l.doc_id, d.doc_id) AS doc_id,
           l.lex_rank, d.dense_rank,
           (CASE WHEN l.lex_rank IS NULL THEN 0.0 ELSE 1.0 / ({RRF_C} + l.lex_rank) END
            + CASE WHEN d.dense_rank IS NULL THEN 0.0 ELSE 1.0 / ({RRF_C} + d.dense_rank) END
           ) AS rrf_score
    FROM (SELECT * FROM lex WHERE lex_rank <= {ARM_K}) l
    FULL OUTER JOIN (SELECT * FROM dense WHERE dense_rank <= {ARM_K}) d
      ON l.query_id = d.query_id AND l.doc_id = d.doc_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rrf_rank
    FROM fused
)
SELECT query_id, doc_id, lex_rank::INT AS lex_rank, dense_rank::INT AS dense_rank,
       rrf_score, rrf_rank::INT AS rrf_rank
FROM ranked WHERE rrf_rank <= {FUSED_K}
ORDER BY query_id, rrf_rank
""",
)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid top-10: BM25 top-20 ∪ dense-cosine top-20 per query,
    RRF-fused (1/(60+rank) per arm, missing arm contributes 0).

    100 TB: each arm keeps its own scale shape — the lexical arm is
    the inverted-index keyed join (only queried terms shuffle), the
    dense arm broadcasts the 3 anchor vectors over one corpus scan —
    and the fusion join only ever sees ARM_K rows per (query, arm),
    so fusing is free at any corpus size. Cross-engine exactness:
    BM25 scores ride the decimal sum, cosines ride the pinned
    sequential fold (queries/similarity.dot), and the RRF score is a
    two-term sum of exact rationals in pinned order.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nyc_taxi_data_engineering_spark.queries.similarity import _corpus, dot

    docs = load_table(spark, sf_dir, "documents")
    lex = (
        bm25_topk(docs, SEARCH_QUERIES, k=ARM_K)
        .select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
    )

    corpus = _corpus(spark, sf_dir)
    anchors = spark.createDataFrame(_ANCHORS, "query_id string, vec_id bigint")
    qv = corpus.join(F.broadcast(anchors), "vec_id").select(
        "query_id",
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("vec_id").alias("anchor_id"),
    )
    ds = corpus.join(F.broadcast(qv), F.col("vec_id") != F.col("anchor_id")).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
    )
    w_dense = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    dense = (
        ds.withColumn("dense_rank", F.row_number().over(w_dense))
        .filter(F.col("dense_rank") <= ARM_K)
        .select("query_id", "doc_id", "dense_rank")
    )

    arm = lambda r: F.when(r.isNull(), F.lit(0.0)).otherwise(  # noqa: E731
        F.lit(1.0) / (F.lit(RRF_C) + r)
    )
    fused = lex.join(dense, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_score", arm(F.col("lex_rank")) + arm(F.col("dense_rank"))
    )
    w_rrf = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rrf_rank", F.row_number().over(w_rrf))
        .filter(F.col("rrf_rank") <= FUSED_K)
        .select(
            "query_id",
            "doc_id",
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("dense_rank").cast("int").alias("dense_rank"),
            "rrf_score",
            F.col("rrf_rank").cast("int").alias("rrf_rank"),
        )
        .orderBy("query_id", "rrf_rank")
    )


# ---------------------------------------------------------------------------
# Positional phrase search: exact-adjacency matching over a positional
# inverted index — the IR primitive BM25's bag-of-words scoring can't
# express ("value table part" as a phrase, not three terms anywhere).
# ---------------------------------------------------------------------------

PHRASES = [
    ("p1", "value table part"),
    ("p2", "fast table value"),
]


def _phrase_sql(qid: str, text: str) -> str:
    terms = text.split()
    joins = "\n      ".join(
        f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i} "
        f"AND t{i}.term = '{t}'"
        for i, t in enumerate(terms[1:], start=1)
    )
    return f"""
    SELECT '{qid}' AS phrase_id, t0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM toks t0
      {joins}
    WHERE t0.term = '{terms[0]}'
    GROUP BY t0.doc_id"""


@query(
    "phrase_search_docs",
    oracle=f"""
WITH base AS (
    SELECT doc_id, {sql_tokens('text')} AS toklist FROM documents
),
toks AS (
    SELECT doc_id, g.i AS pos, toklist[g.i] AS term
    FROM base, UNNEST(generate_series(1, len(toklist))) AS g(i)
)
{" UNION ALL ".join(_phrase_sql(qid, text) for qid, text in PHRASES)}
ORDER BY phrase_id, doc_id
""",
)
def q_phrase_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional inverted index: posexplode
    the corpus once into (doc_id, pos, term) postings, then match each
    n-word phrase by filtering the FIRST term's postings (tiny after
    predicate pushdown on the term) and equi-joining the remaining
    terms on (doc_id, pos + offset) — adjacency as join keys, the
    classic positional-index plan. Per-doc match counts; docs with no
    occurrence drop out via the inner joins.

    Scale: postings build is one narrow projection pass; each phrase
    costs (n_terms - 1) keyed equi-joins whose inputs are ONLY that
    term's postings — df(term) rows, not the corpus — and the term
    filters reach the scan. No windows, no collect."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "term"),
    )
    out = None
    for qid, text in PHRASES:
        terms = text.split()
        cur = toks.filter(F.col("term") == terms[0]).select(
            "doc_id", F.col("pos").alias("p0")
        )
        for i, t in enumerate(terms[1:], start=1):
            ti = toks.filter(F.col("term") == t).select(
                F.col("doc_id").alias(f"d{i}"), F.col("pos").alias(f"p{i}")
            )
            cur = cur.join(
                ti,
                (F.col("doc_id") == F.col(f"d{i}"))
                & (F.col(f"p{i}") == F.col("p0") + i),
            ).drop(f"d{i}", f"p{i}")
        g = cur.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matches")
        )
        g = g.select(F.lit(qid).alias("phrase_id"), "doc_id", "n_matches")
        out = g if out is None else out.unionByName(g)
    return out.orderBy("phrase_id", "doc_id")


PROX_TERMS = ("vector", "merge")
PROX_SLOP = 4


@query(
    "proximity_search_docs",
    oracle=f"""
WITH base AS (
    SELECT doc_id, {sql_tokens('text')} AS toklist FROM documents
),
toks AS (
    SELECT doc_id, g.i AS pos, toklist[g.i] AS term
    FROM base, UNNEST(generate_series(1, len(toklist))) AS g(i)
),
a AS (SELECT doc_id, pos FROM toks WHERE term = '{PROX_TERMS[0]}'),
b AS (SELECT doc_id, pos FROM toks WHERE term = '{PROX_TERMS[1]}')
SELECT a.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(abs(a.pos - b.pos)) AS BIGINT) AS min_span
FROM a JOIN b ON b.doc_id = a.doc_id
WHERE abs(a.pos - b.pos) <= {PROX_SLOP}
GROUP BY a.doc_id
ORDER BY a.doc_id
""",
)
def q_proximity_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity (slop) search — '{PROX_TERMS[0]}' within
    {PROX_SLOP} positions of '{PROX_TERMS[1]}', any order: the IR
    operator between bag-of-words BM25 and exact phrase match.
    Each term's postings are filtered at the scan (df(term)-sized),
    the candidate join is KEYED on doc_id, and the slop is a post-join
    band filter — never an inequality join over the corpus. Per-doc
    qualifying pair count and tightest span."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "term"),
    )
    a = toks.filter(F.col("term") == PROX_TERMS[0]).select("doc_id", F.col("pos").alias("pa"))
    b = toks.filter(F.col("term") == PROX_TERMS[1]).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb")
    )
    span = F.abs(F.col("pa") - F.col("pb"))
    return (
        a.join(b, F.col("doc_id") == F.col("doc_b"))
        .filter(span <= PROX_SLOP)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min(span).cast("bigint").alias("min_span"),
        )
        .orderBy("doc_id")
    )
