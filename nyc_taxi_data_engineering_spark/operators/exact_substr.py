"""Cross-document exact-substring duplication (ExactSubstr dedup).

The suffix-array substring dedup of Lee et al., "Deduplicating Training
Data Makes Language Models Better" (ACL 2022), re-expressed as Spark
relational algebra: a span of >= k characters that appears verbatim in
two or more distinct documents is training-data duplication that
document-level MinHash/SimHash misses (two long docs sharing one
paragraph have low global Jaccard).  Instead of a global suffix array
(which needs a monolithic sort of every suffix), the distributed shape
is:

1. slide a k-char window over every doc (one ``explode`` — linear in
   total characters, the same asymptotics as suffix-array construction);
2. group the k-grams and keep those spanning >= ``min_docs`` distinct
   docs (one hash shuffle with map-side partial aggregation — the
   surviving "duplicated gram" table is tiny relative to the corpus, so
   AQE broadcasts it back);
3. join back and merge RUNS of consecutive duplicated positions per doc
   into maximal spans (the classic gaps-and-islands ``p - row_number``
   trick; the window is partitioned per doc, so its sort is bounded by
   a single document's length, never a global sort).

At 100 TB the only unbounded state is step 2's gram table — grams are
k chars wide (~32 bytes, the same width as an md5 hex key), the
aggregation combines map-side, and a hot gram (boilerplate repeated in
millions of docs) costs one skewed reduce key, not a quadratic join:
positions join the DISTINCT gram, never each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPAN_K = 32  # window width: spans shorter than this are not reported
SPAN_MIN_DOCS = 2  # a gram must appear in >= this many distinct docs


def crossdoc_repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = SPAN_K,
    min_docs: int = SPAN_MIN_DOCS,
) -> DataFrame:
    """Maximal character spans (>= k chars) appearing verbatim in
    >= min_docs distinct documents: one row per (doc, span) with the
    0-based start offset, length, number of k-gram windows merged, and
    the md5 of the span text (the cross-engine-checkable identity of
    the duplicated content)."""
    base = docs.select("doc_id", F.col(text_col).alias("text")).filter(
        F.length("text") >= k
    )
    grams = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.length("text") - k)).alias("p"),
        "text",
    ).select("doc_id", "p", F.expr(f"substring(text, p + 1, {k})").alias("gram"))

    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    hits = grams.join(dup, "gram").select("doc_id", "p")

    w = Window.partitionBy("doc_id").orderBy("p")
    isl = hits.withColumn("grp", F.col("p") - F.row_number().over(w))
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("p").alias("span_start"),
        (F.max("p") - F.min("p") + k).alias("span_len"),
        F.count("*").alias("n_grams"),
    )
    return (
        spans.join(docs.select("doc_id", text_col), "doc_id")
        .select(
            "doc_id",
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_len").cast("int").alias("span_len"),
            "n_grams",
            F.md5(F.expr(f"substring({text_col}, span_start + 1, span_len)")).alias(
                "span_md5"
            ),
        )
    )


def crossdoc_repeated_spans_sql(
    k: int = SPAN_K, min_docs: int = SPAN_MIN_DOCS
) -> str:
    """DuckDB twin: same windows, same island merge, same md5."""
    return f"""
WITH pos AS (
    SELECT doc_id, text, unnest(range(0, length(text) - {k} + 1)) AS p
    FROM documents WHERE length(text) >= {k}
),
g AS (SELECT doc_id, p, substr(text, CAST(p AS INT) + 1, {k}) AS gram FROM pos),
dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= {min_docs}),
hits AS (SELECT g.doc_id, g.p FROM g JOIN dup USING (gram)),
isl AS (
    SELECT doc_id, p,
           p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
    FROM hits
),
spans AS (
    SELECT doc_id, MIN(p) AS s, MAX(p) - MIN(p) + {k} AS span_len, COUNT(*) AS n_grams
    FROM isl GROUP BY doc_id, grp
)
SELECT s.doc_id,
       CAST(s.s AS INT) AS span_start,
       CAST(s.span_len AS INT) AS span_len,
       s.n_grams,
       md5(substr(d.text, CAST(s.s AS INT) + 1, CAST(s.span_len AS INT))) AS span_md5
FROM spans s JOIN documents d USING (doc_id)
"""
