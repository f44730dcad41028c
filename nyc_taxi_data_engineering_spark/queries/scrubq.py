"""Content-scrubbing queries over the ``documents`` table: the
PII + blocklist curation gate (operators/scrub.py).

The synthetic corpus contains no digits or @-signs, so the PII
detectors correctly report zero — the blocklist terms are drawn from
the corpus vocabulary so the gate exercises nonzero match counts,
redaction length changes, and keep/drop routing. The full PII paths
(emails / phones / IPs / SSNs, redaction output) are exercised on a
constructed fixture in tests/test_scrub.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_data_engineering_spark.catalog import load_table_parallel as load_table
from nyc_taxi_data_engineering_spark.operators import scrub as S
from nyc_taxi_data_engineering_spark.queries.registry import query

# Corpus-vocabulary blocklist (C4-style): any hit drops the document.
BLOCKWORDS = ("dup", "slow")

_PII_COUNT_COLS_SQL = ",\n       ".join(
    f"{S.pattern_count_sql('text', pat)} AS {name}_count" for name, pat in S.PII_PATTERNS.items()
)


@query(
    "scrub_gate_docs",
    oracle=f"""
SELECT doc_id,
       {_PII_COUNT_COLS_SQL},
       {S.blocklist_hits_sql("text", BLOCKWORDS)} AS blocklist_hits,
       CASE WHEN {S.blocklist_hits_sql("text", BLOCKWORDS)} > 0
            THEN 'drop' ELSE 'keep' END AS action,
       length({S.scrub_sql("text")}) AS scrubbed_chars
FROM documents
""",
)
def q_scrub_gate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation-gate audit: PII detector counts, blocklist
    hits, keep/drop action, post-redaction length. One narrow scan —
    every detector is a codegen'd regexp over the text column."""
    docs = load_table(spark, sf_dir, "documents")
    return S.scrub_audit(docs, "text", BLOCKWORDS).select(
        "doc_id",
        *[f"{name}_count" for name in S.PII_PATTERNS],
        "blocklist_hits",
        "action",
        "scrubbed_chars",
    )
