"""PII scrubbing on a constructed fixture (the synthetic corpus has no
digits/emails, so the driver query only proves the zero case): detector
counts, redaction output, blocklist gating — Spark vs hand-computed
expectations AND the DuckDB oracle twins on the same rows."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.operators import scrub as S

ROWS = [
    (1, "contact me at alice@example.com or bob.smith+x@mail.co today"),
    (2, "call 555-867-5309 or 555.867.5309; ssn 123-45-6789 on file"),
    (3, "server at 10.0.0.1 and 192.168.254.254 are up"),
    (4, "nothing sensitive here, just words"),
    (5, "badword here: dup dup slow, and a duplicate (no boundary hit)"),
]
EXPECTED = {
    # doc_id: (email, phone, ipv4, ssn, blocklist_hits)
    1: (2, 0, 0, 0, 0),
    2: (0, 2, 0, 1, 0),
    3: (0, 0, 2, 0, 0),
    4: (0, 0, 0, 0, 0),
    5: (0, 0, 0, 0, 3),
}
BLOCKWORDS = ("dup", "slow")


@pytest.fixture(scope="module")
def audited(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    return {
        r["doc_id"]: r
        for r in S.scrub_audit(df, "text", BLOCKWORDS).collect()
    }


def test_detector_counts(audited):
    for doc_id, (email, phone, ipv4, ssn, hits) in EXPECTED.items():
        r = audited[doc_id]
        got = (r["email_count"], r["phone_count"], r["ipv4_count"], r["ssn_count"], r["blocklist_hits"])
        assert got == (email, phone, ipv4, ssn, hits), doc_id


def test_keep_drop_action(audited):
    assert {d: r["action"] for d, r in audited.items()} == {
        1: "keep", 2: "keep", 3: "keep", 4: "keep", 5: "drop",
    }


def test_redaction_output(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    red = {
        r["doc_id"]: r["red"]
        for r in df.select("doc_id", S.scrub(F.col("text")).alias("red")).collect()
    }
    assert red[1] == "contact me at [PII] or [PII] today"
    assert red[2] == "call [PII] or [PII]; ssn [PII] on file"
    assert red[3] == "server at [PII] and [PII] are up"
    assert red[4] == ROWS[3][1]  # untouched


def test_oracle_twins_match_spark(spark):
    """The DuckDB SQL generators must reproduce the Spark results
    row-for-row on the fixture (the corpus-level query only covers the
    zero-match case for PII)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", ROWS)
    count_cols = ", ".join(
        f"{S.pattern_count_sql('text', pat)} AS {name}_count"
        for name, pat in S.PII_PATTERNS.items()
    )
    duck_rows = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT doc_id, {count_cols}, "
            f"{S.blocklist_hits_sql('text', BLOCKWORDS)} AS hits, "
            f"{S.scrub_sql('text')} AS red FROM docs"
        ).fetchall()
    }
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    spark_rows = {
        r["doc_id"]: (
            r["email_count"], r["phone_count"], r["ipv4_count"], r["ssn_count"],
            r["blocklist_hits"], r["red"],
        )
        for r in S.scrub_audit(df, "text", BLOCKWORDS)
        .withColumn("red", S.scrub(F.col("text")))
        .collect()
    }
    assert {k: tuple(v) for k, v in duck_rows.items()} == spark_rows
