"""Multimodal-column queries: the documents' UTF-8 bytes stand in as
opaque media payloads (operators/multimodal.py). The payload-hash and
frame-fanout queries have exact oracles — they verify the binary
column plumbing and the mapInPandas 1:N contract numerically; the
feature query is rows-only (numpy inside the UDF, deliberately not
SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table_parallel as load_table
from nyc_taxi_data_engineering_spark.operators import multimodal as M
from nyc_taxi_data_engineering_spark.queries.registry import query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.attach_media(load_table(spark, sf_dir, "documents"))


@query(
    "media_payload_stats",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS payload_sha256,
       'fake/raw' AS format
FROM documents
""",
)
def q_media_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload integrity: byte length + sha256 computed on the
    Spark ``binary`` column must match the oracle hashing the same
    UTF-8 bytes — proves the payload column round-trips exactly."""
    return _media(spark, sf_dir).select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        F.col("meta.format").alias("format"),
    )


@query(
    "media_frame_counts",
    oracle="""
WITH m AS (
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) % 8 + 1 AS n_frames
    FROM documents
)
SELECT doc_id,
       ((n_frames + 1) // 2)::BIGINT AS n_frames_sampled,
       ((n_frames + 1) // 2) * greatest(n_bytes // n_frames, 1) AS total_frame_bytes
FROM m
""",
)
def q_media_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verifies the mapInPandas frame-sampling fan-out numerically:
    per doc, the number of sampled frames (every 2nd of n_frames) and
    their total bytes must equal the oracle's closed-form."""
    frames = M.sample_frames(_media(spark, sf_dir), every=2)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames_sampled"),
        F.sum(F.octet_length("frame_payload")).alias("total_frame_bytes"),
    )


@query(
    "media_features",
    oracle="""
WITH chars AS (
    SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents
),
hist AS (
    SELECT doc_id, ord(substr(text, i, 1)) // 16 AS bin, COUNT(*) AS cnt
    FROM chars GROUP BY doc_id, bin
),
ranked AS (
    SELECT doc_id, bin, cnt, MAX(cnt) OVER (PARTITION BY doc_id) AS max_cnt FROM hist
),
best AS (
    SELECT doc_id, MIN(bin) + 1 AS argmax_bin FROM ranked WHERE cnt = max_cnt GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
       CAST(16 AS INT) AS n_components,
       CAST(COALESCE(b.argmax_bin, 1) AS BIGINT) AS argmax_bin
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id
""",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction. The byte-histogram stub is
    deterministic, so the vector's shape and argmax are EXACTLY
    oracle-checkable: the oracle recomputes the 16-bin histogram of the
    payload bytes in SQL (documents are ASCII, so ord(char) == byte) and
    takes the first max bin — matching array_position's first-match
    semantics on normalized counts (count ties normalize to equal
    floats; distinct counts stay distinct in float32 at any plausible
    doc length)."""
    feats = M.extract_features(_media(spark, sf_dir))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.array_size("features").alias("n_components"),
        F.array_position("features", F.array_max("features")).alias("argmax_bin"),
    )
