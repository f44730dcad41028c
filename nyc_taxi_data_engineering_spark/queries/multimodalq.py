"""Multimodal-column queries. Two payload models: ``attach_media``
(documents' UTF-8 bytes as opaque payloads — verifies the binary
column plumbing, mapInPandas 1:N fan-out, and feature batch shapes)
and ``attach_ppm_images`` (real binary PPM images built from the same
bytes — verifies ACTUAL decode and nearest-neighbor resize, pure
Python, no codec library). Every query has an exact DuckDB oracle
recomputing the arithmetic from the stored text bytes."""

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
    """Arrow-batched feature extraction. The byte-histogram extractor is
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


def _ppm_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.attach_ppm_images(load_table(spark, sf_dir, "documents"))


@query(
    "media_decoded_stats",
    oracle="""
WITH k AS (SELECT unnest(range(0, 192)) AS k),
px AS (
    SELECT d.doc_id, k.k % 3 AS ch,
           ord(substr(d.text, (k.k % length(d.text)) + 1, 1)) AS b
    FROM documents d CROSS JOIN k
)
SELECT doc_id,
       CAST(8 AS INT) AS width,
       CAST(8 AS INT) AS height,
       SUM(CASE WHEN ch = 0 THEN b END)::BIGINT AS r_sum,
       SUM(CASE WHEN ch = 1 THEN b END)::BIGINT AS g_sum,
       SUM(CASE WHEN ch = 2 THEN b END)::BIGINT AS b_sum
FROM px GROUP BY doc_id
""",
)
def q_media_decoded_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, no codec library: each doc becomes a valid
    8x8 binary PPM (pixel byte k = text byte k mod len), decoded by the
    pure-Python P6 parser inside mapInPandas. Integer per-channel pixel
    sums make the decode exactly oracle-checkable — the oracle
    recomputes every pixel byte from the text in SQL (documents are
    ASCII, so ord(char) == byte). Retires the round-4 decode stub."""
    return M.decoded_image_stats(_ppm_images(spark, sf_dir))


@query(
    "media_thumbnails",
    oracle="""
WITH yxc AS (
    SELECT y.y, x.x, c.c
    FROM (SELECT unnest(range(0, 4)) AS y) y
    CROSS JOIN (SELECT unnest(range(0, 4)) AS x) x
    CROSS JOIN (SELECT unnest(range(0, 3)) AS c) c
),
px AS (
    SELECT d.doc_id, yxc.c AS ch,
           ord(substr(d.text, ((((2 * yxc.y) * 8 + 2 * yxc.x) * 3 + yxc.c) % length(d.text)) + 1, 1)) AS b
    FROM documents d CROSS JOIN yxc
)
SELECT doc_id,
       CAST(59 AS BIGINT) AS thumb_n_bytes,
       CAST(4 AS INT) AS width,
       CAST(4 AS INT) AS height,
       SUM(CASE WHEN ch = 0 THEN b END)::BIGINT AS r_sum,
       SUM(CASE WHEN ch = 1 THEN b END)::BIGINT AS g_sum,
       SUM(CASE WHEN ch = 2 THEN b END)::BIGINT AS b_sum
FROM px GROUP BY doc_id
""",
)
def q_media_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize round trip: 8x8 PPM → nearest-neighbor 4x4 →
    re-encoded PPM → decoded back. Thumbnail pixel (y, x) takes source
    pixel (2y, 2x), so the oracle recomputes each thumbnail byte in
    closed form from the text; thumb_n_bytes pins the re-encoded
    container size (11-byte 'P6\\n4 4\\n255\\n' header + 48 raster
    bytes). Retires the round-4 NotImplementedError resize stub."""
    return M.thumbnail_stats(_ppm_images(spark, sf_dir), width=4, height=4)
