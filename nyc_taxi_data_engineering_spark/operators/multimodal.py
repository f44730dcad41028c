"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``) — the training-data-pipeline extension for
media corpora (BASELINE north star).

What's REAL here (and tested): the column model (payload + metadata
struct), the mapInPandas UDF signatures and batch shapes, the
one-row-to-many frame-sampling contract, deterministic feature
extraction over raw bytes, and the partitioning story. What's STUBBED:
actual codec work — this container has no image/audio libraries, so
``decode_image`` degrades to a clearly-marked deterministic fake
(byte-histogram "pixels") unless PIL is importable, and ``resize`` \
raises ``NotImplementedError`` without it. Swapping the stub for a real
decoder changes ONE function body, none of the Spark plumbing.

Scale notes: payloads stay opaque bytes end-to-end in the JVM until a
mapInPandas stage needs them — no base64 round-trips, no
collect-to-driver. mapInPandas streams Arrow record batches, so peak
executor memory is one batch of payloads, tunable via
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it small for
media: 10 MB payloads x 10k default batch rows would OOM any
executor). Feature extraction is embarrassingly parallel; keep
payload tables partitioned by content-hash prefix so media joins
co-locate without skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder path, absent in this container
    from PIL import Image  # type: ignore  # noqa: F401

    HAS_PIL = True
except Exception:  # pragma: no cover - environment dependent
    HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_BINS = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def attach_media(docs: DataFrame, text_col: str = "text", fmt: str = "fake/raw") -> DataFrame:
    """Deterministic fake media table: the document's UTF-8 bytes act
    as the opaque payload (stands in for image/audio bytes), with the
    typed metadata struct a real media table would carry. Native
    expressions only — the payload never leaves the JVM here."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.octet_length(payload) % 8 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _byte_histogram(buf: bytes, bins: int = FEATURE_BINS) -> np.ndarray:
    """STUB feature extractor (deterministic fake): normalized
    histogram of the payload's bytes. A real pipeline would decode and
    embed here; the Spark-side contract is identical."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(bins, dtype=np.float32)
    hist = np.bincount(arr >> int(8 - np.log2(bins)), minlength=bins).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, one output row
    per input row, payload → float feature vector."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(_byte_histogram),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """mapInPandas frame sampling: one input row fans out to
    ceil(n_frames / every) frame rows (the 1:N contract a video
    pipeline needs). Frames here are deterministic byte slices of the
    payload — the stub for real frame extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_payloads = [], [], []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                n_frames = int(meta["n_frames"])
                size = max(len(payload) // max(n_frames, 1), 1)
                for frame_no in range(0, n_frames, every):
                    out_ids.append(doc_id)
                    out_nos.append(frame_no)
                    out_payloads.append(bytes(payload[frame_no * size : (frame_no + 1) * size]))
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_no": out_nos, "frame_payload": out_payloads}
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array. Real decode
    needs PIL (absent here); the fallback is a clearly-marked
    deterministic fake derived from the byte histogram so downstream
    shapes stay exercised."""
    if HAS_PIL:  # pragma: no cover - environment dependent
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    hist = (_byte_histogram(payload) * 255).astype(np.uint8)
    return np.tile(hist.reshape(4, 4, 1), (16, 16, 3))


def resize(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize — requires a codec library.

    STUB: raises until PIL (or equivalent) is installed; kept so the
    API surface documents the intended contract."""
    if HAS_PIL:  # pragma: no cover - environment dependent
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).resize((width, height))
        out = io.BytesIO()
        img.save(out, format=img.format or "PNG")
        return out.getvalue()
    raise NotImplementedError("image resize requires PIL; not available in this environment")
