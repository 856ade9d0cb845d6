"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The image/audio decode libraries are not in this container, so the
*decode kernels* are stubbed (deterministic fakes clearly marked below),
but everything Spark-side is real and tested: the schema contract, the
Arrow-batched ``mapInPandas`` pipelines, batch shaping, and partition
sizing. Swapping a real decoder in means replacing ONE pure-python
function per modality; the distributed plan does not change.

Scale notes: binary payloads ride in parquet binary columns; frames are
processed per Arrow batch (``spark.sql.execution.arrow.maxRecordsPerBatch``
caps batch memory); decode is embarrassingly parallel (no shuffle), so
throughput scales linearly with executors.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _fake_decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """STUB decoder (no image libs in this container).

    Deterministic fake: derives a (width, height, pixels-digest) from the
    payload bytes. Replace with PIL/turbojpeg in a real deployment —
    signature and schema stay identical.
    """
    if payload is None:
        raise NotImplementedError("real image decode requires an image library")
    h = hashlib.sha256(payload).digest()
    w = 64 + h[0] % 64
    ht = 64 + h[1] % 64
    return w, ht, h[:16]


def decode_images(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode image payloads -> width/height/digest via Arrow-batched
    mapInPandas. The plumbing (schema, batching) is production-shaped;
    only the kernel is a stub."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("dec_width", T.IntegerType(), True),
            T.StructField("dec_height", T.IntegerType(), True),
            T.StructField("dec_digest", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode_image(p) for p in pdf[payload_col]]
            pdf = pdf.assign(
                dec_width=[d[0] for d in decoded],
                dec_height=[d[1] for d in decoded],
                dec_digest=[d[2] for d in decoded],
            )
            yield pdf

    return df.mapInPandas(batches, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: records the target dims + a deterministic digest of
    (payload, dims). Real impl: vectorized resize per Arrow batch."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("resized_width", T.IntegerType(), False),
            T.StructField("resized_height", T.IntegerType(), False),
            T.StructField("resized_digest", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests = [
                hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest()[:16]
                for p in pdf["payload"]
            ]
            yield pdf.assign(
                resized_width=width, resized_height=height, resized_digest=digests
            )

    return df.mapInPandas(batches, out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB video frame sampling: emits one row per sampled frame from the
    duration metadata (payload decode stubbed). Real impl decodes I-frames
    per batch. Row-explosion shape (1 video -> N frames) is real."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame_digest", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                dur = (r["meta"]["duration_ms"] if r["meta"] is not None else 0) or 0
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    digest = hashlib.sha256(payload + ts.to_bytes(8, "little")).digest()[:16]
                    rows.append((r["media_id"], i, ts, digest))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_digest"])

    return df.mapInPandas(batches, out_schema)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """STUB feature extractor: deterministic pseudo-embedding from payload
    bytes. Real impl: model inference per Arrow batch (ONNX/torch),
    batch-size-tuned. Output contract (array<float>) matches the
    similarity operators, so the ANN path composes with media."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                h = hashlib.sha256(bytes(p) if p is not None else b"").digest()
                feats.append([((h[i % 32] / 255.0) - 0.5) for i in range(dim)])
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(batches, out_schema)


def make_fake_media(spark, n: int = 20, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table for tests (seeded by row id)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i, 48 + i, 16000, 5000 + 1000 * (i % 3), kind),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
