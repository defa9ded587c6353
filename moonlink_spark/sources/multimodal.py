"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing for a 100 TB multimodal training-data pipeline:
binary payload columns with a typed metadata struct, processed by
Arrow-batched ``mapInPandas`` stages (never row-at-a-time Python UDFs).
The actual media decoding (PIL/ffmpeg/torchaudio) is NOT available in this
environment, so the decode kernels are deterministic fakes behind
``DECODERS`` — swap in real ones on a cluster; everything around them
(schemas, batch iteration, partitioning, output contracts) is real and
tested.

Design notes:
- ``mapInPandas`` processes Arrow batches; per-batch vectorization amortizes
  Python overhead and bounds memory by ``spark.sql.execution.arrow
  .maxRecordsPerBatch`` (large blobs => lower this).
- Media tables should be partitioned/bucketed by content-size class so one
  straggler batch of 4K videos doesn't skew a stage of thumbnails.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Any, Callable, Iterator

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
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_image_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode->resize->embed: 8 floats derived
    from the content digest. Replace with a real decoder on a cluster."""
    if payload is None:
        return None
    h = hashlib.sha256(payload).digest()
    return [v / 255.0 for v in h[:8]]


def _fake_audio_decode(payload: bytes) -> list[float]:
    if payload is None:
        return None
    h = hashlib.sha256(b"audio:" + payload).digest()
    return [v / 255.0 for v in h[:8]]


def _fake_video_frame_sample(payload: bytes) -> list[float]:
    # "sample 4 frames" -> 4 digest-derived floats
    if payload is None:
        return None
    h = hashlib.sha256(b"video:" + payload).digest()
    return [struct.unpack(">H", h[i : i + 2])[0] / 65535.0 for i in (0, 2, 4, 6)]


DECODERS: dict[str, Callable[[bytes], Any]] = {
    "image": _fake_image_decode,
    "audio": _fake_audio_decode,
    "video": _fake_video_frame_sample,
}


def real_decoder_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def extract_features(media_df: DataFrame) -> DataFrame:
    """Binary payloads -> feature vectors via Arrow-batched mapInPandas."""
    from moonlink_spark.session import ensure_package_on_workers

    ensure_package_on_workers(media_df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                DECODERS[k](p) if p is not None and k in DECODERS else None
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content_hash": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "n_bytes": [
                        len(p) if p is not None else None for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads derived
    from the id)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "meta": {
                    "mime": f"{kind}/fake",
                    "width": 64 if kind == "image" else None,
                    "height": 64 if kind == "image" else None,
                    "duration_ms": 1000 + i if kind != "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                },
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_dedup_by_content(media_df: DataFrame) -> DataFrame:
    """Exact media dedup on the binary content hash (JVM-side sha2 —
    no Python in the hot path)."""
    return (
        media_df.withColumn("content_hash", F.sha2(F.col("payload"), 256))
        .groupBy("content_hash")
        .agg(F.min("media_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )
