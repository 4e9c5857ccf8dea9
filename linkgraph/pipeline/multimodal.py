"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched mapInPandas.

The decode step is STUBBED (this container has no image/audio libs):
`decode_media` raises NotImplementedError for real codecs and supplies
a deterministic fake for the 'raw' kind, so the Spark-side plumbing —
schema, batch shape, partitioning, UDF signature — is real and tested
while the codec is swappable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # raw | image/png | audio/wav | video/mp4
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def fake_media_table(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows (kind='raw', binary payload)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8)
        rows.append((i, "raw", payload.tobytes(), 32, 32, 16000))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(kind: str, payload: bytes) -> np.ndarray:
    """Codec boundary. Real codecs are NOT available in this sandbox —
    clearly-marked stub per the build contract."""
    if kind == "raw":
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(
        f"decode for kind={kind!r} requires imaging/audio libraries "
        "not present in this environment; plug a codec in here"
    )


def extract_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Vectorized feature extraction: per media row, decode (stub) and
    emit an L1-normalized byte histogram. Arrow-batched mapInPandas —
    partition-parallel, no driver involvement, no per-row Python UDF."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                arr = decode_media(kind, bytes(payload))
                hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
                total = hist.sum()
                feats.append(
                    (hist / total if total else hist).astype(np.float32).tolist()
                )
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    descriptors (media_id, frame_idx) without decoding — the decode
    itself is the stubbed codec boundary. Demonstrates the explode-
    then-mapInPandas shape a real pipeline uses."""
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(every_n - 1))).alias("frame_idx"),
    )
