"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (per the 100 TB charter): image/audio/video payloads travel as
``BinaryType`` columns next to a metadata struct (modality, mime,
n_bytes). Decode / feature-extract runs as Arrow-batched
``mapInPandas`` so each task streams record batches without
materializing a partition in Python memory.

The container has no image/audio codecs, so the actual decode is a
clearly-marked deterministic fake (`_fake_decode`); the Spark-side
plumbing — schema, batch iteration, column pruning, partition
parallelism — is real and tested. Swap ``_fake_decode`` for a PIL /
torchaudio call in a real deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("checksum", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + metadata struct."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def _fake_decode(buf: bytes) -> tuple[int, int, int]:
    """STUB decoder — deterministic stand-in for an image decode.

    Returns (checksum, width, height) derived only from the bytes.
    Replace with a real codec (PIL/libvips/ffmpeg) in deployment; the
    container ships no media libraries (charter: stub the decode, keep
    the Spark plumbing real).
    """
    checksum = 0
    for by in buf[:64]:
        checksum = (checksum * 131 + by) % 1_000_000_007
    width = 16 + (len(buf) % 64)
    height = 16 + (checksum % 64)
    return checksum, width, height


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the operator streaming: each task consumes an
    iterator of record batches (bounded memory per batch), emits one
    feature row per payload. Column pruning upstream ensures only
    (id, payload) bytes cross the JVM→Python Arrow boundary.
    """
    pruned = df.select(F.col(id_col).alias("doc_id"), "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_decode(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(bytes(b)) for b in pdf["payload"]],
                    "checksum": [f[0] for f in feats],
                    "fake_width": [f[1] for f in feats],
                    "fake_height": [f[2] for f in feats],
                }
            )

    return pruned.mapInPandas(batches, FEATURE_SCHEMA)
