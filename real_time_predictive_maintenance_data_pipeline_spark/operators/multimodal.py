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
    BinaryType,
    DoubleType,
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
    # Null payloads (missing media) are dropped BEFORE the Arrow
    # boundary — bytes(None) would TypeError inside the Python worker
    # and kill the task; the isNotNull check pushes to the scan. Same
    # guard on every mapInPandas operator below (byte_stats_arrow
    # instead keeps its strict 1:1 contract and emits null stats).
    pruned = df.filter(F.col("payload").isNotNull()).select(
        F.col(id_col).alias("doc_id"), "payload"
    )

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


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_stub(df: DataFrame, width: int = 32, height: int = 32, id_col: str = "doc_id") -> DataFrame:
    """STUB image resize over binary payloads (Arrow-batched).

    A real deployment decodes, resizes (PIL/libvips), and re-encodes;
    the container has no codecs, so the stand-in emits a deterministic
    ``width*height``-byte payload derived by striding the source bytes —
    preserving the real operator's shape: binary in → binary out, 1:1
    rows, bounded memory per Arrow batch, prunable input columns.
    """
    pruned = df.filter(F.col("payload").isNotNull()).select(
        F.col(id_col).alias("doc_id"), "payload"
    )
    n_out = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for b in pdf["payload"]:
                src = bytes(b) or b"\x00"
                stride = max(1, len(src) // n_out)
                out.append(src[::stride][:n_out].ljust(n_out, b"\x00"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return pruned.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", IntegerType()),
    ]
)

FRAME_SIZE = 256


def frame_sample(df: DataFrame, every_n: int = 4, id_col: str = "doc_id") -> DataFrame:
    """STUB video frame sampling: treat the payload as consecutive
    ``FRAME_SIZE``-byte frames, keep every ``every_n``-th (0, n, 2n, …).

    The 1→many row shape is the real contract (a decoder emits multiple
    frames per video); deterministic frame accounting keeps it
    oracle-checkable: frame_idx ∈ {0, n, 2n, …} < ceil(bytes/FRAME_SIZE),
    frame_bytes = bytes remaining in that frame (last frame may be
    short).
    """
    pruned = df.filter(F.col("payload").isNotNull()).select(
        F.col(id_col).alias("doc_id"), "payload"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                n_frames = max(1, -(-len(raw) // FRAME_SIZE))
                for i in range(0, n_frames, every_n):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    sizes.append(min(FRAME_SIZE, len(raw) - i * FRAME_SIZE))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": sizes}
            )

    return pruned.mapInPandas(batches, FRAME_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
    ]
)

AUDIO_WINDOW = 64


def audio_window_rms(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Audio-shaped operator: windowed RMS energy over the payload
    interpreted as 8-bit PCM samples (STUB for a torchaudio/ffmpeg
    decode — the container ships no audio codecs; charter: stub the
    codec, keep the Spark plumbing real).

    1→many contract like a real frame/window DSP op: each payload emits
    ceil(n/64) windows of (index, sample count, RMS). numpy does the
    math per Arrow batch — vectorized, bounded memory, no JVM↔Python
    per-row chatter. RMS of integer samples sums exactly in float64,
    so the result is bit-stable and DuckDB-oracle-checkable.
    """
    import numpy as np

    pruned = df.filter(F.col("payload").isNotNull()).select(
        F.col(id_col).alias("doc_id"), "payload"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, counts, rms = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.float64)
                n = len(samples)
                n_win = max(1, -(-n // AUDIO_WINDOW))
                for w in range(n_win):
                    win = samples[w * AUDIO_WINDOW : (w + 1) * AUDIO_WINDOW]
                    ids.append(int(doc_id))
                    idxs.append(w)
                    counts.append(len(win))
                    rms.append(float(np.sqrt(np.sum(win * win) / len(win))) if len(win) else 0.0)
            yield pd.DataFrame(
                {"doc_id": ids, "window_idx": idxs, "n_samples": counts, "rms": rms}
            )

    return pruned.mapInPandas(batches, AUDIO_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("__id", LongType()),
        StructField("__sig", LongType()),
    ]
)


def phash64(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit average-hash perceptual signature per binary payload.

    The aHash construction over the (stubbed) decode: split the payload
    bytes into 64 segments, take each segment's mean intensity, set bit
    *i* iff segment *i* is brighter than the global mean — tolerant to
    small payload perturbations the way aHash is tolerant to resizes.
    With a real codec the same function body runs over decoded pixel
    blocks; the packing/banding contract is unchanged.

    Arrow-batched ``mapInPandas`` (numpy inside the batch, no per-row
    Python); emits the (__id, __sig) shape ``banded_hamming_pairs``
    consumes, so multimodal near-dup mining shares the text SimHash
    join machinery. Only (id, payload) crosses the Arrow boundary.
    """
    import numpy as np

    pruned = df.filter(F.col("payload").isNotNull()).select(
        F.col(id_col).alias("__id"), "payload"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size == 0:
                    sigs.append(0)
                    continue
                # pad to a multiple of 64 so the segment grid is stable
                pad = (-arr.size) % 64
                if pad:
                    arr = np.pad(arr, (0, pad))
                means = arr.reshape(64, -1).mean(axis=1)
                bits = (means > means.mean()).astype(np.uint64)
                sig = np.uint64(0)
                for i, bit in enumerate(bits):
                    sig |= bit << np.uint64(i)
                sigs.append(int(sig.astype(np.int64)))  # two's-complement pack
            yield pd.DataFrame(
                {"__id": pdf["__id"].astype("int64"), "__sig": sigs}
            )

    return pruned.mapInPandas(batches, PHASH_SCHEMA)


def byte_stats_arrow(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-payload byte statistics via ``mapInArrow`` — the
    zero-pandas Python boundary: RecordBatches cross from the JVM as
    Arrow buffers and the byte sums are computed straight off those
    buffers (numpy.frombuffer over each binary cell), never
    materializing a pandas object. This is the API tier below
    mapInPandas for binary-heavy multimodal work: no per-column Series
    boxing, no object-dtype copies of the payload bytes.

    Output: (id, n_bytes, first_byte, byte_sum). Scale: map-only over
    whatever partitioning the payload table already has; batch size
    bounded by spark.sql.execution.arrow.maxRecordsPerBatch."""
    import pyarrow as pa

    def _stats(batches):
        import numpy as np

        for batch in batches:
            ids = batch.column("__id")
            payload = batch.column("payload")
            n_bytes, first, total = [], [], []
            for buf in payload:
                b = buf.as_py()
                if b is None:  # NULL payload cell — emit nulls, not a crash
                    n_bytes.append(None)
                    first.append(None)
                    total.append(None)
                    continue
                n_bytes.append(len(b))
                first.append(b[0] if b else None)
                total.append(
                    int(np.frombuffer(b, dtype=np.uint8).sum()) if b else 0
                )
            yield pa.record_batch(
                [
                    ids,
                    pa.array(n_bytes, pa.int32()),
                    pa.array(first, pa.int32()),
                    pa.array(total, pa.int64()),
                ],
                names=["__id", "n_bytes", "first_byte", "byte_sum"],
            )

    narrow = df.select(F.col(id_col).alias("__id"), "payload")
    out = narrow.mapInArrow(
        _stats, "__id long, n_bytes int, first_byte int, byte_sum long"
    )
    return out.withColumnRenamed("__id", id_col)
