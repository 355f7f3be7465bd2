"""Multimodal plumbing tests: the decode step is a stub (no codecs in
the container — SURVEY §2.4), but schema, Arrow batch shape, 1:1 and
1:many row contracts, and determinism are real and asserted here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.operators import (
    multimodal as M,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    return M.attach_binary_payload(docs).cache()


def test_payload_schema(media):
    dt = dict(media.dtypes)
    assert dt["payload"] == "binary"
    assert dt["media_meta"].startswith("struct<modality:string")
    row = media.select(
        (F.col("media_meta.n_bytes") == F.length("payload")).alias("ok")
    ).agg(F.min("ok")).first()
    assert row[0] is True


def test_extract_features_one_to_one(media):
    out = M.extract_features(media)
    assert out.columns == ["doc_id", "n_bytes", "checksum", "fake_width", "fake_height"]
    assert out.count() == media.count()
    # deterministic across runs
    a = {r.doc_id: r.checksum for r in out.collect()}
    b = {r.doc_id: r.checksum for r in M.extract_features(media).collect()}
    assert a == b


def test_resize_fixed_output_size(media):
    out = M.resize_stub(media, width=32, height=32)
    assert out.count() == media.count()
    row = out.agg(
        F.min(F.length("payload")).alias("lo"), F.max(F.length("payload")).alias("hi")
    ).first()
    assert row.lo == row.hi == 32 * 32


def test_frame_sample_accounting(spark, media):
    """Python-side truth: frame_idx stride 4, count = ceil(n/256)
    sampled every 4, last frame may be short."""
    out = M.frame_sample(media, every_n=4)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.frame_bytes))
    sizes = {r.doc_id: r.n for r in media.select("doc_id", F.length("payload").alias("n")).collect()}
    assert set(by_doc) == set(sizes)
    for doc_id, frames in by_doc.items():
        n = sizes[doc_id]
        n_frames = max(1, -(-n // 256))
        expect_idx = list(range(0, n_frames, 4))
        got = sorted(frames)
        assert [i for i, _ in got] == expect_idx
        for i, fb in got:
            assert fb == min(256, n - i * 256)


def test_phash_neardup_matches_bruteforce(spark):
    """banded_hamming_pairs over phash64 signatures must equal the
    brute-force Hamming-pair set exactly (pigeonhole recall is 1.0 at
    max_hamming <= 3, and verification is exact)."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators.dedup import (
        banded_hamming_pairs,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        phash64,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    sigs = phash64(attach_binary_payload(docs))
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in banded_hamming_pairs(sigs, max_hamming=3).collect()
    }
    rows = sigs.collect()
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            h = bin((a["__sig"] ^ b["__sig"]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if h <= 3:
                lo, hi = sorted((a["__id"], b["__id"]))
                want.add((lo, hi, h))
    assert got == want and len(want) > 0


def test_byte_stats_arrow_matches_jvm(spark):
    """mapInArrow byte stats must equal the JVM-side computation
    (length/ascii) plus an exact Python byte-sum recompute."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.operators import (
        multimodal as M,
    )

    d = M.attach_binary_payload(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    got = {r.doc_id: r for r in M.byte_stats_arrow(d).collect()}
    jvm = {
        r.doc_id: r
        for r in d.select(
            "doc_id",
            F.length("payload").alias("n_bytes"),
            F.ascii("text").alias("first_byte"),
            "text",
        ).collect()
    }
    assert got.keys() == jvm.keys()
    for k, j in jvm.items():
        g = got[k]
        assert g.n_bytes == j.n_bytes
        assert g.first_byte == j.first_byte
        assert g.byte_sum == sum(j.text.encode("utf-8"))


def test_byte_stats_arrow_null_and_empty_payloads(spark):
    """NULL payload cells must yield null stats (not a worker crash —
    the r4-advice gap: `buf.as_py()` returns None and `len(None)`
    raised inside mapInArrow); empty bytes yield (0, null, 0)."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators import (
        multimodal as M,
    )

    d = spark.createDataFrame(
        [(1, b"ab"), (2, None), (3, b"")],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in M.byte_stats_arrow(d).collect()}
    assert (got[1].n_bytes, got[1].first_byte, got[1].byte_sum) == (2, 97, 195)
    assert (got[2].n_bytes, got[2].first_byte, got[2].byte_sum) == (
        None,
        None,
        None,
    )
    assert (got[3].n_bytes, got[3].first_byte, got[3].byte_sum) == (0, None, 0)


def test_null_payloads_dropped_not_fatal(spark, media):
    """A null payload (missing media) must be DROPPED by every
    multimodal operator, not kill the Arrow task — bytes(None) raises
    TypeError inside the Python worker. Non-null rows' outputs are
    unchanged."""
    dirty = media.select("doc_id", "payload").unionByName(
        spark.createDataFrame([(999901, None)], "doc_id long, payload binary")
    )
    ops = [
        M.extract_features,
        M.resize_stub,
        M.frame_sample,
        M.audio_window_rms,
        M.phash64,
    ]
    for op in ops:
        out = op(dirty)
        id_field = out.columns[0]
        assert out.filter(F.col(id_field) == 999901).count() == 0, op.__name__
    # byte_stats_arrow's contract differs: strictly 1:1, null stats for
    # a null payload (the mapInArrow path handles the null cell inline)
    row = M.byte_stats_arrow(dirty).filter(F.col("doc_id") == 999901).collect()
    assert len(row) == 1 and row[0].n_bytes is None and row[0].byte_sum is None
    clean = {tuple(r) for r in M.extract_features(media).collect()}
    got = {tuple(r) for r in M.extract_features(dirty).collect()}
    assert got == clean
