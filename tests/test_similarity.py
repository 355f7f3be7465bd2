"""Similarity-search semantics tests at sf0.01: brute-force is the
oracle; LSH and IVF are graded on recall@k against it (approximate by
design — precision of returned scores is exact since both paths rerank
with true cosine).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.operators import (
    similarity as S,
)

SF = "/root/testdata/sf0.01"
K = 5
N_QUERIES = 20


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(embs):
    return embs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@pytest.fixture(scope="module")
def exact_topk(embs, queries):
    out = S.brute_force_topk(embs, queries, k=K)
    res = {}
    for r in out.collect():
        res.setdefault(r.query_id, set()).add(r.vec_id)
    return res


def test_brute_force_shape(exact_topk):
    assert len(exact_topk) == N_QUERIES
    assert all(len(v) == K for v in exact_topk.values())


def test_ivf_recall(embs, queries, exact_topk):
    out = S.ivf_topk(embs, queries, k=K, nlist=16, nprobe=6)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(got.get(q, set()) & truth) for q, truth in exact_topk.items())
    recall = hits / (N_QUERIES * K)
    assert recall >= 0.7, f"IVF recall@{K} = {recall:.3f}"


def test_ivf_scores_are_true_cosine(embs, queries, exact_topk):
    """IVF reranks with exact cosine: any (query, vec) pair IVF returns
    that brute force also returns must carry an identical score."""
    ivf = S.ivf_topk(embs, queries, k=K, nlist=16, nprobe=6).alias("i")
    bf = S.brute_force_topk(embs, queries, k=K).alias("b")
    j = ivf.join(bf, ["query_id", "vec_id"]).select(
        (F.col("i.score") - F.col("b.score")).alias("d")
    )
    assert j.count() > 0
    assert j.agg(F.max(F.abs("d"))).first()[0] == 0.0


def test_lsh_topk_recall(embs, exact_topk):
    qv = embs.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = S.lsh_topk(embs, list(qv), k=K)
    got = {r.vec_id for r in out.collect()} - {0}
    truth = exact_topk[0]
    recall = len(got & truth) / K
    assert recall >= 0.4, f"LSH recall@{K} = {recall:.2f}"


def test_cosine_pairs_symmetric_threshold(embs):
    pairs = S.cosine_pairs(embs.limit(300), threshold=0.5)
    row = pairs.agg(
        F.count(F.lit(1)).alias("n"), F.min("cos_sim").alias("lo")
    ).first()
    if row.n:
        assert row.lo >= 0.5
    ids = pairs.filter(F.col("vec_a") >= F.col("vec_b")).count()
    assert ids == 0  # canonical ordering
