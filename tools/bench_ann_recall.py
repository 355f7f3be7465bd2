"""Recall@10 for the approximate-ANN family vs exact ground truth at a
real scale factor (r12 verdict item 6).

The ANN scaling table (SCALING.md) grades wall-time growth; recall was
previously gated only at sf0.001 (500 vectors). This measures, on the
sf0.1 embeddings (2000 x 64) with 50 query vectors:

- ``ivf_topk``   recall@10 vs exact COSINE top-10 (its own metric),
  across an nprobe sweep — the recall/cost knob a deployment tunes;
- ``pq_adc_topk``  recall@10 vs exact EUCLIDEAN top-10 (ADC ranks by
  squared L2 over codes; quantization error is the only loss);
- ``ivf_pq_topk``  recall@10 vs exact EUCLIDEAN top-10 (combines cell
  pruning with residual-PQ ranking).

Ground truths are computed exactly: cosine via ``brute_force_topk``
(the catalog's own oracle-checked operator), Euclidean via numpy on
the collected corpus (2000 x 64 floats — a benchmark-tool convenience,
not an engine pattern). Parameters mirror the catalog entries
(nlist=16, nprobe=6, m=16, pq_k=16).

Prints a markdown table for SCALING.md.

Usage: python tools/bench_ann_recall.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.operators import (
    similarity as S,
)
from real_time_predictive_maintenance_data_pipeline_spark.session import get_spark
from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
    load_table,
)

K = 10


def _recall(got: dict[int, set[int]], truth: dict[int, set[int]]) -> float:
    qs = sorted(truth)
    return sum(len(got.get(q, set()) & truth[q]) / K for q in qs) / len(qs)


def _collect_topk(df, qcol="query_id", vcol="vec_id") -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r[qcol], set()).add(r[vcol])
    return out


def main() -> None:
    import numpy as np

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("bench-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = e.count()
    print(f"corpus {n} vectors, {nq} queries, k={K}  ({sf_dir})\n")

    # exact ground truths
    cos_truth = _collect_topk(S.brute_force_topk(e, q, k=K))
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in e.collect()}
    l2_truth: dict[int, set[int]] = {}
    for qid in range(nq):
        d = sorted(
            (float(np.sum((v - vecs[qid]) ** 2)), vid)
            for vid, v in vecs.items()
            if vid != qid
        )
        l2_truth[qid] = {vid for _, vid in d[:K]}

    rows = []

    for nprobe in (2, 4, 6, 8, 12, 16):
        t0 = time.perf_counter()
        got = _collect_topk(
            S.ivf_topk(e, q, k=K, nlist=16, nprobe=nprobe)
        )
        wall = time.perf_counter() - t0
        rows.append(
            (f"ivf_topk nprobe={nprobe}/16", "cosine",
             _recall(got, cos_truth), wall)
        )

    books = S.pq_train_codebooks(e, m=16, k=16)
    t0 = time.perf_counter()
    got = _collect_topk(S.pq_adc_topk(e, books, q, k=K, m=16))
    rows.append(("pq_adc_topk m=16 k=16", "euclidean",
                 _recall(got, l2_truth), time.perf_counter() - t0))

    t0 = time.perf_counter()
    got = _collect_topk(
        S.ivf_pq_topk(e, q, k=K, nlist=16, nprobe=6, m=16, pq_k=16)
    )
    rows.append(("ivf_pq_topk nprobe=6/16 m=16", "euclidean",
                 _recall(got, l2_truth), time.perf_counter() - t0))

    print("| method | ground truth | recall@10 | wall s |")
    print("|---|---|---|---|")
    for name, gt, rec, wall in rows:
        print(f"| {name} | exact {gt} | {rec:.3f} | {wall:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
