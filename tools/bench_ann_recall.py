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

``--clustered`` (r14, r13 verdict task 5) swaps the corpus for the
seeded mixture-of-Gaussians fixture (``sources.generator.
clustered_embeddings``: 2000 x 64, 20 clusters, noise 0.25) at the
same shape — the sf0.1 fixture's near-random vectors are a recall
FLOOR (no neighborhood structure for cells/codes to exploit); the
clustered fixture shows the recall a real encoder corpus would get.
The clustered run also sweeps the PQ (m, k) grid, the
memory-vs-recall knob a deployment tunes.

Usage: python tools/bench_ann_recall.py [sf_dir] [n_queries] [--clustered]
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

    argv = [a for a in sys.argv[1:] if a != "--clustered"]
    clustered = "--clustered" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    nq = int(argv[1]) if len(argv) > 1 else 50
    spark = get_spark("bench-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    if clustered:
        from real_time_predictive_maintenance_data_pipeline_spark.sources.generator import (
            clustered_embeddings,
        )

        e = clustered_embeddings(spark).drop("cluster_id").cache()
        label = "clustered MoG 2000x64 (20 clusters, noise 0.25)"
    else:
        e = load_table(spark, sf_dir, "embeddings")
        label = sf_dir
    q = e.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = e.count()
    print(f"corpus {n} vectors, {nq} queries, k={K}  ({label})\n")

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

    if not clustered:
        # (the clustered (m, k) sweep below measures this config)
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

    if clustered:
        # (m, k) sweep: the PQ memory/recall knob — code bytes per
        # vector = m, table cost = m*k; recall should rise with both
        for m, k in ((8, 16), (16, 16), (16, 64), (32, 64), (32, 256)):
            books = S.pq_train_codebooks(e, m=m, k=k)
            t0 = time.perf_counter()
            got = _collect_topk(S.pq_adc_topk(e, books, q, k=K, m=m))
            rows.append(
                (f"pq_adc_topk m={m} k={k}", "euclidean",
                 _recall(got, l2_truth), time.perf_counter() - t0)
            )

    # OPQ-lite (r15): one learned rotation before PQ — ADC distance is
    # rotation-invariant, so recall stays against the original-space
    # truth. On clustered data this prices back the structure penalty
    # without spending code bytes (cf. the m=16/k=16 rows above).
    t0 = time.perf_counter()
    R = S.opq_rotation(e, m=16)
    er = S.apply_rotation(e, R).cache()
    qr = S.apply_rotation(q, R, id_col="query_id")
    books = S.pq_train_codebooks(er, m=16, k=16)
    got = _collect_topk(S.pq_adc_topk(er, books, qr, k=K, m=16))
    rows.append(("pq_adc_topk m=16 k=16 + OPQ-lite", "euclidean",
                 _recall(got, l2_truth), time.perf_counter() - t0))
    er.unpersist()

    print("| method | ground truth | recall@10 | wall s |")
    print("|---|---|---|---|")
    for name, gt, rec, wall in rows:
        print(f"| {name} | exact {gt} | {rec:.3f} | {wall:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
