"""Similarity search over embedding columns (`array<float>`).

Baseline: brute-force cosine top-k — O(n·q·d) but shuffle-free until
the final top-k (TakeOrderedAndProject / per-group window). Scale path:
BucketedRandomProjectionLSH pruning, which buckets on random
hyperplane projections so only same-bucket candidates are scored.

Both paths keep vectors as native arrays with higher-order-function
math (``functions.vectors``) — MLlib Vector conversion happens only at
the LSH boundary, where MLlib requires it.

DEGENERATE-VECTOR CONTRACT (every public function here): rows whose
vector is null — and, for the cosine-ranked paths, whose L2 norm is
zero — are EXCLUDED before any math, on BOTH the corpus and the query
side. Cosine is undefined on a zero norm, and under Spark 4's default
ANSI mode the division would otherwise kill the whole job with
DIVIDE_BY_ZERO on the first garbage embedding. The observable effect:
an excluded QUERY id is simply ABSENT from the result (no row, no
error), and an excluded corpus id can never appear as a neighbor. Use
``degenerate_vectors(df)`` to audit which ids a given frame would
drop before handing it to any entry point. Each function's docstring
restates the side(s) it filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import as_double, cosine, dot, l2_norm, sq_l2
from ..ml.fitguard import fit_nonempty
from .spread import spread


def _lloyd_deterministic(X, k: int, n_iter: int, seed: int):
    """Seeded Lloyd k-means over a CANONICALLY SORTED copy of X —
    byte-reproducible for a given multiset of rows regardless of the
    order they arrived in (the r14 layout audit showed partition-order
    sensitivity is exactly how trained ANN structures go
    nondeterministic: both the seeded init sample and the float
    summation inside each mean depend on row order unless the rows are
    first put in a content-defined order). ``np.lexsort`` over the
    columns is that order; ties are exact duplicates, which cannot
    perturb anything. Init is k evenly-spaced points of a seeded
    permutation sample (k-means++-free, fully deterministic).

    Driver/executor-local numpy: callers pass a BOUNDED sample (the
    train-small / encode-everything split — at 100 TB the quantizer
    never sees the full corpus). The assignment step is CHUNKED and
    BUFFER-REUSING (r15): the naive broadcast form materializes an
    (n, k, d) tensor (8.6 GB at n=64k/k=256/d=64), and even the
    |c|²-2x·c expansion's full (n, k) matrix churns ~134 MB of fresh
    temporaries per iteration — measured to collapse 16-way-parallel
    subspace fits to DRAM bandwidth (69 s per fit in-worker vs 6 s of
    math). Chunking keeps the scratch ~4 MB (cache-resident), one
    preallocated buffer serves every chunk and iteration, and the
    row-constant |x|² term is dropped from the argmin — means via
    weighted bincount (one pass, sequential, deterministic). The
    canonical sort keeps all of it layout-deterministic."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    X = X[np.lexsort(X.T[::-1])]
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(X))[: max(k * 8, k)]
    C = X[np.sort(idx[:: max(1, len(idx) // k)][:k])].copy()
    while len(C) < k:  # degenerate tiny input
        C = np.vstack([C, C[: k - len(C)]])
    n, d = X.shape
    chunk = min(n, max(1024, (4 << 20) // (k * 8)))
    buf = np.empty((chunk, k))
    assign = np.empty(n, dtype=np.int64)
    for _ in range(n_iter):
        csq = (C * C).sum(axis=1)[None, :]
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            b = buf[: hi - lo]
            np.matmul(X[lo:hi], C.T, out=b)
            b *= -2.0
            b += csq
            assign[lo:hi] = b.argmin(axis=1)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        sums = np.stack(
            [
                np.bincount(assign, weights=X[:, j], minlength=k)
                for j in range(d)
            ],
            axis=1,
        )
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
    return C


def _nearest_cell(vec, cent_rows: list) -> "F.Column":
    """Map-only euclidean nearest-centroid assignment against a LITERAL
    centroid table — the given-centroids replacement for
    ``KMeansModel.transform`` on the pinned-artifact query path. A
    transform → array_min fold over struct(distance, cell): stays in
    whole-stage codegen (no UDF, no MLlib Vector conversion, no
    shuffle), ties break to the lowest cell id.

    SMALL-nlist form only: the plan embeds nlist×d double literals, so
    at nlist ≳ a few hundred with realistic dims the expression tree
    stops being KiB and risks Catalyst/codegen blowup (64 KB method
    limit) — ``assign_cells`` dispatches to the closure-matrix
    mapInPandas form above ``_LITERAL_NLIST_MAX`` (r15 verdict task 6 /
    ADVICE r15)."""
    carr = F.array(
        *[
            F.struct(
                F.lit(int(cell)).alias("c"),
                F.array(*[F.lit(float(x)) for x in cv]).alias("v"),
            )
            for cell, cv in cent_rows
        ]
    )
    dists = F.transform(
        carr, lambda s: F.struct(sq_l2(vec, s["v"]).alias("d"), s["c"].alias("c"))
    )
    return F.array_min(dists)["c"]


#: Crossover between the literal-fold and closure-matrix assignment
#: forms. Below this the _nearest_cell expression is KiB-scale and
#: whole-stage-codegen wins (no Arrow hop); above it the literal plan
#: grows as nlist×d double literals (nlist=256/d=64 ≈ 0.4 MB of
#: expression tree, and codegen methods approach the JVM's 64 KB
#: limit), while the numpy form's cost is flat in nlist. Measured at
#: 200k×64 (SCALING.md r16): literal 6.5 s @16 → 27 s @128 → 56 s
#: @512; matrix ~4 s flat — crossover between 16 and 64.
_LITERAL_NLIST_MAX = 32


def assign_cells(
    df: DataFrame,
    cent_rows: list,
    id_col: str,
    vec_col: str = "__vec",
) -> DataFrame:
    """Nearest-centroid (squared-euclidean) cell assignment for the
    pinned-centroid query path, dispatching on quantizer size:

    - nlist ≤ ``_LITERAL_NLIST_MAX``: the codegen'd literal fold
      (``_nearest_cell``) — zero Python, zero Arrow hop;
    - larger: the centroid MATRIX ships inside an Arrow-batched
      mapInPandas closure (same shape as ``pq_encode``) and each batch
      is nlist small numpy ops over a preallocated (chunk, nlist)
      buffer — map-only, no shuffle, plan size independent of nlist.

    Both forms compute the same direct ``sum((x-c)^2)`` per centroid
    and break ties to the LOWEST cell id (argmin's first-minimum over
    cell-ascending columns ≡ array_min's struct ordering), so
    assignments agree exactly unless two centroids are within ULP of
    equidistant — equivalence is pinned on the catalog corpora in
    tests/test_similarity.py.

    ``df`` must carry exactly (id_col, vec_col non-null
    array<double>); returns it plus ``__cell INT``.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    cent_rows = sorted((int(c), [float(x) for x in v]) for c, v in cent_rows)
    if len(cent_rows) <= _LITERAL_NLIST_MAX:
        return df.withColumn("__cell", _nearest_cell(F.col(vec_col), cent_rows))

    cells = np.array([c for c, _ in cent_rows], dtype="int32")
    C = np.array([v for _, v in cent_rows])  # (nlist, d)
    nlist = len(cells)
    # (chunk, nlist) distance buffer sized to stay cache-resident
    chunk = max(256, (4 << 20) // max(1, nlist * 8))
    id_type = df.schema[id_col].dataType.simpleString()

    def go(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = np.empty((chunk, nlist))
        for pdf in it:
            X = np.stack(pdf[vec_col].to_numpy())  # (n, d)
            out = np.empty(len(pdf), dtype="int32")
            for lo in range(0, len(pdf), chunk):
                hi = min(lo + chunk, len(pdf))
                b = buf[: hi - lo]
                for j in range(nlist):
                    # direct form (not the -2x·c expansion): identical
                    # rounding shape to the literal fold's (x-c)^2 sum
                    d = X[lo:hi] - C[j]
                    np.einsum("ij,ij->i", d, d, out=b[:, j])
                out[lo:hi] = b.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "__cell": cells[out],
                }
            )

    return df.mapInPandas(
        go, f"{id_col} {id_type}, {vec_col} array<double>, __cell int"
    )


def _content_sample(
    embeddings: DataFrame, n: int, id_col: str, vec_col: str
):
    """Bounded, layout-insensitive training sample as a numpy array:
    rows chosen by CONTENT (order by ``xxhash64(id, vec)``, take n — a
    TakeOrderedAndProject heap, never a full sort), so any physical
    re-layout of the same logical corpus yields the same sample set.
    One column-pruned scan; the train-small half of every
    train-small / encode-everything split in this module."""
    import numpy as np

    rows = (
        embeddings.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("__id"), as_double(vec_col).alias("__v"))
        .withColumn("__h", F.xxhash64("__id", "__v"))
        .orderBy("__h", "__id")
        .limit(n)
        .select("__v")
        .collect()
    )
    return np.array([r["__v"] for r in rows])


def ivf_train_centroids(
    embeddings: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_n: int | None = None,
    n_iter: int = 20,
) -> DataFrame:
    """Train the IVF coarse quantizer as a SEPARATE step — the
    train-once half of the train-once → persist (``ml.artifact``) →
    load contract that ``ivf_topk(..., centroids=...)`` consumes. The
    r14 layout audit proved in-query MLlib kmeans|| is partition-order
    dependent even seeded; this trainer is layout-DETERMINISTIC end to
    end: the training sample is chosen by CONTENT (order by
    ``xxhash64(id, vec)``, take ``sample_n`` — a TakeOrderedAndProject,
    no full sort), and the Lloyd fit canonically sorts the sample
    before the seeded init (``_lloyd_deterministic``), so re-running on
    any physical re-layout of the same logical corpus yields
    byte-identical centroids — the pinned artifact is reproducible,
    not just frozen.

    Scale: one column-pruned scan + top-``sample_n`` heap; the numpy
    fit is driver-local over the bounded sample (default
    max(256·nlist, 4096) rows — the standard train-small split; FAISS
    trains coarse quantizers on samples of this order too).

    Returns (cell INT, centroid ARRAY<DOUBLE>), nlist rows.
    """
    X = _content_sample(
        embeddings, sample_n or max(nlist * 256, 4096), id_col, vec_col
    )
    if len(X) < nlist:
        # message matches the crisp estimator contract
        # (tests/audit_walk._CRISP_RE: "needs at least")
        raise ValueError(
            f"ivf_train_centroids needs at least nlist={nlist} trainable "
            f"vectors, got {len(X)} (an upstream filter or source "
            "produced too few rows)"
        )
    C = _lloyd_deterministic(X, nlist, n_iter, seed)
    return embeddings.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(C)],
        schema="cell INT, centroid ARRAY<DOUBLE>",
    )


def degenerate_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Audit helper for the module's degenerate-vector contract: the
    rows every cosine-ranked entry point here would silently exclude —
    null vectors and zero-norm vectors — as (id, reason). Count or
    collect this BEFORE a search when dropped ids must be observable:

        bad = degenerate_vectors(embeddings)
        n_dropped = bad.count()   # alert/log if > 0

    Kept separate from the search plans on purpose: auditing is one
    extra scan the caller opts into, not a hidden count() inside every
    query (which would double-execute the corpus scan). For the
    IVF-only degeneracy this audit cannot see — a learned centroid
    that is the zero vector — use ``ivf_dead_cells``."""
    v = F.col(vec_col)
    return (
        df.select(F.col(id_col), v)
        .filter(v.isNull() | (l2_norm(as_double(vec_col)) == 0.0))
        .select(
            id_col,
            F.when(v.isNull(), F.lit("null_vector"))
            .otherwise(F.lit("zero_norm"))
            .alias("reason"),
        )
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must carry (query_id_col, vec_col). The query side is
    broadcast (queries ≪ corpus in every ANN workload); candidate scoring
    is a map-side cross product — no shuffle — and the per-query top-k is
    one window over query_id. Self-matches (same id) are excluded.
    Returns (query_id, vec_id, score, rank) with score 4-dp rounded.

    Degenerate inputs (module contract): null/zero-norm vectors are
    excluded on BOTH sides — a degenerate query id returns NO rows, a
    degenerate corpus id is never a neighbor. Audit beforehand with
    ``degenerate_vectors``.
    """
    # L2 norms are attached ONCE per side before the pair join — inside
    # the join each corpus norm would be recomputed per query (and vice
    # versa), tripling the per-pair higher-order work. Same float ops,
    # same results: dot / (norm_q * norm_c).
    # Degenerate vectors (null, empty, all-zero) are EXCLUDED on both
    # sides: cosine is undefined on a zero norm, and under Spark 4's
    # default ANSI mode the division would otherwise kill the whole job
    # with DIVIDE_BY_ZERO on the first garbage embedding — at 100 TB
    # there is always one. isNotNull reaches the parquet scan as a
    # PushedFilter; the norm check is a cheap map-side predicate (a
    # null vector's norm is null, so it also drops there).
    corpus = (
        embeddings.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), as_double(vec_col).alias("__corpus_vec"))
        .withColumn("__cnorm", l2_norm(F.col("__corpus_vec")))
        .filter(F.col("__cnorm") > 0.0)
    )
    q = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(query_id_col), as_double(vec_col).alias("__query_vec"))
        .withColumn("__qnorm", l2_norm(F.col("__query_vec")))
        .filter(F.col("__qnorm") > 0.0)
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(
                dot(F.col("__query_vec"), F.col("__corpus_vec"))
                / (F.col("__qnorm") * F.col("__cnorm")),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return scored.select(
        query_id_col, id_col, "score", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= k)


def brute_force_topk_l2(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k EUCLIDEAN neighbors for each query vector — the
    ground-truth twin of ``brute_force_topk`` under the metric the PQ
    family ranks by (``pq_adc_topk``/``ivf_pq_topk`` approximate
    squared L2 over codes, so their recall is measured against this,
    not against cosine).

    Same physical shape as the cosine version: queries broadcast,
    scoring map-side, one window shuffle for the per-query top-k.
    Returns (query_id, vec_id, dist, rank), ``dist`` 4-dp rounded and
    the rank tie-broken on (dist, vec_id) AFTER rounding — the same
    engine-portable ordering the cosine oracle uses (both engines
    agree at 4 dp where raw f64 near-ties could legitimately differ).
    Self matches are excluded. Null vectors are excluded on both
    sides; ZERO vectors are kept — unlike cosine, euclidean distance
    is defined on them (module contract, see ``pq_adc_topk``)."""
    corpus = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), as_double(vec_col).alias("__corpus_vec")
    )
    q = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(query_id_col), as_double(vec_col).alias("__query_vec")
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(
                F.sqrt(sq_l2(F.col("__query_vec"), F.col("__corpus_vec"))), 4
            ).alias("dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col(id_col)
    )
    return scored.select(
        query_id_col, id_col, "dist", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= k)


def hard_negatives(
    embeddings: DataFrame,
    k: int = 3,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most-similar corpus vectors with a DIFFERENT
    label (similar content, wrong class — the examples a contrastive
    loss learns most from).

    Same physical shape as ``brute_force_topk``: queries broadcast,
    norms attached once per side, map-side scoring, one window shuffle
    for the per-query top-k. The label inequality is a join residual —
    it prunes before any scoring.
    Returns (query_id, vec_id, score, rank), score 4-dp.

    Degenerate inputs (module contract): null/zero-norm vectors are
    excluded on both sides — a degenerate query id is absent from the
    output. Audit with ``degenerate_vectors``.
    """
    # degenerate-vector guards: see brute_force_topk (ANSI div-by-zero)
    corpus = (
        embeddings.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(label_col).alias("__clabel"),
            as_double(vec_col).alias("__cvec"),
        )
        .withColumn("__cnorm", l2_norm(F.col("__cvec")))
        .filter(F.col("__cnorm") > 0.0)
    )
    q = (
        embeddings.filter((F.col(id_col) < n_queries) & F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("__qlabel"),
            as_double(vec_col).alias("__qvec"),
        )
        .withColumn("__qnorm", l2_norm(F.col("__qvec")))
        .filter(F.col("__qnorm") > 0.0)
    )
    scored = (
        corpus.join(F.broadcast(q), F.col("__clabel") != F.col("__qlabel"))
        .select(
            "query_id",
            id_col,
            F.round(
                dot(F.col("__qvec"), F.col("__cvec"))
                / (F.col("__qnorm") * F.col("__cnorm")),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col))
    return scored.select(
        "query_id", id_col, "score", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= k)


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold (embedding near-dup detection).

    Brute force O(n²) — correct baseline and the oracle for the LSH
    variant. At 100 TB use ``lsh_similar_pairs`` instead.
    Returns (vec_a, vec_b, cos_sim) with vec_a < vec_b, 4-dp rounded.

    Degenerate inputs (module contract): null/zero-norm vectors join
    NO pairs — their ids never appear on either side of the output.
    Audit with ``degenerate_vectors``.
    """
    # Norm once per vector (not once per pair — that would redo the
    # O(d) norm reduction n times per row in the O(n²) join).
    # Degenerate-vector guards: see brute_force_topk (ANSI div-by-zero).
    d = (
        embeddings.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), as_double(vec_col).alias("__v"))
        .withColumn("__norm", l2_norm(F.col("__v")))
        .filter(F.col("__norm") > 0.0)
    )
    # Spread the STREAMED side of the nested-loop pair join (r17, the
    # cosine_pairs twin of brute_force_topk's r16 fix): vec_a < vec_b
    # is non-equi, so this plans as BroadcastNestedLoopJoin — the b
    # side broadcasts and every pair's O(d) interpreted cosine fold
    # runs on the a side's scan partitions, which is 1-2 partitions
    # for a local fixture (measured: 24.5 s single-core at sf0.1,
    # ~2 s spread). No-op at real scale where the scan already splits.
    a = spread(
        d.select(
            F.col(id_col).alias("vec_a"),
            F.col("__v").alias("__va"),
            F.col("__norm").alias("__na"),
        )
    )
    b = d.select(
        F.col(id_col).alias("vec_b"),
        F.col("__v").alias("__vb"),
        F.col("__norm").alias("__nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
                4,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _to_mllib_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    # null embeddings would crash array_to_vector / every MLlib fit
    # downstream (LSH, KMeans); drop them here — the check pushes to
    # the parquet scan. Zero vectors are fine for the Euclidean paths.
    return df.filter(F.col(vec_col).isNotNull()).withColumn(
        "__features", array_to_vector(as_double(vec_col))
    )


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Approximate nearest neighbors via BucketedRandomProjectionLSH.

    Euclidean-LSH pruning; on normalized vectors Euclidean order ==
    cosine order. Returns (vec_id, dist) for ~k approximate neighbors.

    Degenerate inputs: null corpus vectors are excluded (their ids are
    never returned); zero vectors are VALID here — Euclidean distance
    is defined on them, so they stay in the index.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors

    feats = _to_mllib_vectors(embeddings, vec_col).select(id_col, "__features")
    lsh = BucketedRandomProjectionLSH(
        inputCol="__features",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feats)
    neigh = model.approxNearestNeighbors(
        feats, Vectors.dense([float(x) for x in query_vec]), k, distCol="dist"
    )
    return neigh.select(id_col, F.round("dist", 4).alias("dist"))


def lsh_similar_pairs(
    embeddings: DataFrame,
    max_l2_dist: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Approximate all-pairs within L2 distance via LSH self-join —
    the linear-ish scale path replacing ``cosine_pairs`` at 100 TB.

    Degenerate inputs: null vectors are excluded (ids appear in no
    pair); zero vectors are valid under the Euclidean metric."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    feats = _to_mllib_vectors(embeddings, vec_col).select(id_col, "__features")
    lsh = BucketedRandomProjectionLSH(
        inputCol="__features",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, max_l2_dist, distCol="dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("vec_a"),
            F.col(f"datasetB.{id_col}").alias("vec_b"),
            F.round("dist", 4).alias("dist"),
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search — the
    100 TB scale path for ANN.

    Index build: coarse quantizer with ``nlist`` centroids; each corpus
    vector is assigned to its nearest cell (one distributed map-only
    pass, the "inverted lists" are just a cell-id column — at scale,
    persist the corpus bucketed/partitioned BY that column so a probe
    touches only matching files). Pass ``centroids`` — a
    (cell, centroid) frame from ``ivf_train_centroids`` (typically
    persisted/loaded via ``ml.artifact``) — to make the pinned-artifact
    path the query plan: NO training happens here, assignment is a
    codegen'd nearest-centroid fold (``_nearest_cell``), and the whole
    search is layout-deterministic (r15; the r14 audit showed the
    fallback in-query MLlib kmeans|| init is partition-dependent even
    seeded, so retrain-per-query is both wasteful and irreproducible at
    scale). ``centroids=None`` keeps the self-contained MLlib fit for
    exploratory use.

    Search: each query scores the (tiny, broadcast) centroid table,
    keeps its ``nprobe`` nearest cells, and equi-joins the corpus on
    cell id — so only ~nprobe/nlist of the corpus is scored per query,
    vs 100 % for brute force. Join key cardinality = |queries|×nprobe;
    skew is bounded by KMeans balance, and AQE skew-split covers hot
    cells.

    Recall is probabilistic (a true neighbor can live in an unprobed
    cell); tests assert recall@k ≥ 0.7 vs ``brute_force_topk`` at
    nprobe/nlist = 6/16 (the corpus is near-random unit vectors — the
    hardest case for IVF; structured embeddings cluster far better).
    Returns (query_id, vec_id, score, rank).

    Degenerate inputs (module contract): null/zero-norm corpus and
    query vectors are excluded — a degenerate query id returns no
    rows. One IVF-specific case on top: a cell whose learned CENTROID
    is the zero vector cannot be cosine-ranked and is never probed, so
    its member vectors are unreachable through this index (recall
    loss, not an error; the members still exist for ``brute_force_
    topk``). Zero centroids arise only when a cell's vectors sum to
    exactly zero — adversarial input, not seen on real embeddings.
    Audit inputs with ``degenerate_vectors`` and the quantizer itself
    with ``ivf_dead_cells`` (same seeded KMeans, so it reports exactly
    the cells this search would drop).
    """
    spark = embeddings.sparkSession
    if centroids is None:
        from pyspark.ml.clustering import KMeans

        feats = _to_mllib_vectors(embeddings, vec_col).select(
            F.col(id_col), as_double(vec_col).alias("__vec"), F.col("__features")
        )
        km = KMeans(
            k=nlist, seed=42, featuresCol="__features", predictionCol="__cell"
        )
        model = fit_nonempty(km, feats, "ivf_topk", min_rows=nlist)
        assigned = model.transform(feats).select(id_col, "__vec", "__cell")
        cent_rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
        ]
    else:
        cent_rows = [
            (int(r[0]), [float(x) for x in r[1]]) for r in centroids.collect()
        ]
        assigned = assign_cells(
            embeddings.filter(F.col(vec_col).isNotNull()).select(
                F.col(id_col), as_double(vec_col).alias("__vec")
            ),
            cent_rows,
            id_col=id_col,
        )

    # Corpus norms computed once at index-build time (per vector), not
    # per probe pair — at scale this column would be persisted with the
    # cell-partitioned index. Zero-norm vectors are excluded (cosine
    # undefined; ANSI div-by-zero otherwise — see brute_force_topk).
    corpus = assigned.withColumn("__cnorm", l2_norm(F.col("__vec"))).filter(
        F.col("__cnorm") > 0.0
    )

    # Centroid table: nlist rows — broadcast everywhere. A centroid can
    # average to the zero vector on adversarial data; such a cell can't
    # be cosine-ranked, so it is simply never probed.
    centroid_tbl = spark.createDataFrame(
        [(c, v) for c, v in cent_rows if any(x != 0.0 for x in v)],
        schema="__cell INT, __cvec ARRAY<DOUBLE>",
    )

    q = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(query_id_col), as_double(vec_col).alias("__qvec"))
        .withColumn("__qnorm", l2_norm(F.col("__qvec")))
        .filter(F.col("__qnorm") > 0.0)
    )
    # Rank cells per query by centroid cosine; keep nprobe.
    qc = q.crossJoin(F.broadcast(centroid_tbl)).select(
        query_id_col,
        "__qvec",
        "__qnorm",
        "__cell",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("__csim"),
    )
    w_cell = Window.partitionBy(query_id_col).orderBy(
        F.col("__csim").desc(), F.col("__cell")
    )
    probes = qc.select(
        query_id_col,
        "__qvec",
        "__qnorm",
        "__cell",
        F.row_number().over(w_cell).alias("__r"),
    ).filter(F.col("__r") <= nprobe)

    # Probe join: corpus side shuffles on __cell once (or not at all if
    # pre-partitioned by cell); probe side is |queries|×nprobe rows.
    # Per-pair math is the dot product only — both norms ride in as
    # precomputed columns.
    scored = (
        corpus.join(
            F.broadcast(probes.select(query_id_col, "__qvec", "__qnorm", "__cell")),
            "__cell",
        )
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(
                dot(F.col("__qvec"), F.col("__vec"))
                / (F.col("__qnorm") * F.col("__cnorm")),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return scored.select(
        query_id_col, id_col, "score", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= k)


def ivf_dead_cells(
    embeddings: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Audit for the one IVF-specific degeneracy ``degenerate_vectors``
    cannot see: a coarse-quantizer cell whose learned CENTROID is the
    zero vector. Such a cell cannot be cosine-ranked, so ``ivf_topk``
    never probes it and every member vector becomes unreachable through
    the index (silent recall loss — the members themselves are healthy
    and ``brute_force_topk`` still finds them). Zero centroids need a
    cell whose vectors sum to exactly zero: adversarial input, not seen
    on real embeddings, which is why the search plan drops the cell
    silently and this audit is the opt-in way to make that observable.

    Audits the SAME quantizer the search would use: pass the pinned
    ``centroids`` frame to audit the artifact ``ivf_topk(...,
    centroids=...)`` consumes (assignment via the identical
    ``_nearest_cell`` fold), or omit it to fit the same seeded MLlib
    quantizer as the self-contained path. Same cost model as the other
    audits in this module: one assignment scan (plus a fit on the
    MLlib path) the caller opts into, never hidden inside the search
    plan.

    Returns (cell, n_members): one row per dead cell with the count of
    corpus vectors it strands; empty frame = every cell reachable.
    """
    spark = embeddings.sparkSession
    if centroids is None:
        from pyspark.ml.clustering import KMeans

        feats = _to_mllib_vectors(embeddings, vec_col).select(
            F.col(id_col), F.col("__features")
        )
        km = KMeans(
            k=nlist, seed=42, featuresCol="__features", predictionCol="__cell"
        )
        model = fit_nonempty(km, feats, "ivf_dead_cells", min_rows=nlist)
        dead = [
            i
            for i, c in enumerate(model.clusterCenters())
            if not any(float(x) != 0.0 for x in c)
        ]
        if not dead:
            return spark.createDataFrame([], schema="cell INT, n_members BIGINT")
        assigned = model.transform(feats)
    else:
        cent_rows = [
            (int(r[0]), [float(x) for x in r[1]]) for r in centroids.collect()
        ]
        dead = [c for c, v in cent_rows if not any(x != 0.0 for x in v)]
        if not dead:
            return spark.createDataFrame([], schema="cell INT, n_members BIGINT")
        assigned = assign_cells(
            embeddings.filter(F.col(vec_col).isNotNull()).select(
                F.col(id_col), as_double(F.col(vec_col)).alias("__vec")
            ),
            cent_rows,
            id_col=id_col,
        ).select(id_col, "__cell")
    return (
        assigned.filter(F.col("__cell").isin(dead))
        .groupBy(F.col("__cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


def pq_train_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 10,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_n: int | None = 65536,
) -> DataFrame:
    """Product-quantization codebooks: split each d-dim vector into
    ``m`` subvectors and learn ``k`` centroids PER subspace.

    Training runs as ONE ``applyInPandas`` over the subspace index —
    all m subspace k-means fits execute in parallel, each on its own
    partition's numpy batch (Lloyd iterations, deterministic k-means++-
    free init by even sample spacing, fixed seed). The train-small /
    encode-everything split is ENFORCED, not just documented (r15):
    the trainer sees at most ``sample_n`` vectors, chosen by CONTENT
    (order by ``xxhash64(vec)``, take n — layout-insensitive, so the
    trained books stay byte-reproducible under re-layout). Without the
    bound, groupBy("sub") would hand each subspace fit the ENTIRE
    corpus as one pandas batch — a guaranteed executor OOM at real
    scale. ``sample_n=None`` disables the bound for small-corpus
    experiments.

    Returns (sub, code, centroid: array<double>), m*k rows.

    Degenerate inputs: null vectors are excluded from training (PQ is
    Euclidean, so zero vectors are valid training points).
    """
    import numpy as np
    import pandas as pd

    src = embeddings.filter(F.col(vec_col).isNotNull())
    if sample_n is not None:
        src = (
            src.select(F.col(vec_col))
            .withColumn("__h", F.xxhash64(F.col(vec_col)))
            .orderBy("__h")
            .limit(sample_n)
            .drop("__h")
        )

    d = src.select(
        F.posexplode(
            # slice the vector into m contiguous subvectors
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda i: F.slice(
                    as_double(F.col(vec_col)),
                    i * (F.size(vec_col) / m).cast("int") + 1,
                    (F.size(vec_col) / m).cast("int"),
                ),
            )
        ).alias("sub", "subvec")
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        sub = int(pdf["sub"].iloc[0])
        X = np.stack(pdf["subvec"].to_numpy())
        # _lloyd_deterministic canonical-sorts X, so the fit is
        # layout-deterministic: the subspace batch arrives in
        # partition-dependent order, and without the sort both the
        # seeded init sample and the float summation inside each mean
        # would move with it (the r14 layout-audit finding).
        C = _lloyd_deterministic(X, k, n_iter, seed + sub)
        return pd.DataFrame(
            {
                "sub": sub,
                "code": range(k),
                "centroid": [C[c].tolist() for c in range(k)],
            }
        )

    return d.groupBy("sub").applyInPandas(
        fit, "sub int, code int, centroid array<double>"
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every vector to m uint8 codes (nearest centroid per
    subspace) — map-only: the (m x k x d/m)-float codebook collects to
    the driver (a few KiB) and ships inside the Arrow-batched closure,
    so the corpus pass is embarrassingly parallel with NO shuffle and
    the output row is id + m bytes — the 32x-or-better compression that
    makes billion-vector rerank indexes RAM-resident.

    Returns (id_col, codes: array<int>).

    Degenerate inputs: null vectors are not encoded — their ids are
    absent from the code table (and therefore from every ADC search
    over it). Zero vectors encode normally.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    rows = codebooks.collect()  # m*k tiny rows — the trained model
    if not rows:
        raise ValueError(
            "pq_encode: empty codebooks — PQ training saw zero vectors "
            "(an upstream filter or source produced no rows)"
        )
    k = max(r.code for r in rows) + 1
    dsub = len(rows[0].centroid)
    C = np.zeros((m, k, dsub))
    for r in rows:
        C[r.sub, r.code] = r.centroid

    pruned = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        as_double(F.col(vec_col)).alias("__v"),
        *[F.col(c) for c in extra_cols],
    )
    extra_schema = "".join(
        f", {c} {embeddings.schema[c].dataType.simpleString()}" for c in extra_cols
    )

    # |c|² per (sub, code): with the |x|²+|c|²-2x·c expansion the |x|²
    # term is constant across codes, so argmin needs only |c|² - 2x·c —
    # one einsum per batch instead of the naive (n, m, k, dsub)
    # broadcast tensor (which at a 10k-row Arrow batch with m=16/k=256
    # is ~1.3 GB of scratch per batch; the einsum peaks at (n, m, k)).
    CSQ = (C * C).sum(axis=2)  # (m, k)

    # Chunked, buffer-reusing argmin (r15): the naive broadcast form
    # allocates an (n, m, k, dsub) tensor per Arrow batch (~1.3 GB at
    # 10k rows, m=16/k=256 — it OOM'd the workers), and even a fresh
    # (n, m, k) einsum per batch churns DRAM. One preallocated
    # (chunk, k) buffer serves every (chunk, subspace) matmul, so the
    # scratch stays cache-resident and the scan runs at compute speed
    # across all concurrent workers.
    chunk = max(256, (4 << 20) // max(1, k * 8))

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = np.empty((chunk, k))
        for pdf in it:
            X = np.stack(pdf["__v"].to_numpy()).reshape(len(pdf), m, dsub)
            codes = np.empty((len(pdf), m), dtype="int32")
            for lo in range(0, len(pdf), chunk):
                hi = min(lo + chunk, len(pdf))
                b = buf[: hi - lo]
                for s in range(m):
                    np.matmul(X[lo:hi, s, :], C[s].T, out=b)
                    b *= -2.0
                    b += CSQ[s][None, :]
                    codes[lo:hi, s] = b.argmin(axis=1)
            out = {"__id": pdf["__id"].astype("int64"), "codes": list(codes)}
            for c in extra_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    out = pruned.mapInPandas(encode, f"__id long, codes array<int>{extra_schema}")
    return out.select(F.col("__id").alias(id_col), "codes", *extra_cols)


def pq_adc_topk(
    embeddings: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int = 1024,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (the IVF-PQ query path).

    Per query, a (m x k) lookup table of squared distances from each
    query subvector to every centroid is precomputed ONCE; a vector's
    approximate distance is then m table gathers + a sum over its codes
    — no float math against the original vectors, which never load.

    Map-only scan: codes + the tiny LUT closure cross every Arrow batch
    in numpy (vectorized gather over all queries at once); the only
    shuffle is the per-query top-k window. This is exactly the shape
    that scans billions of PQ codes per node-second in a real ANN
    index.

    Returns (query_id, vec_id, adist, rank), adist 4-dp rounded.

    Degenerate inputs: null query vectors are excluded (their ids
    return no rows); null corpus vectors were never encoded (see
    ``pq_encode``). Zero vectors are valid under the Euclidean ADC
    metric.

    The query set is driver-materialized (each query contributes an
    (m x k) LUT to every task closure), so it is BOUNDED: more than
    ``max_queries`` queries raises the crisp estimator error instead of
    an unbounded collect (r15 verdict task 5). For a legitimately large
    query set, chunk it — run this per ``max_queries``-sized slice
    (LUT memory and the (nq x n) batch matmul both scale per chunk, so
    chunking is the scale form, not a workaround) — or raise the bound
    knowingly.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    rows = codebooks.collect()
    if not rows:
        raise ValueError(
            "pq_adc_topk: empty codebooks — PQ training saw zero vectors "
            "(an upstream filter or source produced no rows)"
        )
    kk = max(r.code for r in rows) + 1
    dsub = len(rows[0].centroid)
    C = np.zeros((m, kk, dsub))
    for r in rows:
        C[r.sub, r.code] = r.centroid
    qrows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(query_id_col).alias("__qid"),
            as_double(F.col(vec_col)).alias("__qv"),
        )
        .limit(max_queries + 1)  # bound the collect itself, then raise
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_adc_topk needs at most max_queries={max_queries} query "
            f"vectors (driver-side LUT build), got more — chunk the query "
            "set into max_queries-sized slices or raise max_queries"
        )
    qids = np.array([r.__getitem__("__qid") for r in qrows], dtype=np.int64)
    Q = np.stack([np.array(r.__getitem__("__qv")) for r in qrows]).reshape(
        len(qrows), m, dsub
    )
    # (nq, m, k): squared distance from each query subvector to each centroid
    LUT = ((Q[:, :, None, :] - C[None, :, :, :]) ** 2).sum(axis=3)

    codes = pq_encode(embeddings, codebooks, m=m, id_col=id_col, vec_col=vec_col)

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        subs = np.arange(m)[None, :]
        for pdf in it:
            X = np.stack(pdf["codes"].to_numpy())  # (n, m)
            ids = pdf[id_col].to_numpy().astype("int64")
            # gather: adist[q, i] = sum_s LUT[q, s, X[i, s]] -> (nq, n)
            adr = np.round(LUT[:, subs, X].sum(axis=-1), 4)
            n = len(pdf)
            # LOSSLESS per-batch prune (r16): only rows at or below the
            # batch's (k+1)-th smallest rounded distance per query can
            # reach the global top-k (a dropped row has >= k+1 strictly
            # closer rows in this batch alone, at most one of them the
            # self row) — so the Arrow transfer back to the JVM carries
            # ~nq*(k+1) rows per batch instead of nq*n. The JVM side
            # already map-side-prunes the rank window (Partial
            # WindowGroupLimit); this closes the Python-side half.
            if n > k + 1:
                kth = np.partition(adr, k, axis=1)[:, k]
                qrow, col = np.nonzero(adr <= kth[:, None])
            else:
                qrow, col = np.nonzero(np.ones_like(adr, dtype=bool))
            yield pd.DataFrame(
                {
                    "query_id": qids[qrow],
                    "vec_id": ids[col],
                    "adist": adr[qrow, col],
                }
            )

    scored = codes.mapInPandas(scan, "query_id long, vec_id long, adist double")
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), "vec_id")
    return (
        scored.filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", "adist", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 6,
    m: int = 16,
    pq_k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
    max_queries: int = 1024,
) -> DataFrame:
    """IVF-PQ approximate top-k (euclidean): the full billion-scale ANN
    index shape — a coarse quantizer prunes the corpus to
    ``nprobe``/``nlist`` cells per query, and within probed cells
    vectors are ranked by asymmetric distance over RESIDUAL product-
    quantization codes (x - cell_centroid, PQ-encoded; residuals are
    much lower-variance than raw vectors, so the same code budget
    quantizes far finer).

    Pass ``centroids`` — a (cell, centroid) frame from
    ``ivf_train_centroids``, typically persisted/loaded via
    ``ml.artifact.pinned`` — to make the pinned-artifact path the query
    plan (r15): no KMeans fit, cell assignment via the codegen'd
    ``_nearest_cell`` fold, and (the PQ trainer being canonical-sorted)
    the whole index build layout-deterministic. ``centroids=None``
    keeps the self-contained MLlib fit.

    Index build (all distributed): one KMeans fit, one residual
    computation (zip_with against broadcast centroids), one
    applyInPandas PQ train over subspaces, one map-only encode. The
    persisted index at 100 TB is (id, cell, m bytes) — partition the
    files BY cell and a probe reads only matching partitions.

    Search: per (query, probed cell) a (m x pq_k) LUT of subspace
    distances is computed once on the driver (nq x nprobe x m x pq_k
    floats — KiB); the candidate scan is a broadcast-semi-joined
    map-only gather, then one top-k window. Original vectors never
    load at query time.

    Returns (query_id, vec_id, adist, rank), adist 4-dp rounded.

    Degenerate inputs: null corpus vectors are excluded at the index
    build; null query vectors are excluded at search (ids absent from
    the output). This index is fully Euclidean — zero vectors and zero
    centroids are valid here, unlike ``ivf_topk``'s cosine ranking.

    The query set is driver-materialized (per (query, probed cell) LUT
    build), so it is BOUNDED at ``max_queries`` with the same crisp
    error / chunking contract as ``pq_adc_topk``.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    spark = embeddings.sparkSession
    # Query bound FIRST (fail fast — before any index-build work): the
    # query set is driver-materialized for per-cell LUTs, so it is
    # capped like pq_adc_topk's.
    qrows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(query_id_col).alias("__qid"),
            as_double(F.col(vec_col)).alias("__qv"),
        )
        .limit(max_queries + 1)  # bound the collect itself, then raise
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"ivf_pq_topk needs at most max_queries={max_queries} query "
            f"vectors (driver-side per-cell LUT build), got more — chunk "
            "the query set into max_queries-sized slices or raise "
            "max_queries"
        )
    if centroids is None:
        from pyspark.ml.clustering import KMeans

        feats = _to_mllib_vectors(embeddings, vec_col).select(
            F.col(id_col), as_double(vec_col).alias("__vec"), F.col("__features")
        )
        km = KMeans(
            k=nlist, seed=42, featuresCol="__features", predictionCol="__cell"
        )
        model = fit_nonempty(km, feats, "ivf_pq_topk", min_rows=nlist)
        centers = np.array([list(c) for c in model.clusterCenters()])  # (nlist, d)
        assigned = model.transform(feats).select(id_col, "__vec", "__cell")
    else:
        cent_rows = sorted(
            (int(r[0]), [float(x) for x in r[1]]) for r in centroids.collect()
        )
        if [c for c, _ in cent_rows] != list(range(len(cent_rows))):
            raise ValueError(
                "ivf_pq_topk: given centroids must carry contiguous cell "
                "ids 0..nlist-1 (the residual LUTs index by cell)"
            )
        centers = np.array([v for _, v in cent_rows])
        assigned = assign_cells(
            embeddings.filter(F.col(vec_col).isNotNull()).select(
                F.col(id_col), as_double(vec_col).alias("__vec")
            ),
            cent_rows,
            id_col=id_col,
        )

    centroid_tbl = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        schema="__cell INT, __cvec ARRAY<DOUBLE>",
    )
    corpus = (
        assigned.join(F.broadcast(centroid_tbl), "__cell")
        .select(
            id_col,
            "__cell",
            F.zip_with("__vec", "__cvec", lambda a, b: a - b).alias("__res"),
        )
    )
    books = pq_train_codebooks(corpus, m=m, k=pq_k, vec_col="__res")
    codes = pq_encode(
        corpus, books, m=m, id_col=id_col, vec_col="__res", extra_cols=("__cell",)
    )

    # --- query side: all driver-local numpy over tiny tables ---
    rows = books.collect()
    dsub = len(rows[0].centroid)
    C = np.zeros((m, pq_k, dsub))
    for r in rows:
        C[r.sub, r.code] = r.centroid
    luts: dict[int, dict[int, np.ndarray]] = {}
    probed_cells: set[int] = set()
    for r in qrows:
        qid = r["__qid"]
        qv = np.array(r["__qv"])
        cell_d = ((centers - qv[None, :]) ** 2).sum(axis=1)
        cells = np.argsort(cell_d)[:nprobe]
        luts[qid] = {}
        for cell in cells:
            qres = (qv - centers[cell]).reshape(m, dsub)
            luts[qid][int(cell)] = (
                ((qres[:, None, :] - C) ** 2).sum(axis=2)
            )  # (m, pq_k)
            probed_cells.add(int(cell))

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        subs = np.arange(m)[None, :]
        for pdf in it:
            cells_arr = pdf["__cell"].to_numpy()
            X = np.stack(pdf["codes"].to_numpy())  # (n, m)
            ids = pdf[id_col].to_numpy().astype("int64")
            out_q, out_v, out_d = [], [], []
            for qid, cell_luts in luts.items():
                # candidates for THIS query in THIS batch, across its
                # probed cells, then the same lossless (k+1)-th-smallest
                # prune as pq_adc_topk: the Arrow transfer carries
                # ~(k+1) rows per (query, batch) instead of every
                # probed-cell member.
                q_v, q_d = [], []
                for cell, lut in cell_luts.items():
                    mask = cells_arr == cell
                    if not mask.any():
                        continue
                    ad = lut[subs, X[mask]].sum(axis=-1)
                    q_v.append(ids[mask])
                    q_d.append(np.round(ad, 4))
                if not q_v:
                    continue
                v = np.concatenate(q_v)
                d = np.concatenate(q_d)
                if len(d) > k + 1:
                    keep = d <= np.partition(d, k)[k]
                    v, d = v[keep], d[keep]
                out_q.append(np.full(len(v), qid, dtype="int64"))
                out_v.append(v)
                out_d.append(d)
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "adist": np.concatenate(out_d),
                }
            )

    candidates = codes.filter(
        F.col("__cell").isin(*[int(c) for c in probed_cells])
    )
    scored = candidates.mapInPandas(
        scan, "query_id long, vec_id long, adist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), "vec_id")
    return (
        scored.filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", "adist", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def opq_rotation(
    embeddings: DataFrame,
    m: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 4096,
):
    """OPQ-lite: one learned orthogonal rotation applied before PQ
    (r15, r14 verdict task 8) — the parametric first-order term of full
    OPQ (Ge et al., CVPR'13 "Optimized Product Quantization", OPQ_P)
    without the iterative rotation/codebook alternation.

    Why it exists: the r14 clustered-corpus sweep showed default PQ
    DEGRADES on encoder-like data (recall@10 0.200 at m=16/k=16 on the
    mixture-of-Gaussians fixture vs 0.346 random) — within-cluster
    residual variance concentrates in a few correlated directions, so
    most subspaces learn nothing and intra-cluster ranking (the only
    ranking that matters when all neighbors share a cluster) is where
    quantization error bites. Rotating to the PCA eigenbasis
    decorrelates the dims, and EIGENVALUE ALLOCATION (greedy: each
    component goes to the subspace with the lowest current log-variance
    mass) balances information across the m subspaces — the standard
    parametric recovery.

    Deterministic end to end: content-ordered sample
    (``_content_sample``), covariance eigendecomposition (``eigh`` —
    deterministic), canonical sign convention per eigenvector (largest-
    |component| entry made positive). ADC distances are rotation-
    invariant (||Rx - Rq|| = ||x - q||), so recall is measured against
    the ORIGINAL-space exact truth.

    Returns the (d, d) numpy rotation; rows are the permuted
    eigenvectors (apply with ``apply_rotation``, persist via
    ``ml.artifact.pinned`` at scale — it is a trained structure like
    any codebook). Driver-local over the bounded sample, like every
    trainer in this module.
    """
    import numpy as np

    X = _content_sample(embeddings, sample_n, id_col, vec_col)
    if len(X) < 2:
        raise ValueError(
            "opq_rotation needs at least 2 trainable vectors, got "
            f"{len(X)} (an upstream filter or source produced too few rows)"
        )
    d = X.shape[1]
    if d % m:
        raise ValueError(f"opq_rotation: dim {d} not divisible by m={m}")
    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    # canonical sign: flip each eigenvector so its largest-|x| entry > 0
    for j in range(d):
        i = int(np.abs(evecs[:, j]).argmax())
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    # eigenvalue allocation: greedily balance log-variance mass over the
    # m subspaces (each takes exactly d/m components)
    dsub = d // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    mass = np.zeros(m)
    for j in range(d):  # components in descending-eigenvalue order
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(open_b, key=lambda bb: (mass[bb], bb))
        buckets[b].append(j)
        mass[b] += np.log(max(evals[j], 1e-12))
    perm = [j for b in buckets for j in b]
    # rows of R = permuted eigenvectors: (R @ x)[i] projects x onto
    # component perm[i], so subspace s owns components buckets[s]
    return evecs[:, perm].T.copy()


def opq_rotation_np(
    embeddings: DataFrame,
    m: int = 16,
    k: int = 16,
    n_alt: int = 5,
    n_lloyd: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 4096,
    seed: int = 42,
):
    """Full (non-parametric) OPQ: alternate codebook training against
    the current rotation with an orthogonal-Procrustes rotation update
    against the current codes — Ge et al. CVPR'13's OPQ_NP refinement
    over the ``opq_rotation`` (OPQ_P) initialization (r15 verdict
    task 9).

    Each alternation: (1) rotate the sample, (2) Lloyd per subspace
    (the same canonical-sorted deterministic fit as
    ``pq_train_codebooks``), (3) build the quantized reconstruction Y,
    (4) update R = argmin_{R orthogonal} ||X Rᵀ − Y||_F — the closed
    form is V Uᵀ from svd(Xᵀ Y) = U S Vᵀ. The quantization error is
    monotone nonincreasing in (2) and (4), so the loop converges; the
    returned rotation slots into the SAME pipeline as ``opq_rotation``
    (apply_rotation → pq_train_codebooks → pq_adc_topk), and like it
    must be pinned via ``ml.artifact`` (trainer version
    ``opq_rotation_np`` if promoted to a catalog path).

    Deterministic end to end on a fixed platform: content-ordered
    sample, canonical-sorted Lloyd, and LAPACK svd over inputs that are
    themselves deterministic. Driver-local over the bounded sample —
    identical cost model to every trainer in this module.

    Returns the (d, d) rotation (rows are projections, like
    ``opq_rotation``).
    """
    import numpy as np

    R = opq_rotation(
        embeddings, m=m, id_col=id_col, vec_col=vec_col, sample_n=sample_n
    )
    X = _content_sample(embeddings, sample_n, id_col, vec_col)
    d = X.shape[1]
    dsub = d // m
    for _ in range(n_alt):
        Xr = X @ R.T
        # per-subspace deterministic Lloyd + nearest-code reconstruction
        Y = np.empty_like(Xr)
        for s in range(m):
            sub = Xr[:, s * dsub : (s + 1) * dsub]
            C = _lloyd_deterministic(sub, k, n_lloyd, seed)
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            Y[:, s * dsub : (s + 1) * dsub] = C[d2.argmin(axis=1)]
        # orthogonal Procrustes: min ||X Rᵀ − Y||_F
        U, _S, Vt = np.linalg.svd(X.T @ Y)
        R = (U @ Vt).T
    return R


def apply_rotation(
    df: DataFrame,
    rotation,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Rotate an embedding column by a fixed orthogonal matrix — the
    map-only OPQ pre-step for both the corpus (before
    ``pq_train_codebooks``/``pq_encode``) and the queries (before
    ``pq_adc_topk``). The (d, d) matrix ships inside the Arrow-batched
    closure (KiB) and each batch is one numpy matmul: embarrassingly
    parallel, no shuffle, no JVM conversion. Null vectors are excluded
    (module contract — their ids are absent downstream).

    Returns (id_col, vec_col) with the rotated vectors as
    array<double>.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    R = np.asarray(rotation, dtype=np.float64)

    pruned = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("__id"), as_double(vec_col).alias("__v")
    )

    def rot(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            X = np.stack(pdf["__v"].to_numpy())
            out = X @ R.T
            yield pd.DataFrame(
                {"__id": pdf["__id"].astype("int64"), "__v": list(out)}
            )

    return pruned.mapInPandas(rot, "__id long, __v array<double>").select(
        F.col("__id").alias(id_col), F.col("__v").alias(vec_col)
    )
