"""Similarity search over embedding columns (`array<float>`).

Baseline: brute-force cosine top-k — O(n·q·d) but shuffle-free until
the final top-k (TakeOrderedAndProject / per-group window). Scale path:
BucketedRandomProjectionLSH pruning, which buckets on random
hyperplane projections so only same-bucket candidates are scored.

Both paths keep vectors as native arrays with higher-order-function
math (``functions.vectors``) — MLlib Vector conversion happens only at
the LSH boundary, where MLlib requires it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import as_double, cosine, dot, l2_norm


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
    """
    # L2 norms are attached ONCE per side before the pair join — inside
    # the join each corpus norm would be recomputed per query (and vice
    # versa), tripling the per-pair higher-order work. Same float ops,
    # same results: dot / (norm_q * norm_c).
    corpus = embeddings.select(
        F.col(id_col), as_double(vec_col).alias("__corpus_vec")
    ).withColumn("__cnorm", l2_norm(F.col("__corpus_vec")))
    q = queries.select(
        F.col(query_id_col), as_double(vec_col).alias("__query_vec")
    ).withColumn("__qnorm", l2_norm(F.col("__query_vec")))
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
    """
    corpus = embeddings.select(
        F.col(id_col),
        F.col(label_col).alias("__clabel"),
        as_double(vec_col).alias("__cvec"),
    ).withColumn("__cnorm", l2_norm(F.col("__cvec")))
    q = (
        embeddings.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("__qlabel"),
            as_double(vec_col).alias("__qvec"),
        )
        .withColumn("__qnorm", l2_norm(F.col("__qvec")))
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
    """
    # Norm once per vector (not once per pair — that would redo the
    # O(d) norm reduction n times per row in the O(n²) join).
    d = embeddings.select(
        F.col(id_col), as_double(vec_col).alias("__v")
    ).withColumn("__norm", l2_norm(F.col("__v")))
    a = d.select(
        F.col(id_col).alias("vec_a"),
        F.col("__v").alias("__va"),
        F.col("__norm").alias("__na"),
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

    return df.withColumn("__features", array_to_vector(as_double(vec_col)))


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
    the linear-ish scale path replacing ``cosine_pairs`` at 100 TB."""
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
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search — the
    100 TB scale path for ANN.

    Index build: MLlib KMeans coarse quantizer with ``nlist`` centroids;
    each corpus vector is assigned to its nearest cell (one distributed
    pass, the "inverted lists" are just a cell-id column — at scale,
    persist the corpus bucketed/partitioned BY that column so a probe
    touches only matching files).

    Search: each query scores the (tiny, broadcast) centroid table,
    keeps its ``nprobe`` nearest cells, and equi-joins the corpus on
    cell id — so only ~nprobe/nlist of the corpus is scored per query,
    vs 100 % for brute force. Join key cardinality = |queries|×nprobe;
    skew is bounded by KMeans balance, and AQE skew-split covers hot
    cells.

    Recall is probabilistic (a true neighbor can live in an unprobed
    cell); tests assert recall@k ≥ 0.7 vs ``brute_force_topk`` at
    nprobe/nlist = 6/16 (the corpus is near-random unit vectors — the
    hardest case for IVF; structured embeddings cluster far better). Returns (query_id, vec_id, score, rank).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import vector_to_array

    feats = _to_mllib_vectors(embeddings, vec_col).select(
        F.col(id_col), as_double(vec_col).alias("__vec"), F.col("__features")
    )
    km = KMeans(k=nlist, seed=42, featuresCol="__features", predictionCol="__cell")
    model = km.fit(feats)

    # Corpus norms computed once at index-build time (per vector), not
    # per probe pair — at scale this column would be persisted with the
    # cell-partitioned index.
    corpus = model.transform(feats).select(id_col, "__vec", "__cell").withColumn(
        "__cnorm", l2_norm(F.col("__vec"))
    )

    # Centroid table: nlist rows — broadcast everywhere.
    spark = embeddings.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        schema=f"__cell INT, __cvec ARRAY<DOUBLE>",
    )

    q = queries.select(
        F.col(query_id_col), as_double(vec_col).alias("__qvec")
    ).withColumn("__qnorm", l2_norm(F.col("__qvec")))
    # Rank cells per query by centroid cosine; keep nprobe.
    qc = q.crossJoin(F.broadcast(centroids)).select(
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
