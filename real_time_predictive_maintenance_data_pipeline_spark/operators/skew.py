"""Skew-mitigation join: explicit key salting.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.spark_confs`) handles most skew by splitting oversized
sort-merge partitions at runtime. Explicit salting remains the right
tool when (a) one key dominates so hard that even a split partition's
*build* side is the bottleneck, or (b) the join is hash-based and AQE
can't split it. This operator is the documented, tested form of that
rewrite.

Mechanics: the skewed (probe) side gets a uniform random salt in
[0, n_salts); the replicated (build) side is exploded n_salts× so every
(key, salt) pair exists; the join key becomes (key, salt). Each
formerly-hot key now spreads over n_salts shuffle partitions.
Cost: build side shuffles n_salts× more bytes — pick n_salts ≈ the
skew factor, not larger. Semantics are identical to the unsalted join
(every probe row still meets every matching build row exactly once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on column ``on`` with salt-spread
    shuffle keys. Column sets must be disjoint apart from ``on``.

    Supported ``how``: inner / left (the probe side must be the skewed
    one; for right/full, swap the call).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = (F.rand(seed) * n_salts).cast("int")
    probe = skewed.withColumn("__salt", salt)
    build = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = probe.join(build, [on, "__salt"], how)
    return joined.drop("__salt")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
    default: float | None = None,
) -> DataFrame:
    """Per-stratum Bernoulli sampling — the training-data rebalancing
    primitive (e.g. downsample dominant languages, keep all rare ones).

    Map-side only: each task flips a seeded coin per row — no shuffle,
    no global pass, linear at any scale. Fractions are exact in
    expectation (binomial per stratum); for exact counts use the
    rank-over-random pattern from ``sources/generator`` instead.

    With ``default=None`` this is ``sampleBy`` (strata absent from
    ``fractions`` are dropped). A non-None ``default`` covers every
    OTHER stratum — so callers never need to enumerate the strata
    domain first (a full corpus scan at 100 TB just to build the
    fractions dict): the per-row fraction is a when-chain evaluated
    map-side.
    """
    if default is None:
        return df.sampleBy(strata_col, fractions=fractions, seed=seed)
    frac = F.lit(float(default))
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, float(v)).otherwise(frac)
    return df.filter(F.rand(seed) < frac)


def heavy_hitters(df, value_col: str, k: int = 20):
    """Exact heavy hitters (frequency > n/k) via distributed
    Misra-Gries: each partition streams its rows through a k-counter
    summary (mapInPandas, O(k) memory regardless of partition size) and
    emits at most k candidate values; a value whose GLOBAL frequency
    exceeds n/k must exceed n_p/k in at least one partition (pigeonhole
    over the sum), so the candidate union provably contains every true
    heavy hitter. A second exact pass counts ONLY the candidates
    (broadcast semi-join — candidates ≤ k x partitions, counts are a
    tiny aggregate) and filters by the true threshold, eliminating
    false positives.

    The full-frequency groupBy this replaces shuffles every distinct
    value; this shuffles at most k values per partition — the hot-key
    detector that feeds ``salted_join`` at 100 TB.

    Null handling: null (and, for float columns, NaN) values are
    EXCLUDED — they are never heavy-hitter candidates and do not count
    toward the n/k threshold total. Two reasons, both load-bearing:
    (1) the exact second pass is an equi-join, which can never match a
    null candidate, so a null "hitter" would silently vanish there
    anyway; (2) CPython 3.10+ hashes each float NaN by IDENTITY, so
    NaN keys would each open their own Misra-Gries counter — unbounded
    dict growth that breaks the operator's O(k)-memory contract on
    exactly the garbage-bearing data it exists for. Count nulls with a
    plain ``df.filter(col.isNull()).count()`` if that stratum matters.

    Returns (value_col, n) for values with n > total/k, exact counts.
    """
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import functions as F

    src = df.select(F.col(value_col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    if df.schema[value_col].dataType.simpleString() in ("float", "double"):
        src = src.filter(~F.isnan("__v"))

    def mg(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in it:
            for v in pdf["__v"]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k - 1:
                    counters[v] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame({"__v": list(counters.keys())})

    candidates = src.mapInPandas(mg, f"__v {df.schema[value_col].dataType.simpleString()}").distinct()
    total = src.count()
    exact = (
        src.join(F.broadcast(candidates), "__v")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > total / k)
    )
    return exact.select(F.col("__v").alias(value_col), "n")


def exact_stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (or all rows for
    strata smaller than n), chosen by deterministic hash order — the
    reproducible eval-set carve-out where a Bernoulli sample's
    binomial jitter is unacceptable.

    One shuffle on the stratum key + an in-partition rank over
    xxhash64(id, seed): stable across runs, cluster sizes, AND
    insertions of unrelated rows (a row's hash rank only moves if
    rows within its own stratum change — unlike rand()-ordered
    row_number). Rank is WindowGroupLimit-prunable, so each task
    keeps a bounded top-n heap instead of fully sorting its stratum.
    """
    from pyspark.sql.window import Window as W

    h = F.xxhash64(F.col(id_col), F.lit(seed))
    rk = F.row_number().over(
        W.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("__rk", rk)
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )
