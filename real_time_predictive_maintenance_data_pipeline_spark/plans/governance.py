"""Round-4 wave: data-governance, curriculum, evaluation, and
incremental-maintenance operators for the training-data pipeline.

Fills the remaining gaps a 100 TB curation deployment hits after the
round-1..3 surface (dedup/ANN/curation/analytics): text normalization,
deterministic corpus shuffling + token-budget selection (curriculum
construction), privacy gates (k-anonymity / l-diversity), statistical
testing (Welch A/B t-test, chi-squared independence), ANN quality
evaluation (recall@k of truncated "matryoshka" embeddings), GDPR-style
partition-pruned delete rewrite, incremental re-crawl dedup against a
base corpus, and BPE vocabulary APPLICATION (completing the round-3
train step).

Everything is DataFrame-declarative; SQL-expressible semantics carry a
DuckDB oracle per the registry conventions (identical aliases, integer
cents for money-like sums, index-order array folds, HUGEINT casts).
"""

from __future__ import annotations

import datetime
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.vectors import as_double
from ..operators.spread import spread
from ..sources.tables import load_table
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "documents"))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Text normalization
# ---------------------------------------------------------------------------


@register(
    "doc_normalize_text",
    oracle="""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       length(norm) AS n_chars_norm,
       len(string_split(norm, ' ')) AS n_tokens_norm,
       md5(norm) AS md5_norm
FROM n
""",
    tags=("text",),
)
def doc_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — the first stage of every corpus
    pipeline (lowercase, strip non-alphanumerics, collapse runs of
    whitespace, trim). Emitted as length/token-count plus an md5
    checksum so the oracle verifies the normalized STRING byte-exactly
    without shipping it through the hash canonicalizer.

    Scale: per-row expression pipeline (map-only, whole-stage codegen,
    no shuffle) — linear at any corpus size."""
    d = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return d.select(
        "doc_id",
        F.length(norm).alias("n_chars_norm"),
        F.size(F.split(norm, " ")).alias("n_tokens_norm"),
        F.md5(norm).alias("md5_norm"),
    )


# ---------------------------------------------------------------------------
# Curriculum construction
# ---------------------------------------------------------------------------

_CURRICULUM_SEED = "s42:"


@register(
    "doc_curriculum_order",
    oracle=f"""
SELECT doc_id,
       CASE WHEN q >= 0.75 THEN 0 WHEN q >= 0.6 THEN 1
            WHEN q >= 0.45 THEN 2 ELSE 3 END AS bucket,
       md5('{_CURRICULUM_SEED}' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM (
  SELECT doc_id,
         ROUND(0.5 * LEAST(1.0, len(string_split(text, ' ')) / 50.0)
             + 0.5 * (len(list_distinct(string_split(text, ' '))) * 1.0
                      / len(string_split(text, ' '))), 4) AS q
  FROM documents
)
""",
    tags=("curation", "curriculum"),
)
def doc_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum ordering: fixed quality-threshold
    buckets (best bucket first) with a seeded hash shuffle key inside
    each bucket. The training order is ``ORDER BY (bucket,
    shuffle_key)`` — reproducible across runs and engines (md5 of the
    seeded id, not rand()), which is how large pretraining runs get
    restartable data order.

    Scale: bucket and key are per-row expressions (map-only). The
    final order is a global range-partitioned sort on the emitted key
    — Spark's sort scales to any corpus; no single-partition window
    (an ntile/row_number curriculum would serialize the whole corpus
    through one task, this formulation never does)."""
    d = _docs(spark, sf_dir)
    q = T.quality_score("text")
    bucket = (
        F.when(q >= 0.75, 0)
        .when(q >= 0.6, 1)
        .when(q >= 0.45, 2)
        .otherwise(3)
    )
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.md5(
            F.concat(F.lit(_CURRICULUM_SEED), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    )


_TOKEN_BUDGET = 1500


@register(
    "doc_token_budget_select",
    oracle=f"""
WITH q AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         ROUND(0.5 * LEAST(1.0, len(string_split(text, ' ')) / 50.0)
             + 0.5 * (len(list_distinct(string_split(text, ' '))) * 1.0
                      / len(string_split(text, ' '))), 4) AS quality
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens, quality,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM q
)
SELECT lang, doc_id, n_tokens, quality, cum_tokens
FROM c WHERE cum_tokens <= {_TOKEN_BUDGET}
""",
    tags=("curation", "curriculum"),
)
def doc_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted selection: per language domain, take the
    highest-quality documents until a token budget is exhausted — the
    greedy knapsack every mixture-weighted pretraining corpus is
    actually assembled with (domain budgets come from
    doc_domain_mix_weights; this op spends them).

    Scale: one shuffle on the domain key, then a running-sum window
    inside each domain. Domains are few and fat — with a skewed giant
    domain the window ordering becomes that domain's sort, which Spark
    range-partitions; the budget filter prunes everything past the
    cutoff before any downstream stage."""
    d = _docs(spark, sf_dir)
    q = d.select(
        "doc_id",
        "lang",
        T.token_count("text").alias("n_tokens"),
        T.quality_score("text").alias("quality"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("quality"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        q.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _TOKEN_BUDGET)
        .select("lang", "doc_id", "n_tokens", "quality", "cum_tokens")
    )


# ---------------------------------------------------------------------------
# Privacy / governance gates
# ---------------------------------------------------------------------------


@register(
    "rel_k_anonymity",
    oracle="""
SELECT lang,
       CAST(n_chars // 100 AS BIGINT) AS len_bucket,
       COUNT(*) AS group_n,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       COUNT(*) >= 5 AS meets_k5,
       COUNT(DISTINCT source) >= 2 AS meets_l2
FROM documents
GROUP BY lang, CAST(n_chars // 100 AS BIGINT)
""",
    tags=("governance", "agg"),
)
def rel_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifier groups
    (language × length bucket): group sizes, distinct sensitive values
    (source), and the k>=5 / l>=2 gates — the release check privacy
    review runs before publishing a derived corpus.

    Scale: one grouped aggregation on the QI key with partial
    (map-side) aggregation; COUNT(DISTINCT) expands to the standard
    two-phase distinct-aggregate plan. No joins, no windows."""
    d = _docs(spark, sf_dir)
    return d.groupBy(
        "lang", (F.col("n_chars") / 100).cast("long").alias("len_bucket")
    ).agg(
        F.count(F.lit(1)).alias("group_n"),
        F.countDistinct("source").alias("n_sources"),
        (F.count(F.lit(1)) >= 5).alias("meets_k5"),
        (F.countDistinct("source") >= 2).alias("meets_l2"),
    )


# ---------------------------------------------------------------------------
# Statistical testing
# ---------------------------------------------------------------------------


@register(
    "rel_ab_ttest",
    oracle="""
WITH s AS (
  SELECT event_type,
         CAST(COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_a,
         CAST(COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN user_id % 2 = 0
                       THEN CAST(ROUND(value * 100) AS BIGINT) END) AS DOUBLE) AS sca,
         CAST(SUM(CASE WHEN user_id % 2 = 0
                       THEN CAST(ROUND(value * 100) AS BIGINT)
                            * CAST(ROUND(value * 100) AS BIGINT) END) AS DOUBLE) AS sca2,
         CAST(SUM(CASE WHEN user_id % 2 = 1
                       THEN CAST(ROUND(value * 100) AS BIGINT) END) AS DOUBLE) AS scb,
         CAST(SUM(CASE WHEN user_id % 2 = 1
                       THEN CAST(ROUND(value * 100) AS BIGINT)
                            * CAST(ROUND(value * 100) AS BIGINT) END) AS DOUBLE) AS scb2
  FROM events GROUP BY event_type
),
w AS (
  SELECT event_type, n_a, n_b,
         sca / n_a / 100 AS mean_a, scb / n_b / 100 AS mean_b,
         CASE WHEN n_a > 1
              THEN (sca2 - sca * sca / n_a) / (n_a - 1) / 10000 END AS var_a,
         CASE WHEN n_b > 1
              THEN (scb2 - scb * scb / n_b) / (n_b - 1) / 10000 END AS var_b
  FROM s
)
SELECT event_type, n_a, n_b,
       ROUND(mean_a, 4) AS mean_a, ROUND(mean_b, 4) AS mean_b,
       CASE WHEN var_a / n_a + var_b / n_b > 0
            THEN ROUND((mean_a - mean_b)
                       / sqrt(var_a / n_a + var_b / n_b), 4) END AS t_stat,
       CASE WHEN var_a / n_a + var_b / n_b > 0
            THEN ROUND(pow(var_a / n_a + var_b / n_b, 2)
                       / (pow(var_a / n_a, 2) / (n_a - 1)
                          + pow(var_b / n_b, 2) / (n_b - 1)), 4)
       END AS welch_df
FROM w
""",
    tags=("analytics", "stats"),
)
def rel_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test per event type between two user
    cohorts (user_id parity as the A/B assignment): cohort means,
    t-statistic, and Welch–Satterthwaite degrees of freedom — the
    experiment-analysis primitive computed entirely from sufficient
    statistics.

    Float parity: means/variances derive from EXACT integer-cent sums
    (sum and sum-of-squares of ROUND(value*100) are integral doubles
    < 2^53, so partial-agg order cannot perturb them); t and df are
    then identical double expressions on both engines, rounded at the
    edge. Scale: ONE map-side-combined conditional aggregation over
    the fact at event_type grain — both cohorts' sufficient statistics
    come out of the same pass (no self-join, no second fact scan;
    plan-asserted in tests/test_governance.py)."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    is_a = F.col("user_id") % 2 == 0
    s = ev.groupBy("event_type").agg(
        F.count(F.when(is_a, 1)).alias("n_a"),
        F.count(F.when(~is_a, 1)).alias("n_b"),
        F.sum(F.when(is_a, cents)).cast("double").alias("sca"),
        F.sum(F.when(is_a, cents * cents)).cast("double").alias("sca2"),
        F.sum(F.when(~is_a, cents)).cast("double").alias("scb"),
        F.sum(F.when(~is_a, cents * cents)).cast("double").alias("scb2"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    mean_a = F.col("sca") / n_a / 100
    mean_b = F.col("scb") / n_b / 100
    var_a = F.when(
        n_a > 1,
        (F.col("sca2") - F.col("sca") * F.col("sca") / n_a) / (n_a - 1) / 10000,
    )
    var_b = F.when(
        n_b > 1,
        (F.col("scb2") - F.col("scb") * F.col("scb") / n_b) / (n_b - 1) / 10000,
    )
    se2 = var_a / n_a + var_b / n_b
    return s.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(mean_a, 4).alias("mean_a"),
        F.round(mean_b, 4).alias("mean_b"),
        F.when(
            se2 > 0, F.round((mean_a - mean_b) / F.sqrt(se2), 4)
        ).alias("t_stat"),
        F.when(
            se2 > 0,
            F.round(
                F.pow(se2, 2)
                / (
                    F.pow(var_a / n_a, 2) / (n_a - 1)
                    + F.pow(var_b / n_b, 2) / (n_b - 1)
                ),
                4,
            ),
        ).alias("welch_df"),
    )


@register(
    "rel_chi_square",
    oracle="""
WITH c AS (
  SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS obs
  FROM documents GROUP BY lang, source
),
tot AS (
  SELECT c.*,
         SUM(obs) OVER (PARTITION BY lang) AS row_tot,
         SUM(obs) OVER (PARTITION BY source) AS col_tot,
         SUM(obs) OVER () AS n
  FROM c
),
term AS (
  SELECT pow(obs - row_tot * col_tot / n, 2) / (row_tot * col_tot / n) AS t,
         lang, source
  FROM tot
)
SELECT CAST((SELECT COUNT(*) FROM term) AS BIGINT) AS n_cells,
       CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1) AS BIGINT)
         AS dof,
       ROUND(list_reduce(list_prepend(0.0, (SELECT list(t ORDER BY t) FROM term)),
             (a, b) -> a + b), 4) AS chi2
FROM term
""",
    tags=("analytics", "stats"),
)
def rel_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of independence between language and source —
    "is the corpus mix balanced, or does each crawl source skew to its
    own languages?" (it always does; this quantifies it for the
    mixture-reweighting step).

    Counts are exact integers; expected values and per-cell terms are
    identical double expressions; the final sum folds a VALUE-SORTED
    term list (registry convention for order-dependent double sums).
    Scale: the contingency table is |langs|x|sources| rows — the only
    full-data pass is the grouped count; everything after runs on the
    tiny cell table."""
    d = _docs(spark, sf_dir)
    c = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("obs")
    )
    tot = c.select(
        "lang",
        "source",
        "obs",
        F.sum("obs").over(Window.partitionBy("lang")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("source")).alias("col_tot"),
        F.sum("obs").over(
            Window.partitionBy()
        ).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    term = tot.select(
        "lang", "source", (F.pow(F.col("obs") - exp, 2) / exp).alias("t")
    )
    from ..functions.timeutil import ordered_fold_sum

    return term.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).alias("dof"),
        F.round(ordered_fold_sum(F.collect_list("t")), 4).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# GDPR-style delete (copy-on-write partition rewrite)
# ---------------------------------------------------------------------------


def copy_on_write_delete(spark: SparkSession, path: str, pred, part_col: str) -> None:
    """DELETE WHERE ``pred`` from the partitioned parquet table at
    ``path`` by rewriting only the partitions that contain matching rows
    (dynamic partition overwrite), and explicitly dropping any hit
    partition whose every row matched — dynamic overwrite only replaces
    partitions PRESENT in the written frame, so a fully-deleted
    partition's files would otherwise silently survive."""
    # Hit partitions, collected BOTH as the typed value (for a
    # partition-prunable isin filter) and as Spark's own Cast-to-string
    # rendering (for path reconstruction below: str(p) on the Python
    # value diverges from Spark's rendering for timestamps with
    # fractional seconds, large doubles in scientific notation,
    # booleans, ...). DELETE semantics: only rows where pred is TRUE are
    # deleted — rows where pred evaluates to NULL survive.
    matched = F.coalesce(pred, F.lit(False))
    hit_rows = (
        spark.read.parquet(path)
        .filter(matched)
        .select(
            F.col(part_col).alias("v"),
            F.col(part_col).cast("string").alias("k"),
        )
        .distinct()
        .collect()
    )
    hit_typed = [r["v"] for r in hit_rows if r["v"] is not None]
    hit_keys = [r["k"] for r in hit_rows]
    member = F.col(part_col).isin(hit_typed)
    if any(k is None for k in hit_keys):
        # isin never matches NULL; without this a hit null-keyed
        # partition's surviving rows would be excluded from the rewrite
        # and then deleted with the directory.
        member = member | F.col(part_col).isNull()
    survivors = spark.read.parquet(path).filter(member & ~matched)
    # Which hit partitions keep at least one row — computed BEFORE the
    # overwrite (the lazy plan reads the original files, which the write
    # below replaces). Both driver-side lists are bounded by the number of
    # affected partitions.
    survived = {
        r["k"]
        for r in survivors.select(F.col(part_col).cast("string").alias("k"))
        .distinct()
        .collect()
    }
    with_dyn = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        survivors.write.partitionBy(part_col).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", with_dyn)
    # Drop emptied partition directories through the Hadoop FS API — works
    # on any filesystem Spark writes to, not just local disk. The leaf is
    # rebuilt from Spark's OWN Cast-to-string rendering of the value
    # (collected above — NOT Python str(), which pads timestamp
    # microseconds, renders 5.0E10 as 50000000000.0, and title-cases
    # booleans) and then Hive-escaped exactly the way Spark escaped it
    # when writing (spaces, '/', ':' etc. become %XX). NULL and empty
    # string both land in __HIVE_DEFAULT_PARTITION__, matching
    # ExternalCatalogUtils.getPartitionValueString.
    emptied = [k for k in hit_keys if k not in survived]
    if emptied:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        for k in emptied:
            leaf = (
                "__HIVE_DEFAULT_PARTITION__"
                if k is None or k == ""
                else esc.escapePathName(k)
            )
            part = jvm.org.apache.hadoop.fs.Path(f"{path}/{part_col}={leaf}")
            part.getFileSystem(hconf).delete(part, True)


@register(
    "rel_delete_where_rewrite",
    oracle="""
SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, COUNT(*) AS n_remaining
FROM nation WHERE n_name NOT LIKE '%1'
GROUP BY CAST(n_regionkey AS BIGINT)
""",
    tags=("cdc", "source", "eager-io"),
)
def rel_delete_where_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE WHERE over a partitioned parquet table
    (the right-to-be-forgotten path every lakehouse needs without
    Delta/Iceberg): identify the partitions containing matching rows,
    rewrite ONLY those partitions with the surviving rows (dynamic
    partition overwrite), leave every untouched partition's files
    alone, then read the table back.

    Scale: the delete predicate prunes the rewrite to affected
    partitions — at 100 TB a user-id delete touches a handful of
    partitions, not the table; dynamic overwrite mode is the exact
    mechanism (spark.sql.sources.partitionOverwriteMode=dynamic means
    only partitions present in the written frame are replaced). The
    oracle is the logical post-delete table."""
    from ..sources.scratch import scratch_dir

    n = _t(spark, sf_dir, "nation").withColumn(
        "n_regionkey", F.col("n_regionkey").cast("long")
    )
    path = scratch_dir("delete_cow_")
    n.write.partitionBy("n_regionkey").mode("overwrite").parquet(path)
    copy_on_write_delete(
        spark, path, F.col("n_name").like("%1"), "n_regionkey"
    )
    return (
        spark.read.parquet(path)
        .groupBy(F.col("n_regionkey").cast("long").alias("n_regionkey"))
        .agg(F.count(F.lit(1)).alias("n_remaining"))
    )


# ---------------------------------------------------------------------------
# Matryoshka embeddings + ANN quality evaluation
# ---------------------------------------------------------------------------

_TRUNC_DIMS = 16


@register(
    "emb_matryoshka_truncate",
    oracle=f"""
WITH s AS (
  SELECT vec_id,
         list_reduce(list_prepend(0.0, list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b) AS ss_full,
         list_reduce(list_prepend(0.0, list_transform(embedding[1:{_TRUNC_DIMS}],
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b) AS ss16
  FROM embeddings
)
SELECT vec_id,
       ROUND(sqrt(ss_full), 4) AS norm_full,
       ROUND(sqrt(ss16), 4) AS norm_trunc,
       ROUND(sqrt(ss16 / ss_full), 4) AS cos_vs_full
FROM s
""",
    tags=("similarity", "array"),
)
def emb_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimensionality truncation QA: norms of the
    full vs first-16-dim embedding and the cosine between the full
    vector and its truncation (algebraically sqrt(ss16/ss_full)) — the
    per-vector report that tells you how much signal a cheaper prefix
    index retains before you build one.

    Scale: map-only higher-order expressions, index-order folds on
    both engines (no sort needed: both fold the array left-to-right).
    """
    e = _t(spark, sf_dir, "embeddings")
    emb = as_double("embedding")
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    ss_full = sq(emb)
    ss16 = sq(F.slice(emb, 1, _TRUNC_DIMS))
    return e.select(
        "vec_id",
        F.round(F.sqrt(ss_full), 4).alias("norm_full"),
        F.round(F.sqrt(ss16), 4).alias("norm_trunc"),
        F.round(F.sqrt(ss16 / ss_full), 4).alias("cos_vs_full"),
    )


_RECALL_K = 5
_RECALL_NQ = 10


@register(
    "emb_recall_eval",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < {_RECALL_NQ}),
e AS (SELECT vec_id, embedding FROM embeddings),
p AS (
  SELECT q.query_id, e.vec_id,
         list_reduce(list_prepend(0.0, list_transform(range(1, len(e.embedding) + 1),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))),
             (a, b) -> a + b)
           / sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))
           / sqrt(list_reduce(list_prepend(0.0, list_transform(q.qe,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))
           AS cos_full,
         list_reduce(list_prepend(0.0, list_transform(range(1, {_TRUNC_DIMS} + 1),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))),
             (a, b) -> a + b)
           / sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding[1:{_TRUNC_DIMS}],
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))
           / sqrt(list_reduce(list_prepend(0.0, list_transform(q.qe[1:{_TRUNC_DIMS}],
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))
           AS cos_trunc
  FROM q CROSS JOIN e
  WHERE q.query_id <> e.vec_id
),
r AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_full DESC, vec_id)
           AS rk_full,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_trunc DESC, vec_id)
           AS rk_trunc
  FROM p
)
SELECT query_id,
       COUNT(CASE WHEN rk_full <= {_RECALL_K} AND rk_trunc <= {_RECALL_K}
                  THEN 1 END) AS n_overlap,
       ROUND(COUNT(CASE WHEN rk_full <= {_RECALL_K} AND rk_trunc <= {_RECALL_K}
                        THEN 1 END) / {_RECALL_K}.0, 4) AS recall_at_k
FROM r GROUP BY query_id
""",
    tags=("similarity", "eval"),
)
def emb_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@5 of a truncated-dimension
    (matryoshka prefix) index against full-dimension brute force for a
    query sample — the measurement that decides whether the cheap
    index is good enough to deploy. This is the evaluation harness for
    every approximate method in operators/similarity.py, expressed as
    one plan.

    Scale: the query side is a small fixed sample — broadcast against
    the corpus, so the scan is map-only (O(n_queries * corpus), the
    honest brute-force eval cost); both rankings come from the same
    pass, then two per-query windows rank a corpus-sized but
    query-partitioned frame. The oracle is the identical computation
    in SQL (index-order folds, same tie-break)."""
    e = _t(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") < _RECALL_NQ)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    )
    emb = as_double("embedding")
    qe = as_double("qe")

    def _ss(c):
        return F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    pairs = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            (
                _dot(emb, qe) / F.sqrt(_ss(emb)) / F.sqrt(_ss(qe))
            ).alias("cos_full"),
            (
                _dot(F.slice(emb, 1, _TRUNC_DIMS), F.slice(qe, 1, _TRUNC_DIMS))
                / F.sqrt(_ss(F.slice(emb, 1, _TRUNC_DIMS)))
                / F.sqrt(_ss(F.slice(qe, 1, _TRUNC_DIMS)))
            ).alias("cos_trunc"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("cos_full"), "vec_id")
    wt = Window.partitionBy("query_id").orderBy(F.desc("cos_trunc"), "vec_id")
    r = pairs.select(
        "query_id",
        F.row_number().over(wf).alias("rk_full"),
        F.row_number().over(wt).alias("rk_trunc"),
    )
    both = (F.col("rk_full") <= _RECALL_K) & (F.col("rk_trunc") <= _RECALL_K)
    return r.groupBy("query_id").agg(
        F.count(F.when(both, 1)).alias("n_overlap"),
        F.round(F.count(F.when(both, 1)) / F.lit(float(_RECALL_K)), 4).alias(
            "recall_at_k"
        ),
    )


# ---------------------------------------------------------------------------
# Incremental re-crawl dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_incremental_batch",
    oracle="""
WITH batch AS (
  SELECT doc_id + 1000000 AS new_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS new_id, text || ' v2' FROM documents
  WHERE doc_id % 10 = 3
)
SELECT b.new_id,
       CASE WHEN MIN(d.doc_id) IS NULL THEN 'new' ELSE 'dup_of_base' END
         AS status,
       MIN(d.doc_id) AS dup_of
FROM batch b LEFT JOIN documents d ON b.text = d.text
GROUP BY b.new_id
""",
    tags=("dedup", "incremental"),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: a freshly crawled batch (simulated
    re-crawl — every 5th doc reappears verbatim under a new id, every
    10th arrives genuinely changed) is checked against the EXISTING
    corpus only. This is the shape continuous pipelines actually run:
    the daily delta dedups against the base index, never a full-corpus
    re-dedup.

    Scale: the join key is the 256-bit content digest, so the shuffle
    moves 32-byte keys instead of document bodies, and only
    batch-plus-matching-digest rows move at all; in production the
    base side is the persisted digest index (bucketed on digest), so
    the probe prunes to matching buckets. Raw-text equality is kept in
    the join condition to resolve (astronomically unlikely) digest
    collisions exactly like the oracle's text join."""
    d = _docs(spark, sf_dir)
    batch = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 1000000).alias("new_id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 10 == 3).select(
                (F.col("doc_id") + 2000000).alias("new_id"),
                F.concat("text", F.lit(" v2")).alias("text"),
            )
        )
        .withColumn("dg", F.sha2("text", 256))
    )
    base = d.select("doc_id", F.col("text").alias("btext")).withColumn(
        "dg", F.sha2("btext", 256)
    )
    j = batch.join(
        base, (batch.dg == base.dg) & (batch.text == base.btext), "left"
    )
    return j.groupBy("new_id").agg(
        F.when(F.min("doc_id").isNull(), F.lit("new"))
        .otherwise(F.lit("dup_of_base"))
        .alias("status"),
        F.min("doc_id").alias("dup_of"),
    )


# ---------------------------------------------------------------------------
# BPE vocabulary application (encode)
# ---------------------------------------------------------------------------


@register("doc_bpe_encode", oracle=None, tags=("text", "tokenizer"))
def doc_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a trained BPE vocabulary to the corpus — the encode half
    of the round-3 ``doc_bpe_vocab`` train step: per document, the
    token count under the learned merges and the compression vs
    whitespace/character tokenization. Rows-only (the encoder is
    procedural); tests/test_governance.py pins every distinct word's
    encoding against the sequential reference encoder.

    Scale: merges are trained once and broadcast (KiB); ENCODING runs
    at distinct-word cardinality (the same vocabulary-histogram trick
    as training — a word's encoding doesn't depend on its context), as
    an Arrow-batched pandas UDF, then token counts re-attach to docs
    through a word join that AQE plans as broadcast when the vocab is
    small. Corpus volume only ever flows through the narrow
    (doc_id, word) explode."""
    from ..operators.bpe import encode_words, train_bpe

    d = _docs(spark, sf_dir)
    merges, _ = train_bpe(d, n_merges=20)

    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    encoded = encode_words(words, merges)  # (word, n_bpe_tokens)

    doc_words = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.length("text").alias("n_chars"),
        F.explode(F.split("text", " ")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        doc_words.join(encoded, "word")
        .groupBy("doc_id", "n_ws_tokens", "n_chars")
        .agg(F.sum("n_bpe_tokens").alias("n_bpe_tokens"))
        .select(
            "doc_id",
            "n_ws_tokens",
            "n_bpe_tokens",
            F.round(F.col("n_chars") / F.col("n_bpe_tokens"), 4).alias(
                "chars_per_token"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Sequence analytics: gaps & islands
# ---------------------------------------------------------------------------


@register(
    "events_activity_streaks",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day_n
  FROM events
),
i AS (
  SELECT user_id, day_n,
         day_n - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_n)
           AS island
  FROM d
),
s AS (
  SELECT user_id, island, COUNT(*) AS streak_len
  FROM i GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
       COUNT(*) AS n_streaks,
       CAST(MAX(streak_len) AS BIGINT) AS longest_streak
FROM s GROUP BY user_id
""",
    tags=("analytics", "sequence"),
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, consecutive-active-day streaks via
    the classic day-number-minus-row-number island key — engagement
    streak length is the canonical sequence statistic every product
    analytics stack computes (and the same shape finds uptime islands
    in machine telemetry).

    Scale: distinct (user, day) first — the fact collapses to at most
    users x days rows before the window; then ONE shuffle on user_id
    that the island window, island grouping, and final per-user
    aggregate all reuse (same key, no further exchange)."""
    from ..functions.timeutil import epoch_us

    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.floor(epoch_us(F.col("ts")) / F.lit(86400_000_000)).alias("day_n"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_n")
    i = d.withColumn("island", F.col("day_n") - F.row_number().over(w))
    s = i.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return s.groupBy("user_id").agg(
        F.sum("streak_len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_len").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence
# ---------------------------------------------------------------------------


@register(
    "rel_basket_pairs_lift",
    oracle="""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM d),
pc AS (SELECT l_partkey, COUNT(*) AS n_part FROM d GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT p.part_a, p.part_b, p.n_ab,
       CAST(ca.n_part AS BIGINT) AS n_a,
       CAST(cb.n_part AS BIGINT) AS n_b,
       ROUND(p.n_ab * 1.0 * n.n_orders / (ca.n_part * cb.n_part), 4) AS lift
FROM pairs p
JOIN pc ca ON ca.l_partkey = p.part_a
JOIN pc cb ON cb.l_partkey = p.part_b
CROSS JOIN n
WHERE p.n_ab >= 2
""",
    tags=("analytics", "join"),
)
def rel_basket_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: part pairs co-ordered in >= 2
    orders with their lift (observed co-occurrence over the
    independence expectation) — the frequent-itemset primitive behind
    "customers also bought".

    Scale: pair generation is a self-equi-join on the BASKET key, so
    pairs only form inside one order (basket sizes are bounded — the
    classic a-priori shape; never a cross-part cartesian); the n_ab>=2
    support filter is the a-priori prune. Per-part supports and the
    1-row order total re-attach by broadcast joins — nothing reshuffles
    the pair table."""
    l = _t(spark, sf_dir, "lineitem")
    d = l.select("l_orderkey", "l_partkey").distinct()
    n = d.select(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    pc = d.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = d.alias("a")
    b = d.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    ca = pc.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a"))
    cb = pc.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.col("n_ab") * F.col("n_orders") / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus law fitting + lang-ID evaluation
# ---------------------------------------------------------------------------


@register(
    "doc_zipf_slope",
    oracle="""
WITH f AS (
  SELECT w AS word, COUNT(*) AS freq
  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
r AS (
  SELECT freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rnk
  FROM f
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(regr_slope(ln(freq), ln(rnk)), 4) AS zipf_slope,
       ROUND(regr_r2(ln(freq), ln(rnk)), 4) AS r2
FROM r
""",
    tags=("text", "stats"),
)
def doc_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: regression slope of
    log frequency on log rank (natural text sits near -1; synthetic or
    templated corpora deviate — a cheap corpus-health fingerprint the
    curation report includes).

    Scale: one explode + word count (map-side combined); the
    rank window and the 2-variable regression run at VOCABULARY
    cardinality. The global rank window is single-partition — but over
    the vocab table, not the corpus (vocabulary grows ~ O(corpus^0.5)
    by Heaps' law, so this stays driver-safe at 100 TB; for a
    trillion-token vocab you'd range-partition the rank like
    rel_zorder_key)."""
    d = _docs(spark, sf_dir)
    f = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), "word")
    r = f.select("freq", F.row_number().over(w).alias("rnk"))
    return r.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(F.log("freq"), F.log("rnk")), 4).alias(
            "zipf_slope"
        ),
        F.round(F.regr_r2(F.log("freq"), F.log("rnk")), 4).alias("r2"),
    )


@register(
    "doc_langid_confusion",
    oracle="""
WITH p AS (
  SELECT lang AS actual,
         CASE WHEN len(list_filter(string_split(text, ' '),
                   w -> w IN ('the', 'a', 'of', 'and', 'to'))) >= 1
              THEN 'en' ELSE 'und' END AS predicted
  FROM documents
)
SELECT actual, predicted, COUNT(*) AS n,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY actual), 4)
         AS frac_of_actual
FROM p GROUP BY actual, predicted
""",
    tags=("text", "eval"),
)
def doc_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of the stopword-vote
    lang-ID heuristic against the labeled lang column, with each
    cell's share of its actual-language row — the quality report that
    gates whether a classifier is good enough to route documents.

    Scale: grouped count at (actual, predicted) grain (map-side
    combined), then a window over the TINY matrix. The per-row
    prediction is a pure expression — the evaluation costs one
    aggregation pass."""
    d = _docs(spark, sf_dir)
    p = d.select(
        F.col("lang").alias("actual"),
        T.langid_guess("text").alias("predicted"),
    )
    c = p.groupBy("actual", "predicted").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("actual")
    return c.select(
        "actual",
        "predicted",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 4).alias("frac_of_actual"),
    )


# ---------------------------------------------------------------------------
# Safety filtering, RAG chunking, dataset cards
# ---------------------------------------------------------------------------

_BLOCKLIST = ("slow", "dup", "big")


@register(
    "doc_blocklist_filter",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         list_sort(list_distinct(list_filter(string_split(text, ' '),
             w -> w IN ('slow', 'dup', 'big')))) AS hits,
         len(list_filter(string_split(text, ' '),
             w -> w IN ('slow', 'dup', 'big'))) AS n_hits
  FROM documents
)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits,
       array_to_string(hits, ',') AS matched_terms
FROM m WHERE n_hits > 0
""",
    tags=("text", "governance"),
)
def doc_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety/blocklist term filter: flag documents containing any
    blocked term, with occurrence counts and the distinct matched
    terms — the policy-filter stage of corpus curation (the real list
    is thousands of terms; the mechanism — a per-row set intersection
    against a broadcast-small lexicon — is identical).

    Scale: pure higher-order expressions per row, no shuffle; a
    thousands-strong lexicon would become an `isin`/`array_intersect`
    against a literal array or a broadcast join on exploded words —
    either way corpus-linear."""
    d = _docs(spark, sf_dir)
    words = F.split("text", " ")
    hit_list = F.filter(words, lambda w: w.isin(*_BLOCKLIST))
    return (
        d.select(
            "doc_id",
            F.size(hit_list).cast("long").alias("n_hits"),
            F.array_join(
                F.array_sort(F.array_distinct(hit_list)), ","
            ).alias("matched_terms"),
        )
        .filter(F.col("n_hits") > 0)
    )


_RAG_WINDOW = 24
_RAG_STRIDE = 16


@register(
    "doc_chunk_sliding",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE doc_id <= 50
),
c AS (
  SELECT doc_id,
         UNNEST(range(0, GREATEST(1, CAST(ceil((len(words) - {_RAG_WINDOW - _RAG_STRIDE}) / {_RAG_STRIDE}.0) AS BIGINT))))
           AS chunk_id,
         UNNEST(list_transform(
             range(0, GREATEST(1, CAST(ceil((len(words) - {_RAG_WINDOW - _RAG_STRIDE}) / {_RAG_STRIDE}.0) AS BIGINT))),
             i -> array_to_string(
                 words[i*{_RAG_STRIDE}+1 : LEAST(i*{_RAG_STRIDE}+{_RAG_WINDOW}, len(words))],
                 ' '))) AS chunk
  FROM w
)
SELECT doc_id, chunk_id,
       CAST(chunk_id * {_RAG_STRIDE} AS BIGINT) AS start_word,
       len(string_split(chunk, ' ')) AS n_tokens,
       md5(chunk) AS md5_chunk
FROM c
""",
    tags=("text", "reshape"),
)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking (window {w}, stride {s} →
    {o}-word overlap) — the RAG/embedding-index chunker, as opposed to
    doc_chunk's disjoint training chunks: overlap preserves context
    across boundaries so retrieval never loses a sentence split in
    two. Chunk text is verified by md5 (byte-exact) without pushing
    long strings through the driver hash.

    Scale: one generate/explode per document (output is ~len/stride
    rows, each bounded by the window) — map-only, corpus-linear, the
    chunk table inherits the scan's partitioning."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") <= 50)
    words = F.split("text", " ")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(
            (F.size(words) - F.lit(_RAG_WINDOW - _RAG_STRIDE))
            / F.lit(float(_RAG_STRIDE))
        ).cast("long"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ",
            F.slice(
                words,
                i * _RAG_STRIDE + 1,
                F.least(
                    F.lit(_RAG_WINDOW),
                    F.size(words) - i * _RAG_STRIDE,
                ),
            ),
        ),
    )
    return (
        d.select(
            "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk")
        )
        .select(
            "doc_id",
            "chunk_id",
            (F.col("chunk_id") * _RAG_STRIDE).cast("long").alias("start_word"),
            F.size(F.split("chunk", " ")).alias("n_tokens"),
            F.md5("chunk").alias("md5_chunk"),
        )
    )


doc_chunk_sliding.__doc__ = doc_chunk_sliding.__doc__.format(
    w=_RAG_WINDOW, s=_RAG_STRIDE, o=_RAG_WINDOW - _RAG_STRIDE
)


@register(
    "doc_dataset_card",
    oracle="""
WITH per_lang AS (
  SELECT source, lang, COUNT(*) AS n
  FROM documents GROUP BY source, lang
),
plt AS (
  SELECT source, lang, n,
         SUM(n) OVER (PARTITION BY source) AS tot
  FROM per_lang
),
ent AS (
  SELECT source,
         CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         arg_max(lang, lpad(CAST(n AS VARCHAR), 10, '0') || '|' || lang)
           AS top_lang,
         ROUND(-list_reduce(list_prepend(0.0,
             list((n * 1.0 / tot) * ln(n * 1.0 / tot)
                  ORDER BY (n * 1.0 / tot) * ln(n * 1.0 / tot))),
             (a, b) -> a + b), 4) AS lang_entropy
  FROM plt GROUP BY source
),
tok AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
         ROUND(AVG(ROUND(0.5 * LEAST(1.0, len(string_split(text, ' ')) / 50.0)
             + 0.5 * (len(list_distinct(string_split(text, ' '))) * 1.0
                      / len(string_split(text, ' '))), 4)), 4) AS avg_quality
  FROM documents GROUP BY source
)
SELECT e.source, e.n_docs, t.total_tokens, t.avg_quality, e.n_langs,
       e.top_lang, e.lang_entropy
FROM ent e JOIN tok t USING (source)
""",
    tags=("governance", "agg"),
)
def doc_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card ("datasheets for datasets"): document
    and token counts, mean quality, language coverage with the
    dominant language, and the Shannon entropy of the language mix —
    the summary table published alongside every released corpus
    snapshot.

    Scale: two grouped aggregations ((source, lang) then source) plus
    one source-grain token/quality pass — all map-side combined; the
    entropy folds a value-sorted term list per the registry's
    order-dependent-sum convention."""
    from ..functions.timeutil import ordered_fold_sum

    d = _docs(spark, sf_dir)
    per_lang = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    wtot = Window.partitionBy("source")
    plt = per_lang.withColumn("tot", F.sum("n").over(wtot))
    p = F.col("n") / F.col("tot")
    ent = plt.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        # composite (count, lang) tie-break key as a zero-padded string
        # (DuckDB arg_max rejects struct ordering keys)
        F.max_by(
            "lang",
            F.concat(
                F.lpad(F.col("n").cast("string"), 10, "0"),
                F.lit("|"),
                F.col("lang"),
            ),
        ).alias("top_lang"),
        F.round(
            -ordered_fold_sum(F.collect_list(p * F.log(p))), 4
        ).alias("lang_entropy"),
    )
    tok = d.groupBy("source").agg(
        F.sum(T.token_count("text")).alias("total_tokens"),
        F.round(F.avg(T.quality_score("text")), 4).alias("avg_quality"),
    )
    return ent.join(tok, "source").select(
        "source",
        "n_docs",
        "total_tokens",
        "avg_quality",
        "n_langs",
        "top_lang",
        "lang_entropy",
    )


# ---------------------------------------------------------------------------
# Run-length state spans
# ---------------------------------------------------------------------------


@register(
    "events_state_spans",
    oracle="""
WITH o AS (
  SELECT user_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS brk
  FROM events
),
g AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY rn
                           ROWS UNBOUNDED PRECEDING) AS span_id
  FROM o
),
s AS (
  SELECT user_id, span_id, event_type AS state,
         COUNT(*) AS n_events,
         MAX(t) - MIN(t) AS span_seconds
  FROM g GROUP BY user_id, span_id, event_type
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(MAX(n_events) AS BIGINT) AS longest_span_events,
       CAST(MAX(span_seconds) AS BIGINT) AS longest_span_seconds,
       arg_max(state, lpad(CAST(n_events AS VARCHAR), 10, '0')
                      || '|' || CAST(span_id AS VARCHAR)) AS dominant_state
FROM s GROUP BY user_id
""",
    tags=("analytics", "sequence", "timeseries"),
)
def events_state_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of per-machine state sequences: consecutive
    identical states collapse into spans (break-flag + running-sum span
    ids — the RLE dual of the gaps-and-islands trick), then per-machine
    span statistics. This is how raw telemetry becomes
    operating-mode/alarm-duration analytics (time-in-state, longest
    uninterrupted run, dominant mode).

    Scale: one shuffle on the machine key; the lag window, the span-id
    running sum, the span grouping, and the per-machine rollup all
    reuse that single partitioning (plan-asserted). Span count is
    bounded by event count — no state blowup."""
    from ..functions.timeutil import epoch_us

    ev = _t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.floor(epoch_us(F.col("ts")) / 1_000_000).cast("long").alias("t"),
        F.row_number().over(wo).alias("rn"),
        F.when(
            ~F.lag("event_type")
            .over(wo)
            .eqNullSafe(F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    wg = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = o.withColumn("span_id", F.sum("brk").over(wg))
    s = g.groupBy("user_id", "span_id", F.col("event_type").alias("state")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("t") - F.min("t")).alias("span_seconds"),
    )
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("n_events").alias("longest_span_events"),
        F.max("span_seconds").alias("longest_span_seconds"),
        F.max_by(
            "state",
            F.concat(
                F.lpad(F.col("n_events").cast("string"), 10, "0"),
                F.lit("|"),
                F.col("span_id").cast("string"),
            ),
        ).alias("dominant_state"),
    )


# ---------------------------------------------------------------------------
# Arrow-native multimodal boundary
# ---------------------------------------------------------------------------


@register(
    "mm_bytes_arrow",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       ascii(text) AS first_byte,
       CAST(list_reduce(list_prepend(0,
            list_transform(range(1, length(text) + 1), i -> ascii(text[i]))),
            (a, b) -> a + b) AS BIGINT) AS byte_sum
FROM documents
""",
    tags=("multimodal", "arrow"),
)
def mm_bytes_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native payload statistics (``mapInArrow`` — the fourth
    Python-boundary API next to pandas_udf / applyInPandas /
    mapInPandas): byte length, first byte, and full byte sum computed
    directly on the Arrow buffers. The corpus is ASCII, so the DuckDB
    oracle reproduces the byte sum from character codes — upgrading
    the Arrow path from rows-only to hash-checked.

    Scale: map-only; the payload bytes cross the boundary once as
    Arrow buffers with no pandas object materialization."""
    from ..operators import multimodal as M

    d = M.attach_binary_payload(_docs(spark, sf_dir))
    return M.byte_stats_arrow(d)


# ---------------------------------------------------------------------------
# Spark 4 SQL surface: pipe syntax + transpose
# ---------------------------------------------------------------------------


@register(
    "rel_sql_pipe",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("sql", "agg"),
)
def rel_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 / GoogleSQL-style ``|>`` chaining): the
    Q1-shaped pricing rollup written as a linear pipeline — FROM |>
    WHERE |> EXTEND |> AGGREGATE ... GROUP BY — instead of
    inside-out nested SQL. Same Catalyst plan as the ANSI form; the
    oracle IS the ANSI form, proving the two surfaces are equivalent.

    Scale: identical to q1 — pushed date filter, partial+final hash
    aggregation on a 6-key grain."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        |> AGGREGATE COUNT(*) AS n,
                     SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
                     SUM(cents) AS revenue_cents
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n, sum_qty, revenue_cents
        """
    )


@register(
    "rel_transpose",
    oracle="""
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY lang
)
SELECT 'n_docs' AS key,
       (SELECT n_docs FROM c WHERE lang = 'de') AS de,
       (SELECT n_docs FROM c WHERE lang = 'en') AS en,
       (SELECT n_docs FROM c WHERE lang = 'es') AS es,
       (SELECT n_docs FROM c WHERE lang = 'fr') AS fr,
       (SELECT n_docs FROM c WHERE lang = 'zh') AS zh
UNION ALL
SELECT 'total_chars',
       (SELECT total_chars FROM c WHERE lang = 'de'),
       (SELECT total_chars FROM c WHERE lang = 'en'),
       (SELECT total_chars FROM c WHERE lang = 'es'),
       (SELECT total_chars FROM c WHERE lang = 'fr'),
       (SELECT total_chars FROM c WHERE lang = 'zh')
""",
    tags=("sql", "reshape"),
)
def rel_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (Spark 4): per-language corpus metrics
    flipped so metrics become rows and languages become columns — the
    report-orientation reshape analysts otherwise hand-roll with
    N stacked pivots. The index column must be ordered first: transpose
    derives its output column order from input row order.

    Scale note: transpose materializes one output column per input
    row, so it is a SMALL-AGGREGATE-only operator by construction (here
    5 language rows) — never applied to a fact table; the heavy lifting
    is the grouped aggregation that feeds it."""
    d = _docs(spark, sf_dir)
    c = (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )
    return c.transpose("lang")


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

_CMS_P = 2147483647  # 2^31 - 1 (Mersenne prime)
_CMS_W = 256
_CMS_HASHES = ((31, 7), (131, 13), (1009, 101), (8191, 911))  # (a, b) rows


@register(
    "rel_cms_freq_estimate",
    oracle=f"""
WITH rows_h AS (
  SELECT UNNEST(range(0, {len(_CMS_HASHES)})) AS hrow,
         UNNEST([{", ".join(str(a) for a, _ in _CMS_HASHES)}]) AS a,
         UNNEST([{", ".join(str(b) for _, b in _CMS_HASHES)}]) AS b
),
cms AS (
  SELECT hrow, ((a * l_partkey + b) % {_CMS_P}) % {_CMS_W} AS bucket,
         COUNT(*) AS c
  FROM lineitem CROSS JOIN rows_h
  GROUP BY hrow, ((a * l_partkey + b) % {_CMS_P}) % {_CMS_W}
),
probes AS (SELECT UNNEST(range(1, 11)) AS pk),
est AS (
  SELECT p.pk, MIN(c.c) AS estimate
  FROM probes p
  JOIN rows_h h ON TRUE
  JOIN cms c ON c.hrow = h.hrow
            AND c.bucket = ((h.a * p.pk + h.b) % {_CMS_P}) % {_CMS_W}
  GROUP BY p.pk
),
exact AS (
  SELECT l_partkey AS pk, COUNT(*) AS exact_n
  FROM lineitem WHERE l_partkey BETWEEN 1 AND 10 GROUP BY l_partkey
)
SELECT e.pk AS probe_key,
       CAST(COALESCE(x.exact_n, 0) AS BIGINT) AS exact_n,
       CAST(e.estimate AS BIGINT) AS estimate,
       CAST(e.estimate - COALESCE(x.exact_n, 0) AS BIGINT) AS overestimate
FROM est e LEFT JOIN exact x ON x.pk = e.pk
""",
    tags=("sketch", "agg"),
)
def rel_cms_freq_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation — the third mergeable
    sketch family next to HLL (distinct counts) and Misra-Gries (heavy
    hitters): d=4 arithmetic hash rows x w=256 buckets built in ONE
    map-side-combined aggregation, point queries answered as the
    minimum over the d probed cells. CMS never underestimates
    (overestimate >= 0 per row, asserted by the oracle's own algebra)
    and the whole sketch is ~4 KB regardless of input size — the
    re-aggregatable frequency state a 100 TB pipeline ships instead of
    raw keys. Hashing is polynomial mod a Mersenne prime (engine- and
    SQL-portable), so the DuckDB oracle reproduces the sketch cell for
    cell — a hash-checked sketch, not a rows-only one.

    Scale: the build shuffles (d x w) partial cells, not rows; probes
    join the KB-scale sketch broadcast-style."""
    l = _t(spark, sf_dir, "lineitem")
    rows_h = F.array(
        *[
            F.struct(
                F.lit(i).alias("hrow"), F.lit(a).alias("a"), F.lit(b).alias("b")
            )
            for i, (a, b) in enumerate(_CMS_HASHES)
        ]
    )
    cells = l.select(
        "l_partkey", F.explode(rows_h).alias("h")
    ).select(
        F.col("h.hrow").alias("hrow"),
        (
            (F.col("h.a") * F.col("l_partkey") + F.col("h.b")) % _CMS_P
            % _CMS_W
        ).alias("bucket"),
    )
    cms = cells.groupBy("hrow", "bucket").agg(F.count(F.lit(1)).alias("c"))
    probes = spark.range(1, 11).select(F.col("id").alias("pk"))
    hashes = probes.select(
        "pk", F.explode(rows_h).alias("h")
    ).select(
        "pk",
        F.col("h.hrow").alias("hrow"),
        (
            (F.col("h.a") * F.col("pk") + F.col("h.b")) % _CMS_P % _CMS_W
        ).alias("bucket"),
    )
    est = (
        hashes.join(cms, ["hrow", "bucket"])
        .groupBy("pk")
        .agg(F.min("c").alias("estimate"))
    )
    exact = (
        l.filter(F.col("l_partkey").between(1, 10))
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return est.join(exact, "pk", "left").select(
        F.col("pk").alias("probe_key"),
        F.coalesce("exact_n", F.lit(0)).alias("exact_n"),
        "estimate",
        (F.col("estimate") - F.coalesce("exact_n", F.lit(0))).alias(
            "overestimate"
        ),
    )


# ---------------------------------------------------------------------------
# Holt linear-trend forecast
# ---------------------------------------------------------------------------

_HOLT_ALPHA = 0.3
_HOLT_BETA = 0.1


@register(
    "ts_holt_linear",
    oracle=f"""
WITH b AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 100 AS v
  FROM events GROUP BY user_id, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600
),
s AS (
  SELECT user_id, list(v ORDER BY bucket) AS series FROM b GROUP BY user_id
),
f AS (
  -- accumulator is the 2-list [level, trend]: DuckDB 1.0 list_reduce
  -- mis-evaluates multi-field STRUCT accumulators whose merge
  -- references acc fields more than once, while list accumulators
  -- fold correctly (verified against the sequential reference)
  SELECT user_id, len(series) AS n_obs,
         list_reduce(
           list_prepend([series[1], CAST(0.0 AS DOUBLE)],
                        list_transform(series[2:], x -> [x, CAST(0.0 AS DOUBLE)])),
           (acc, e) -> [
               {_HOLT_ALPHA} * e[1] + {1 - _HOLT_ALPHA} * (acc[1] + acc[2]),
               {_HOLT_BETA} * ({_HOLT_ALPHA} * e[1]
                    + {1 - _HOLT_ALPHA} * (acc[1] + acc[2]) - acc[1])
                    + {1 - _HOLT_BETA} * acc[2]
           ]
         ) AS st
  FROM s
)
SELECT user_id, CAST(n_obs AS BIGINT) AS n_obs,
       ROUND(st[1], 4) AS level, ROUND(st[2], 4) AS trend,
       ROUND(st[1] + 1 * st[2], 4) AS forecast_1,
       ROUND(st[1] + 2 * st[2], 4) AS forecast_2,
       ROUND(st[1] + 3 * st[2], 4) AS forecast_3
FROM f
""",
    tags=("timeseries", "forecast"),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend) per
    machine over hourly means, with 1/2/3-step-ahead forecasts — the
    forecasting step the decomposition ops (STL, EWMA, CUSUM) feed in
    a predictive-maintenance stack: "where is this sensor heading next
    hour?".

    Determinism: hourly means come from EXACT integer-cent sums; the
    smoothing recursion folds the TIME-ORDERED series left-to-right —
    the same sequential arithmetic on both engines (DuckDB mirrors the
    fold with a struct accumulator), so level/trend/forecasts agree to
    the bit before edge rounding.

    Scale: one shuffle to hourly grain (map-side combined), one to the
    machine grain; each machine's series is bounded by the time range
    (hours), so the per-key fold is small-state and embarrassingly
    parallel across machines — the standard shape for fleet-wide
    per-entity model fitting."""
    from ..functions.timeutil import epoch_bucket

    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    b = ev.groupBy(
        "user_id", epoch_bucket(F.col("ts"), 3600).alias("bucket")
    ).agg(
        (F.sum(cents).cast("double") / F.count(F.lit(1)) / 100).alias("v")
    )
    s = b.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("bucket", "v"))).alias("sb")
    ).select(
        "user_id",
        F.transform("sb", lambda e: e["v"]).alias("series"),
    )
    a, bt = _HOLT_ALPHA, _HOLT_BETA
    init = F.struct(
        F.element_at("series", 1).alias("l"),
        F.lit(0.0).alias("t"),
    )
    rest = F.slice(
        "series", 2, F.greatest(F.size("series") - 1, F.lit(0))
    )
    new_l = lambda acc, x: a * x + (1 - a) * (acc["l"] + acc["t"])  # noqa: E731
    st = F.aggregate(
        rest,
        init,
        lambda acc, x: F.struct(
            new_l(acc, x).alias("l"),
            (bt * (new_l(acc, x) - acc["l"]) + (1 - bt) * acc["t"]).alias("t"),
        ),
    )
    f = s.select(
        "user_id",
        F.size("series").cast("long").alias("n_obs"),
        st.alias("st"),
    )
    return f.select(
        "user_id",
        "n_obs",
        F.round(F.col("st.l"), 4).alias("level"),
        F.round(F.col("st.t"), 4).alias("trend"),
        F.round(F.col("st.l") + 1 * F.col("st.t"), 4).alias("forecast_1"),
        F.round(F.col("st.l") + 2 * F.col("st.t"), 4).alias("forecast_2"),
        F.round(F.col("st.l") + 3 * F.col("st.t"), 4).alias("forecast_3"),
    )


# ---------------------------------------------------------------------------
# Weighted median
# ---------------------------------------------------------------------------


@register(
    "rel_weighted_median",
    oracle="""
WITH g AS (
  SELECT l_returnflag, l_quantity AS q,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY l_returnflag, l_quantity
),
c AS (
  SELECT l_returnflag, q, w,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY q
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
  FROM g
)
SELECT l_returnflag,
       MIN(q) AS weighted_median_qty,
       CAST(MIN(tot) AS BIGINT) AS total_weight_cents
FROM c WHERE cum * 2 >= tot
GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def rel_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median — the quantile that weighted reservoirs and
    mixture-reweighting pipelines actually need (each quantity row
    weighted by its revenue in exact integer cents): the smallest
    value whose cumulative weight reaches half the total.

    Determinism: weights are exact integer cents and the crossing test
    is integer arithmetic (cum*2 >= tot — no division), so engines
    agree exactly. Scale: pre-aggregate to (group, value) grain first
    (map-side combined — the value domain, not the fact, enters the
    window), then one running-sum window per group."""
    l = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    g = l.groupBy("l_returnflag", F.col("l_quantity").alias("q")).agg(
        F.sum(cents).alias("w")
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "q",
        F.sum("w").over(wc).alias("cum"),
        F.sum("w").over(wt).alias("tot"),
    )
    return (
        c.filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("q").alias("weighted_median_qty"),
            F.min("tot").alias("total_weight_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Spatial grid join
# ---------------------------------------------------------------------------

_GEO_CELL = 2.0  # grid cell size in degrees; must be >= the radius
_GEO_RADIUS = 2.0  # neighborhood radius in degrees


@register(
    "rel_spatial_grid_join",
    oracle=f"""
WITH p AS (
  SELECT s_suppkey AS id,
         CAST((s_suppkey * 73 % 1600) AS DOUBLE) / 10 - 80 AS lat,
         CAST((s_suppkey * 131 % 3600) AS DOUBLE) / 10 - 180 AS lon
  FROM supplier
),
g AS (
  SELECT *, CAST(FLOOR(lat / {_GEO_CELL}) AS BIGINT) AS cx,
            CAST(FLOOR(lon / {_GEO_CELL}) AS BIGINT) AS cy
  FROM p
),
probe AS (
  SELECT g.*, cx + dx.d AS px, cy + dy.d AS py
  FROM g, (SELECT UNNEST([-1, 0, 1]) AS d) dx, (SELECT UNNEST([-1, 0, 1]) AS d) dy
)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(sqrt((a.lat - b.lat) * (a.lat - b.lat)
                + (a.lon - b.lon) * (a.lon - b.lon)), 4) AS dist_deg
FROM probe a JOIN g b ON a.px = b.cx AND a.py = b.cy AND a.id < b.id
WHERE (a.lat - b.lat) * (a.lat - b.lat)
    + (a.lon - b.lon) * (a.lon - b.lon) <= {_GEO_RADIUS} * {_GEO_RADIUS}
""",
    tags=("spatial", "join"),
)
def rel_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join via grid bucketing — the canonical
    distributed spatial pattern (geohash/S2 cells at production scale):
    each point lands in one grid cell, the probe side fans out to its
    3x3 cell neighborhood, candidates meet through an EQUI-join on the
    cell key, and the exact distance predicate prunes the corners.
    With cell size >= radius the 3x3 neighborhood is lossless, and each
    qualifying pair meets exactly once per covering cell (dedup-free
    because the build side keeps its own cell only).

    Coordinates are synthesized deterministically from supplier keys by
    modular arithmetic, and the metric is planar-degree euclidean —
    pure arithmetic end to end, so both engines agree exactly (no libm
    trig divergence). Scale: shuffle on well-distributed cell ids; the
    quadratic term is bounded per cell — same complexity shape as the
    banded LSH joins."""
    s = _t(spark, sf_dir, "supplier")
    p = s.select(
        F.col("s_suppkey").alias("id"),
        ((F.col("s_suppkey") * 73 % 1600).cast("double") / 10 - 80).alias("lat"),
        ((F.col("s_suppkey") * 131 % 3600).cast("double") / 10 - 180).alias(
            "lon"
        ),
    )
    g = p.select(
        "*",
        F.floor(F.col("lat") / _GEO_CELL).alias("cx"),
        F.floor(F.col("lon") / _GEO_CELL).alias("cy"),
    )
    d = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    probe = (
        g.select("*", d.alias("dx"))
        .select("*", d.alias("dy"))
        .select(
            "id",
            "lat",
            "lon",
            (F.col("cx") + F.col("dx")).alias("px"),
            (F.col("cy") + F.col("dy")).alias("py"),
        )
    )
    a, b = probe.alias("a"), g.alias("b")
    dd = (F.col("a.lat") - F.col("b.lat")) * (
        F.col("a.lat") - F.col("b.lat")
    ) + (F.col("a.lon") - F.col("b.lon")) * (F.col("a.lon") - F.col("b.lon"))
    return (
        a.join(
            b,
            (F.col("a.px") == F.col("b.cx"))
            & (F.col("a.py") == F.col("b.cy"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(dd <= _GEO_RADIUS * _GEO_RADIUS)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(F.sqrt(dd), 4).alias("dist_deg"),
        )
    )


# ---------------------------------------------------------------------------
# Record linkage (entity resolution)
# ---------------------------------------------------------------------------


@register(
    "rel_record_linkage",
    oracle="""
WITH c AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
)
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS name_lev,
       ABS(a.bal_cents - b.bal_cents) AS bal_diff_cents,
       (levenshtein(a.c_name, b.c_name) <= 1
        AND ABS(a.bal_cents - b.bal_cents) <= 50000) AS is_match
FROM c a JOIN c b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
""",
    tags=("linkage", "join"),
)
def rel_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (entity resolution) in the Fellegi–Sunter shape:
    BLOCK on cheap exact keys (nation × market segment), generate
    candidate pairs only inside blocks, score each candidate on
    per-field agreement (name edit distance, balance proximity in
    exact cents), and decide matches by the agreement rule. This is
    the structured-record dual of the document near-dup operators —
    the blocking join bounds the quadratic term exactly like LSH
    bands bound it for text.

    Scale: candidates form through an equi-join on the block key
    (shuffle on well-distributed composites); the edit-distance scan
    runs only on in-block pairs. Skewed blocks would get the salted
    join from operators/skew.py."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    # Spread the PROBE side (r17): customer is broadcast-sized, so this
    # plans as a broadcast join whose streamed side is the 1-partition
    # local scan — every in-block levenshtein then ran on one core
    # (measured 6.1 s at sf0.1; ~0.8 s spread). No-op at real scale.
    a, b = spread(c).alias("a"), c.alias("b")
    lev = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    bal = F.abs(F.col("a.bal_cents") - F.col("b.bal_cents"))
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter(lev <= 2)
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
            lev.cast("long").alias("name_lev"),
            bal.alias("bal_diff_cents"),
            ((lev <= 1) & (bal <= 50000)).alias("is_match"),
        )
    )


# ---------------------------------------------------------------------------
# Last-touch attribution
# ---------------------------------------------------------------------------

_ATTR_WINDOW_S = 3 * 86400  # 3-day lookback


@register(
    "events_last_touch_attribution",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type, event_id,
         CAST(FLOOR(epoch(ts) * 1000000) AS BIGINT) AS ts_us
  FROM events
),
t AS (
  SELECT *,
         MAX(CASE WHEN event_type IN ('click', 'view')
                  THEN lpad(CAST(ts_us AS VARCHAR), 20, '0') || '|'
                       || lpad(CAST(event_id AS VARCHAR), 12, '0') || '|'
                       || event_type END)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch
  FROM e
),
p AS (
  SELECT CASE
           WHEN last_touch IS NOT NULL
                AND ts_us - CAST(string_split(last_touch, '|')[1] AS BIGINT)
                    <= {_ATTR_WINDOW_S}::BIGINT * 1000000
           THEN string_split(last_touch, '|')[3]
           ELSE 'organic'
         END AS channel
  FROM t WHERE event_type = 'purchase'
)
SELECT channel, COUNT(*) AS n_conversions FROM p GROUP BY channel
""",
    tags=("analytics", "attribution"),
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent click/view within a 3-day lookback, else
    counted as organic — the conversion-credit primitive of every
    growth-analytics stack (first/linear/time-decay models are the
    same plan with a different pick over the touch window).

    The running "latest touch" is a window MAX over a zero-padded
    (timestamp, event_id, type) composite string — LOCF of the latest
    qualifying row without a self-join, same single-shuffle shape as
    the engine's as-of join. Scale: one shuffle on user_id; the
    attribution aggregate is at channel grain."""
    from ..functions.timeutil import epoch_us

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_type",
        "event_id",
        epoch_us(F.col("ts")).alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_key = F.when(
        F.col("event_type").isin("click", "view"),
        F.concat(
            F.lpad(F.col("ts_us").cast("string"), 20, "0"),
            F.lit("|"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
            F.lit("|"),
            F.col("event_type"),
        ),
    )
    t = e.withColumn("last_touch", F.max(touch_key).over(w))
    touch_ts = F.split("last_touch", "\\|").getItem(0).cast("long")
    channel = F.when(
        F.col("last_touch").isNotNull()
        & (F.col("ts_us") - touch_ts <= _ATTR_WINDOW_S * 1_000_000),
        F.split("last_touch", "\\|").getItem(2),
    ).otherwise(F.lit("organic"))
    return (
        t.filter(F.col("event_type") == "purchase")
        .select(channel.alias("channel"))
        .groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n_conversions"))
    )


# ---------------------------------------------------------------------------
# Capped running balance (non-linear recursion)
# ---------------------------------------------------------------------------


@register(
    "rel_capped_running_balance",
    oracle="""
WITH d AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts) * 1000000) AS BIGINT) AS ts_us, event_id,
         CASE WHEN event_type IN ('purchase', 'signup', 'view')
              THEN CAST(ROUND(value * 100) AS BIGINT)
              ELSE -CAST(ROUND(value * 100) AS BIGINT) END AS delta
  FROM events
),
s AS (
  SELECT user_id,
         list(delta ORDER BY ts_us, event_id) AS deltas
  FROM d GROUP BY user_id
),
f AS (
  SELECT user_id, len(deltas) AS n_events,
         list_reduce(
           list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                        list_transform(deltas, x -> [x, CAST(0 AS BIGINT)])),
           (acc, e) -> [
             GREATEST(CAST(0 AS BIGINT), acc[1] + e[1]),
             acc[2] + CASE WHEN acc[1] + e[1] < 0 THEN 1 ELSE 0 END
           ]) AS st
  FROM s
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       st[1] AS final_balance_cents,
       st[2] AS n_floor_hits
FROM f
""",
    tags=("analytics", "fold"),
)
def rel_capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floored running balance — the canonical NON-LINEAR window
    recursion (balance = max(0, balance + delta)) that plain SQL
    window sums cannot express, because the clip at zero breaks
    linearity: credits consumed at the floor don't carry. Positive
    event types credit value, negative ones debit it; per account the
    final balance and the number of times the floor clipped.

    Mechanism: the ordered per-key delta sequence folds left-to-right
    with a [balance, floor_hits] accumulator — exact integer cents, so
    both engines agree bit-for-bit (DuckDB mirrors with a list
    accumulator, same pattern as ts_holt_linear). Scale: one shuffle
    to key grain; per-key state is two integers, series bounded by the
    key's event count — the standard fleet-wide sequential-scan shape
    (the streaming dual is the applyInPandasWithState alarm machine)."""
    from ..functions.timeutil import epoch_us

    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    d = ev.select(
        "user_id",
        epoch_us(F.col("ts")).alias("ts_us"),
        "event_id",
        F.when(
            F.col("event_type").isin("purchase", "signup", "view"), cents
        )
        .otherwise(-cents)
        .alias("delta"),
    )
    s = d.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts_us", "event_id", "delta"))
        ).alias("sd")
    ).select(
        "user_id", F.transform("sd", lambda e: e["delta"]).alias("deltas")
    )
    st = F.aggregate(
        "deltas",
        F.array(F.lit(0).cast("long"), F.lit(0).cast("long")),
        lambda acc, x: F.array(
            F.greatest(F.lit(0).cast("long"), F.element_at(acc, 1) + x),
            F.element_at(acc, 2)
            + F.when(F.element_at(acc, 1) + x < 0, 1).otherwise(0),
        ),
    )
    return s.select(
        "user_id",
        F.size("deltas").cast("long").alias("n_events"),
        F.element_at(st, 1).alias("final_balance_cents"),
        F.element_at(st, 2).alias("n_floor_hits"),
    )


# ---------------------------------------------------------------------------
# FIFO lot allocation
# ---------------------------------------------------------------------------


@register(
    "rel_fifo_allocation",
    oracle="""
WITH lots AS (
  -- the fixture carries duplicate (orderkey, linenumber) rows; the lot
  -- grain must be unique or cumulative intervals overlap
  SELECT l_partkey, l_orderkey, l_linenumber,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey, l_orderkey, l_linenumber
),
s AS (
  SELECT l_partkey, l_orderkey, l_linenumber, qty,
         CAST(SUM(qty)
              OVER (PARTITION BY l_partkey ORDER BY l_orderkey, l_linenumber
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
  FROM lots WHERE l_orderkey % 2 = 0
),
d AS (
  SELECT l_partkey, l_orderkey, l_linenumber, qty,
         CAST(SUM(qty)
              OVER (PARTITION BY l_partkey ORDER BY l_orderkey, l_linenumber
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
  FROM lots WHERE l_orderkey % 2 = 1
)
SELECT s.l_partkey AS partkey,
       s.l_orderkey AS supply_order, s.l_linenumber AS supply_line,
       d.l_orderkey AS demand_order, d.l_linenumber AS demand_line,
       LEAST(s.hi, d.hi) - GREATEST(s.hi - s.qty, d.hi - d.qty) AS alloc_qty
FROM s JOIN d
  ON s.l_partkey = d.l_partkey
 AND s.hi - s.qty < d.hi
 AND d.hi - d.qty < s.hi
""",
    tags=("analytics", "join", "window"),
)
def rel_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot allocation as SET algebra, not a sequential scan:
    supply lots and demand lines (even/odd orders stand in for
    receipts/issues) each get cumulative-quantity intervals
    [hi - qty, hi) per part; FIFO matching IS interval overlap —
    allocation = min(hi) - max(lo) for every overlapping
    (supply, demand) pair. The classic running-totals formulation of
    inventory costing: what looks inherently sequential becomes two
    window passes and one range join.

    Determinism: quantities are integers, so the cumulative intervals
    and allocations are exact. Scale: both cumulative sides shuffle
    once on the part key, the overlap join is an equi-join on that
    same key with the interval condition as a join filter — per-part
    pair counts are bounded by lots x issues within the part (at
    extreme per-key volumes the interval-banding of
    rel_interval_join_banded applies)."""
    l = _t(spark, sf_dir, "lineitem")
    # unique lot grain first: the fixture carries duplicate
    # (orderkey, linenumber) rows, and tied window rows would share a
    # cumulative endpoint, making the intervals overlap
    lots = l.groupBy("l_partkey", "l_orderkey", "l_linenumber").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty")
    )

    def cum(side):
        w = (
            Window.partitionBy("l_partkey")
            .orderBy("l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return side.select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "qty",
            F.sum("qty").over(w).alias("hi"),
        )

    s = cum(lots.filter(F.col("l_orderkey") % 2 == 0)).alias("s")
    d = cum(lots.filter(F.col("l_orderkey") % 2 == 1)).alias("d")
    s_lo = F.col("s.hi") - F.col("s.qty")
    d_lo = F.col("d.hi") - F.col("d.qty")
    return (
        s.join(
            d,
            (F.col("s.l_partkey") == F.col("d.l_partkey"))
            & (s_lo < F.col("d.hi"))
            & (d_lo < F.col("s.hi")),
        )
        .select(
            F.col("s.l_partkey").alias("partkey"),
            F.col("s.l_orderkey").alias("supply_order"),
            F.col("s.l_linenumber").alias("supply_line"),
            F.col("d.l_orderkey").alias("demand_order"),
            F.col("d.l_linenumber").alias("demand_line"),
            (
                F.least(F.col("s.hi"), F.col("d.hi"))
                - F.greatest(s_lo, d_lo)
            ).alias("alloc_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram + snapshot diff
# ---------------------------------------------------------------------------

_EQD_BUCKETS = 8


@register(
    "rel_equidepth_histogram",
    oracle=f"""
WITH r AS (
  SELECT l_extendedprice AS v,
         CAST(CEIL(cume_dist() OVER (ORDER BY l_extendedprice)
                   * {_EQD_BUCKETS}) AS BIGINT) AS bucket
  FROM lineitem
)
SELECT bucket, COUNT(*) AS n,
       ROUND(MIN(v), 4) AS lo, ROUND(MAX(v), 4) AS hi
FROM r GROUP BY bucket
""",
    tags=("agg", "stats"),
)
def rel_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (quantile buckets) — the statistics object
    cost-based optimizers actually build, vs rel_histogram's equi-width
    bins: every bucket holds ~1/{_EQD_BUCKETS} of the rows, so bucket
    boundaries ARE the octile values. Bucketing by
    ceil(cume_dist * k) rather than ntile keeps TIED values in one
    bucket deterministically (ntile splits ties by arbitrary row
    position, which no cross-engine oracle can reproduce).

    Scale: EXACT global cume_dist funnels the ordered data through a
    single window task — correct for the statistics-build sizes this
    runs on (samples, dimension columns), but NOT the 100 TB path. At
    fact scale the same histogram comes from approx_percentile
    boundaries (rel_approx_quantile) + a map-only range assignment;
    this operator is the exact-small twin, the way
    sim_topk_bruteforce is the labeled exact baseline for ANN."""
    l = _t(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice")
    r = l.select(
        F.col("l_extendedprice").alias("v"),
        F.ceil(F.cume_dist().over(w) * _EQD_BUCKETS).cast("long").alias(
            "bucket"
        ),
    )
    return r.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("v"), 4).alias("lo"),
        F.round(F.max("v"), 4).alias("hi"),
    )


@register(
    "rel_snapshot_diff",
    oracle="""
WITH v1 AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders WHERE o_orderkey % 101 <> 0
),
v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN '1-URGENT'
              ELSE o_orderpriority END AS o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders WHERE o_orderkey % 103 <> 0
)
SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
       CASE WHEN v1.o_orderkey IS NULL THEN 'I'
            WHEN v2.o_orderkey IS NULL THEN 'D'
            ELSE 'U' END AS op,
       v2.o_orderpriority AS new_priority,
       v2.price_cents AS new_price_cents
FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
   OR v1.o_orderpriority <> v2.o_orderpriority
   OR v1.price_cents <> v2.price_cents
""",
    tags=("cdc", "join"),
)
def rel_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the INVERSE of rel_changelog_apply: given two
    table versions (v2 deletes some keys, restores others, and bumps
    priorities), derive the minimal I/U/D change feed by a full outer
    join on the key with column-level change detection. This is how a
    lakehouse emits CDC from systems that only hand over snapshots.

    Scale: one shuffle join on the primary key (AQE-skew-safe);
    unchanged rows — the overwhelming majority in real diffs — are
    filtered before anything downstream sees them. Comparing on exact
    integer cents avoids float-equality noise in change detection."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v1 = o.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        "o_orderpriority",
        cents.alias("price_cents"),
    )
    v2 = o.filter(F.col("o_orderkey") % 103 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("1-URGENT"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        cents.alias("price_cents"),
    )
    a, b = v1.alias("a"), v2.alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    op = (
        F.when(F.col("a.o_orderkey").isNull(), "I")
        .when(F.col("b.o_orderkey").isNull(), "D")
        .otherwise("U")
    )
    changed = (
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.o_orderpriority") != F.col("b.o_orderpriority"))
        | (F.col("a.price_cents") != F.col("b.price_cents"))
    )
    return j.filter(changed).select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
            "o_orderkey"
        ),
        op.alias("op"),
        F.col("b.o_orderpriority").alias("new_priority"),
        F.col("b.price_cents").alias("new_price_cents"),
    )


# ---------------------------------------------------------------------------
# ML-ops: probability calibration + distributed model selection
# ---------------------------------------------------------------------------


@register("ml_isotonic_calibration", oracle=None, tags=("ml",))
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability calibration with isotonic regression — the
    post-training step that turns a classifier's raw scores into
    trustworthy probabilities (a forest's vote fraction is NOT a
    calibrated failure probability; maintenance scheduling needs one).
    Fits score -> label with a monotone non-decreasing step function
    (MLlib's distributed pool-adjacent-violators) on the seeded
    telemetry table and emits the calibration curve's knots.

    Rows-only (iterative solver); tests/test_governance.py gates
    monotonicity of the curve and calibration quality at the
    decision boundary. Scale: PAV parallelizes over sorted score
    partitions with boundary merging — MLlib's implementation, fed by
    a vectorized scoring pass."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.ml.regression import IsotonicRegression

    from ..ml.anomaly import train
    from ..sources.generator import historical_telemetry

    h = historical_telemetry(spark)
    model = train(h)  # pipeline includes its own assembler
    scored = model.transform(h).select(
        F.element_at(vector_to_array("probability"), 2).alias("score"),
        F.col("is_anomaly").cast("double").alias("label"),
    )
    # featuresCol accepts a scalar double column for isotonic fits
    iso = IsotonicRegression(
        featuresCol="score", labelCol="label", isotonic=True
    )
    im = iso.fit(scored)
    bounds = [float(x) for x in im.boundaries]
    preds = [float(x) for x in im.predictions]
    return spark.createDataFrame(
        [(i, b, p) for i, (b, p) in enumerate(zip(bounds, preds))],
        "knot int, score_boundary double, calibrated_p double",
    )


@register("ml_cv_model_selection", oracle=None, tags=("ml",))
def ml_cv_model_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed model selection: 3-fold cross-validation over a
    small RandomForest hyperparameter grid (trees x depth) on the
    seeded telemetry table, reporting mean F1 per candidate — the
    MLlib tuning surface (CrossValidator folds the data once and
    evaluates every param map per fold, with fold fitting distributed
    across the cluster).

    Rows-only; the gate asserts the winning candidate reaches the
    reference's 1.00 quality (the classes are separable, so tuning
    must find it) and that every candidate/fold ran. Scale:
    CrossValidator(parallelism=4) fits candidate models concurrently;
    each fit is itself a distributed MLlib job."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    from ..sources.generator import historical_telemetry

    h = historical_telemetry(spark)
    feats = VectorAssembler(
        inputCols=["temperature", "vibration"], outputCol="features"
    ).transform(h)
    rf = RandomForestClassifier(
        labelCol="is_anomaly", featuresCol="features", seed=42
    )
    grid = (
        ParamGridBuilder()
        .addGrid(rf.numTrees, [5, 20])
        .addGrid(rf.maxDepth, [3, 6])
        .build()
    )
    ev = MulticlassClassificationEvaluator(
        labelCol="is_anomaly", metricName="f1"
    )
    cv = CrossValidator(
        estimator=rf,
        estimatorParamMaps=grid,
        evaluator=ev,
        numFolds=3,
        parallelism=4,
        seed=42,
    )
    cvm = cv.fit(feats)
    rows = [
        (
            int(pm[rf.numTrees]),
            int(pm[rf.maxDepth]),
            round(float(m), 6),
            bool(i == int(max(range(len(cvm.avgMetrics)), key=lambda j: cvm.avgMetrics[j]))),
        )
        for i, (pm, m) in enumerate(zip(grid, cvm.avgMetrics))
    ]
    return spark.createDataFrame(
        rows, "num_trees int, max_depth int, mean_f1 double, is_best boolean"
    )


# ---------------------------------------------------------------------------
# Population stability index (data drift)
# ---------------------------------------------------------------------------

_PSI_BUCKETS = 10
_PSI_MAX = 500.0  # fixture value range is [0, ~490]


@register(
    "events_psi_drift",
    oracle=f"""
WITH halves AS (
  SELECT event_type, value,
         CASE WHEN CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % 2 = 0
              THEN 'ref' ELSE 'cur' END AS period,
         LEAST({_PSI_BUCKETS - 1},
               CAST(FLOOR(value / {_PSI_MAX} * {_PSI_BUCKETS}) AS BIGINT))
           AS bucket
  FROM events
),
c AS (
  SELECT event_type, bucket,
         COUNT(CASE WHEN period = 'ref' THEN 1 END) + 1 AS n_ref,
         COUNT(CASE WHEN period = 'cur' THEN 1 END) + 1 AS n_cur
  FROM halves GROUP BY event_type, bucket
),
tot AS (
  SELECT c.*,
         SUM(n_ref) OVER (PARTITION BY event_type) AS t_ref,
         SUM(n_cur) OVER (PARTITION BY event_type) AS t_cur
  FROM c
),
term AS (
  SELECT event_type,
         (n_cur * 1.0 / t_cur - n_ref * 1.0 / t_ref)
           * ln((n_cur * 1.0 / t_cur) / (n_ref * 1.0 / t_ref)) AS t
  FROM tot
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       ROUND(list_reduce(list_prepend(0.0, list(t ORDER BY t)),
             (a, b) -> a + b), 4) AS psi
FROM term GROUP BY event_type
""",
    tags=("analytics", "drift", "mlops"),
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between even and odd
    days — THE production data-drift gate for deployed models (PSI
    < 0.1 stable, > 0.25 retrain): fixed-bin value distributions for
    the reference and current periods, psi = sum (p_cur - p_ref) *
    ln(p_cur / p_ref). Add-one smoothing keeps empty bins finite, the
    standard practice.

    Determinism: bucketing and counts are exact integers; ratio terms
    are identical double expressions; the final sum folds
    VALUE-SORTED terms (registry convention). Scale: one grouped count
    at (type, bucket) grain over the fact — the drift report costs a
    single partial-agg pass regardless of volume; windows run on the
    tiny bucket table."""
    from ..functions.timeutil import epoch_us

    ev = _t(spark, sf_dir, "events")
    day = F.floor(epoch_us(F.col("ts")) / F.lit(86400_000_000))
    bucket = F.least(
        F.lit(_PSI_BUCKETS - 1),
        F.floor(F.col("value") / _PSI_MAX * _PSI_BUCKETS).cast("long"),
    )
    halves = ev.select(
        "event_type",
        F.when(day % 2 == 0, "ref").otherwise("cur").alias("period"),
        bucket.alias("bucket"),
    )
    c = halves.groupBy("event_type", "bucket").agg(
        (F.count(F.when(F.col("period") == "ref", 1)) + 1).alias("n_ref"),
        (F.count(F.when(F.col("period") == "cur", 1)) + 1).alias("n_cur"),
    )
    wt = Window.partitionBy("event_type")
    tot = c.select(
        "*",
        F.sum("n_ref").over(wt).alias("t_ref"),
        F.sum("n_cur").over(wt).alias("t_cur"),
    )
    p_ref = F.col("n_ref") / F.col("t_ref")
    p_cur = F.col("n_cur") / F.col("t_cur")
    term = tot.select(
        "event_type", ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("t")
    )
    from ..functions.timeutil import ordered_fold_sum

    return term.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(ordered_fold_sum(F.collect_list("t")), 4).alias("psi"),
    )


# ---------------------------------------------------------------------------
# KS two-sample, Benford audit, time-to-convert
# ---------------------------------------------------------------------------


@register(
    "events_ks_two_sample",
    oracle="""
WITH s AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS v,
         CAST(user_id % 2 AS BIGINT) AS grp
  FROM events
),
c AS (
  SELECT event_type, v,
         COUNT(CASE WHEN grp = 0 THEN 1 END) AS na,
         COUNT(CASE WHEN grp = 1 THEN 1 END) AS nb
  FROM s GROUP BY event_type, v
),
cum AS (
  SELECT event_type, v,
         CAST(SUM(na) OVER w AS BIGINT) AS ca,
         CAST(SUM(nb) OVER w AS BIGINT) AS cb,
         CAST(SUM(na) OVER (PARTITION BY event_type) AS BIGINT) AS ta,
         CAST(SUM(nb) OVER (PARTITION BY event_type) AS BIGINT) AS tb
  FROM c
  WINDOW w AS (PARTITION BY event_type ORDER BY v ROWS UNBOUNDED PRECEDING)
)
SELECT event_type,
       ta AS n_a, tb AS n_b,
       ROUND(MAX(CASE WHEN ta > 0 AND tb > 0
                      THEN ABS(ca * 1.0 / ta - cb * 1.0 / tb) END), 4) AS ks_d
FROM cum GROUP BY event_type, ta, tb
""",
    tags=("analytics", "stats"),
)
def events_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov two-sample statistic per event type between
    the user-parity cohorts: D = max |ECDF_a - ECDF_b|, evaluated at
    every observed value — the nonparametric drift/equality test that
    complements the parametric Welch t (mean shift) and the binned PSI
    (distribution shift): KS catches shape changes the others miss.

    Determinism: values are quantized to exact integer cents, so the
    grouped counts, cumulative sums, and ECDF fractions are identical
    on both engines; the max over exact fractions needs no fold
    convention. Scale: one count at (type, value) grain collapses the
    fact to its value domain before the per-type cumulative window —
    the same value-domain trick as the weighted median."""
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
        (F.col("user_id") % 2).alias("grp"),
    )
    c = s.groupBy("event_type", "v").agg(
        F.count(F.when(F.col("grp") == 0, 1)).alias("na"),
        F.count(F.when(F.col("grp") == 1, 1)).alias("nb"),
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    cum = c.select(
        "event_type",
        F.sum("na").over(wc).alias("ca"),
        F.sum("nb").over(wc).alias("cb"),
        F.sum("na").over(wt).alias("ta"),
        F.sum("nb").over(wt).alias("tb"),
    )
    return cum.groupBy("event_type", F.col("ta").alias("n_a"), F.col("tb").alias("n_b")).agg(
        F.round(
            F.max(
                F.when(
                    (F.col("ta") > 0) & (F.col("tb") > 0),
                    F.abs(F.col("ca") / F.col("ta") - F.col("cb") / F.col("tb")),
                )
            ),
            4,
        ).alias("ks_d")
    ).select("event_type", "n_a", "n_b", "ks_d")


@register(
    "rel_benford_digits",
    oracle="""
WITH d AS (
  SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
           AS digit
  FROM orders WHERE o_totalprice > 0
),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT c.digit, c.n,
       ROUND(c.n * 1.0 / t.total, 4) AS observed_p,
       ROUND(ln(1 + 1.0 / c.digit) / ln(10), 4) AS benford_p
FROM c CROSS JOIN t
""",
    tags=("analytics", "audit"),
)
def rel_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    classic forensic screen for fabricated numeric data (organically
    generated amounts follow P(d) = log10(1 + 1/d); synthetic or
    tampered ones usually don't, which is exactly what this corpus
    will show). Digits come from the exact integer-cents string, so
    both engines extract identical leading digits.

    Scale: one grouped count over the fact (9 groups), the expected
    distribution is a constant expression — audit cost is a single
    partial-agg scan."""
    o = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("long")
    c = (
        o.filter(F.col("o_totalprice") > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("total"), 4).alias("observed_p"),
        F.round(F.log(1 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)), 4).alias(
            "benford_p"
        ),
    )


@register(
    "events_finite_quarantine",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN value IS NOT NULL AND isnan(value)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
       CAST(SUM(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                          AND isinf(value)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_inf,
       CAST(SUM(CASE WHEN value IS NULL OR isfinite(value)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
FROM events
""",
    tags=("audit", "quality"),
)
def events_finite_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-finite-measure boundary audit over the events stream: how
    many rows a ``finite_split`` at the lake boundary would quarantine
    (NaN / ±Inf readings) vs pass clean (finite or NULL). Under the
    engine's default ANSI mode a single NaN reaching the exact-cents
    cast is a job-killing CAST_OVERFLOW in ~50 downstream catalog
    queries (measured by the r11 NaN/Inf audit), so this split is the
    documented ingestion step for dirty numeric feeds — the batch twin
    of the streaming PERMISSIVE-parse quarantine (reference parity
    O24, lambda_function.py's malformed-message drop). Operator:
    ``operators/quarantine.finite_split``; end-to-end contract (split
    makes the WHOLE catalog safe on poisoned fixtures) pinned in
    ``tests/test_naninf_inputs.py``.

    Scale: one aggregate scan; the disposition predicates are plain
    column expressions (no UDF, no shuffle beyond the single-row agg).
    """
    from ..operators.quarantine import nonfinite_pred

    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    is_nan = v.isNotNull() & F.isnan(v)
    is_inf = v.isNotNull() & ~F.isnan(v) & (F.abs(v) >= float("inf"))
    clean = ~nonfinite_pred(("value",))
    return ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(is_nan.cast("int")).cast("bigint").alias("n_nan"),
        F.sum(is_inf.cast("int")).cast("bigint").alias("n_inf"),
        F.sum(clean.cast("int")).cast("bigint").alias("n_clean"),
    )


# Every fixture table carrying measure columns (scalar doubles or
# float arrays) TODAY. Hardcoded in lockstep with the oracle SQL below
# — the UNION ALL branches can't be derived at runtime — and pinned by
# tests/test_naninf_inputs.py::test_lake_boundary_covers_every_measure_table,
# which reds the suite if a fixture table grows a measure column this
# list (and the oracle) doesn't cover.
LAKE_MEASURE_TABLES = (
    "customer",
    "embeddings",
    "events",
    "lineitem",
    "orders",
    "part",
    "supplier",
)

# Every fixture table — the replay-audit surface (at-least-once
# redelivery can duplicate rows in ANY table; hardcoded in lockstep
# with the lake_replay_audit oracle's UNION ALL branches and pinned
# against sources.tables.TABLES by tests/test_replay_inputs.py).
LAKE_TABLES_ALL = (
    "customer",
    "documents",
    "embeddings",
    "events",
    "lineitem",
    "nation",
    "orders",
    "part",
    "region",
    "supplier",
)


@register(
    "lake_finite_quarantine",
    oracle="""
SELECT table_name, n_rows, n_quarantined,
       n_rows - n_quarantined AS n_clean
FROM (
  SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COALESCE(SUM(CASE WHEN c_acctbal IS NOT NULL
                                 AND NOT isfinite(c_acctbal)
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_quarantined
  FROM customer
  UNION ALL
  SELECT 'embeddings', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN COALESCE(len(list_filter(embedding,
                  e -> e IS NOT NULL AND NOT isfinite(e))) > 0, FALSE)
                THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM embeddings
  UNION ALL
  SELECT 'events', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN value IS NOT NULL
                                 AND NOT isfinite(value)
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN
              (l_quantity IS NOT NULL AND NOT isfinite(l_quantity))
           OR (l_extendedprice IS NOT NULL
               AND NOT isfinite(l_extendedprice))
           OR (l_discount IS NOT NULL AND NOT isfinite(l_discount))
           OR (l_tax IS NOT NULL AND NOT isfinite(l_tax))
                THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'orders', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL
                                 AND NOT isfinite(o_totalprice)
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'part', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN p_retailprice IS NOT NULL
                                 AND NOT isfinite(p_retailprice)
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM part
  UNION ALL
  SELECT 'supplier', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN s_acctbal IS NOT NULL
                                 AND NOT isfinite(s_acctbal)
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM supplier
)
ORDER BY table_name
""",
    tags=("audit", "quality"),
)
def lake_finite_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-lake non-finite boundary audit: per table, how many rows a
    ``finite_split`` at ingestion would quarantine vs pass clean —
    driver evidence that the boundary contract holds for EVERY table
    with measure columns, not just ``events``
    (``events_finite_quarantine``; the r11 verdict's residual: the
    other six tables relied on suite tests alone).

    The measure surface per table is DERIVED from the schema
    (``operators/quarantine.measure_columns`` — scalar doubles +
    float/double arrays), the same derivation the NaN/Inf audit uses to
    clean its poisoned fixture, so "the audit's recipe makes the
    catalog safe" and "the catalog's boundary entry watches that
    surface" are the same statement. ``LAKE_MEASURE_TABLES`` is pinned
    against the live fixtures by the audit suite.

    Scale: seven independent single-row aggregate scans (the
    disposition predicate is a plain pushable column expression — no
    UDF, no join), unioned driver-side; each scan parallelizes over its
    own table's partitions, so the whole audit is one wave of map-side
    aggregates at any corpus size.
    """
    from functools import reduce

    from ..operators.quarantine import measure_columns, nonfinite_pred

    frames = []
    for name in LAKE_MEASURE_TABLES:
        df = _t(spark, sf_dir, name)
        scalars, arrays = measure_columns(df)
        bad = nonfinite_pred(scalars, arrays)
        frames.append(
            df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.coalesce(F.sum(bad.cast("int")), F.lit(0))
                .cast("bigint")
                .alias("n_quarantined"),
            ).select(
                F.lit(name).alias("table_name"),
                "n_rows",
                "n_quarantined",
                (F.col("n_rows") - F.col("n_quarantined")).alias("n_clean"),
            )
        )
    return reduce(DataFrame.unionByName, frames).orderBy("table_name")


# The embedding model's output dimension — a DATA contract, not a
# schema property (array<float> carries no length). The fixture's
# modal size is pinned against this by tests/test_ragged_inputs.py;
# a new embedding model means changing this constant AND the oracle
# below together.
EMBEDDING_DIM = 64


@register(
    "lake_dim_quarantine",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CASE WHEN embedding IS NOT NULL
                               AND len(embedding) <> 64
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_quarantined,
       CAST(COUNT(*) AS BIGINT)
         - CAST(COALESCE(SUM(CASE WHEN embedding IS NOT NULL
                                   AND len(embedding) <> 64
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_clean
FROM embeddings
""",
    tags=("audit", "quality"),
)
def lake_dim_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension leg of the lake boundary: how many embedding rows a
    ``finite_split(array_dims={'embedding': EMBEDDING_DIM})`` would
    quarantine (vector length != the model's output dim; NULLs pass)
    vs keep. A ragged vector is poison, not noise (r12 ragged-embedding
    audit, ``tests/test_ragged_inputs.py``): 7 of the 16
    embedding-family catalog queries die on it — MLlib KMeans/PCA/LSH
    reject mismatched dims deep in Scala, PQ's numpy reshape throws,
    matryoshka truncation asserts — and the zip_with dot products that
    DO tolerate it return silently wrong similarities, which is worse.
    One length check at ingestion keeps the whole ANN/ML family free of
    per-query dim guards. Scale: one aggregate scan; ``size(col)`` is a
    header read, no element traversal.
    """
    from ..operators.quarantine import nonfinite_pred

    emb = _t(spark, sf_dir, "embeddings")
    bad = nonfinite_pred((), array_dims={"embedding": EMBEDDING_DIM})
    return emb.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.coalesce(F.sum(bad.cast("int")), F.lit(0))
        .cast("bigint")
        .alias("n_quarantined"),
    ).select(
        "n_rows",
        "n_quarantined",
        (F.col("n_rows") - F.col("n_quarantined")).alias("n_clean"),
    )


# Every fixture table carrying timestamp columns TODAY — hardcoded in
# lockstep with the oracle SQL below (same contract as
# LAKE_MEASURE_TABLES) and pinned against the live fixtures by
# tests/test_ts_inputs.py.
LAKE_TEMPORAL_TABLES = ("events", "lineitem", "orders")

# The lake's temporal plausibility window, [lo, hi). Chosen to contain
# every legitimate fixture timestamp (TPC-H dates are 1992-1998, events
# are contemporary) while excluding the two measured poison classes: a
# pre-window timestamp makes gap-bounded generators (hourly
# gap-fill/interpolation sequences) explode into ~70M-row jobs, and
# anything past Arrow's ns range (2262-04-11) kills every pandas-UDF
# path fed the column with ArrowInvalid.
PLAUSIBLE_TS_WINDOW = ("1970-01-01 00:00:00", "2100-01-01 00:00:00")


@register(
    "lake_temporal_quarantine",
    oracle="""
SELECT table_name, n_rows, n_quarantined,
       n_rows - n_quarantined AS n_clean
FROM (
  SELECT 'events' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COALESCE(SUM(CASE WHEN ts IS NOT NULL
                AND (ts < TIMESTAMP '1970-01-01'
                     OR ts >= TIMESTAMP '2100-01-01')
                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_quarantined
  FROM events
  UNION ALL
  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN l_shipdate IS NOT NULL
                AND (l_shipdate < TIMESTAMP '1970-01-01'
                     OR l_shipdate >= TIMESTAMP '2100-01-01')
                THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'orders', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NOT NULL
                AND (o_orderdate < TIMESTAMP '1970-01-01'
                     OR o_orderdate >= TIMESTAMP '2100-01-01')
                THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM orders
)
ORDER BY table_name
""",
    tags=("audit", "quality"),
)
def lake_temporal_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal twin of ``lake_finite_quarantine``: per table, how many
    rows a timestamp-plausibility ``finite_split`` at ingestion would
    quarantine (timestamps outside ``PLAUSIBLE_TS_WINDOW``) vs pass
    clean. A corrupt timestamp is POISON, not noise (r12
    extreme-timestamp audit, ``tests/test_ts_inputs.py``): a year-1900
    or year-9999 row turns every gap-bounded generator downstream
    (hourly gap-fill, linear interpolation — their ``sequence``
    explodes span the full range) into a job that never finishes, and
    anything past Arrow's nanosecond ceiling (2262-04-11) kills every
    ``pandas_udf``/``applyInPandas`` path fed the column with
    ArrowInvalid. Validating once at the boundary keeps 300 downstream
    queries free of per-query range guards — the same argument as the
    non-finite split.

    Temporal surface is schema-derived
    (``operators/quarantine.temporal_columns``); the table list is
    pinned against live fixtures by the audit suite. Scale: three
    single-row aggregate scans over pushable range predicates.
    """
    from functools import reduce

    from ..operators.quarantine import nonfinite_pred, temporal_columns

    lo, hi = PLAUSIBLE_TS_WINDOW
    frames = []
    for name in LAKE_TEMPORAL_TABLES:
        df = _t(spark, sf_dir, name)
        bad = nonfinite_pred(
            (), ts_bounds={c: (lo, hi) for c in temporal_columns(df)}
        )
        frames.append(
            df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.coalesce(F.sum(bad.cast("int")), F.lit(0))
                .cast("bigint")
                .alias("n_quarantined"),
            ).select(
                F.lit(name).alias("table_name"),
                "n_rows",
                "n_quarantined",
                (F.col("n_rows") - F.col("n_quarantined")).alias("n_clean"),
            )
        )
    return reduce(DataFrame.unionByName, frames).orderBy("table_name")


@register(
    "lake_replay_audit",
    oracle="""
SELECT table_name, n_rows, n_distinct, n_rows - n_distinct AS n_replayed
FROM (
  SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM customer)) AS BIGINT) AS n_distinct FROM customer
  UNION ALL
  SELECT 'documents', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM documents)) AS BIGINT) FROM documents
  UNION ALL
  SELECT 'embeddings', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM embeddings)) AS BIGINT) FROM embeddings
  UNION ALL
  SELECT 'events', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM events)) AS BIGINT) FROM events
  UNION ALL
  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM lineitem)) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'nation', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM nation)) AS BIGINT) FROM nation
  UNION ALL
  SELECT 'orders', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM orders)) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'part', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM part)) AS BIGINT) FROM part
  UNION ALL
  SELECT 'region', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM region)) AS BIGINT) FROM region
  UNION ALL
  SELECT 'supplier', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM supplier)) AS BIGINT) FROM supplier
)
ORDER BY table_name
""",
    tags=("audit", "quality"),
)
def lake_replay_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delivery-replay leg of the lake boundary: per table, total rows
    vs full-row-distinct rows — how many rows an exact ``dropDuplicates``
    at ingestion would collapse. At-least-once delivery (the engine's
    own streaming guarantee, and Kinesis/Firehose/Kafka's upstream of
    the reference — SURVEY §2.3) duplicates WHOLE ROWS on redelivery or
    batch replay; the streaming path already collapses them with
    ``dropDuplicatesWithinWatermark`` (streaming/pipeline.py), and this
    is the batch lake's twin. A replayed row is silent poison for
    aggregates (every SUM/AVG drifts) and a CRISP failure for keyed
    writes — ``rel_merge_upsert``/``rel_scd2_history`` reject a source
    batch carrying multiple rows per key by contract (pinned with the
    recovery recipe in ``tests/test_replay_inputs.py``).

    Scale: one ``distinct()`` shuffle per table — the SAME shuffle the
    boundary dedup write performs, so auditing costs what fixing costs;
    for monitoring-only, swap in ``approx_count_distinct`` over a
    row-fingerprint for a shuffle-free estimate. The count pair also
    pins the fixtures' natural duplicate-free property the recovery
    contract relies on (n_replayed == 0 on clean inputs at every SF).
    """
    from functools import reduce

    frames = []
    for name in LAKE_TABLES_ALL:
        df = _t(spark, sf_dir, name)
        tot = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        dis = df.distinct().agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct")
        )
        frames.append(
            tot.crossJoin(F.broadcast(dis)).select(
                F.lit(name).alias("table_name"),
                "n_rows",
                "n_distinct",
                (F.col("n_rows") - F.col("n_distinct")).alias("n_replayed"),
            )
        )
    return reduce(DataFrame.unionByName, frames).orderBy("table_name")


@register(
    "lake_replay_audit_approx",
    oracle="""
SELECT table_name, n_rows, n_distinct, TRUE AS approx_ok
FROM (
  SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM customer)) AS BIGINT) AS n_distinct FROM customer
  UNION ALL
  SELECT 'documents', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM documents)) AS BIGINT) FROM documents
  UNION ALL
  SELECT 'embeddings', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM embeddings)) AS BIGINT) FROM embeddings
  UNION ALL
  SELECT 'events', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM events)) AS BIGINT) FROM events
  UNION ALL
  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM lineitem)) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'nation', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM nation)) AS BIGINT) FROM nation
  UNION ALL
  SELECT 'orders', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM orders)) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'part', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM part)) AS BIGINT) FROM part
  UNION ALL
  SELECT 'region', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM region)) AS BIGINT) FROM region
  UNION ALL
  SELECT 'supplier', CAST(COUNT(*) AS BIGINT),
         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT * FROM supplier)) AS BIGINT) FROM supplier
)
ORDER BY table_name
""",
    tags=("audit", "quality", "approx"),
)
def lake_replay_audit_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free replay MONITOR — the documented 100 TB twin of
    ``lake_replay_audit``: ``approx_count_distinct`` (HLL++, rsd 0.02)
    over a 64-bit full-row fingerprint (``xxhash64`` of every column)
    instead of a full-row ``distinct()``. The sketch merges map-side —
    no shuffle of data rows, O(sketch) per partition — so at 100 TB
    this runs as a scan while the exact audit costs the dedup shuffle.

    Driver evidence is the ε-gate ITSELF, hash-green: ``approx_ok`` is
    computed in Spark as |approx − exact| ≤ 5 % · exact and compared
    against the oracle's literal TRUE — HLL++ is deterministic for
    fixed input, so this is a stable assertion, not a flaky tolerance
    (same pattern pinned locally for rsd robustness in
    ``tests/test_replay_inputs.py``). The exact-distinct column rides
    along only to anchor the gate; production monitoring runs the
    approx side alone, escalating to ``lake_replay_audit`` (and the
    keyed-write recovery recipe) only when the estimate drifts.
    """
    from functools import reduce

    frames = []
    for name in LAKE_TABLES_ALL:
        df = _t(spark, sf_dir, name)
        fp = df.select(F.xxhash64(*df.columns).alias("fp"))
        est = fp.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.approx_count_distinct("fp", 0.02).alias("n_approx"),
        )
        dis = df.distinct().agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct")
        )
        frames.append(
            est.crossJoin(F.broadcast(dis)).select(
                F.lit(name).alias("table_name"),
                "n_rows",
                "n_distinct",
                (
                    F.abs(F.col("n_approx") - F.col("n_distinct"))
                    <= 0.05 * F.col("n_distinct")
                ).alias("approx_ok"),
            )
        )
    return reduce(DataFrame.unionByName, frames).orderBy("table_name")


@register(
    "events_time_to_convert",
    oracle="""
WITH f AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup'
                  THEN CAST(FLOOR(epoch(ts) * 1000000) AS BIGINT) END) AS t_signup,
         MIN(CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(epoch(ts) * 1000000) AS BIGINT) END) AS t_purchase
  FROM events GROUP BY user_id
),
conv AS (
  SELECT (t_purchase - t_signup) / 1000000 AS delay_s
  FROM f WHERE t_signup IS NOT NULL AND t_purchase > t_signup
),
base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_signup FROM f
         WHERE t_signup IS NOT NULL)
SELECT base.n_signup,
       CAST((SELECT COUNT(*) FROM conv) AS BIGINT) AS n_converted,
       CASE WHEN base.n_signup > 0
            THEN ROUND((SELECT COUNT(*) FROM conv) * 1.0 / base.n_signup, 4)
       END AS conversion_rate,
       CAST((SELECT median(delay_s) FROM conv) AS DOUBLE) AS median_delay_s,
       CAST((SELECT quantile_cont(delay_s, 0.9) FROM conv) AS DOUBLE)
         AS p90_delay_s
FROM base
""",
    tags=("analytics", "funnel"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: first signup → first subsequent
    purchase per user, reporting conversion rate plus median and p90
    delay — the LATENCY half of funnel analytics
    (events_funnel_steps counts WHO converts; this measures HOW LONG
    conversion takes, which is what activation work actually moves).

    Determinism: delays are exact integer seconds; median/p90 are
    selection-interpolation stats (percentile matches DuckDB's
    quantile_cont) — no summation order anywhere. Scale: one grouped
    min-pass collapses the fact to per-user firsts; the distribution
    stats run on the converting-user frame."""
    from ..functions.timeutil import epoch_us

    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", epoch_us(F.col("ts")))
        ).alias("t_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", epoch_us(F.col("ts")))
        ).alias("t_purchase"),
    )
    conv = f.filter(
        F.col("t_signup").isNotNull()
        & (F.col("t_purchase") > F.col("t_signup"))
    ).select(
        ((F.col("t_purchase") - F.col("t_signup")) / 1_000_000).alias(
            "delay_s"
        )
    )
    base = f.filter(F.col("t_signup").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_signup")
    )
    stats = conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile(F.col("delay_s"), F.lit(0.5)).alias("median_delay_s"),
        F.percentile(F.col("delay_s"), F.lit(0.9)).alias("p90_delay_s"),
    )
    return base.crossJoin(stats).select(
        "n_signup",
        "n_converted",
        # zero signups (a filter that drains the funnel) must yield a
        # NULL rate, not an ANSI DIVIDE_BY_ZERO that kills the job —
        # the empty-fixture audit found exactly that crash
        F.when(
            F.col("n_signup") > 0,
            F.round(F.col("n_converted") / F.col("n_signup"), 4),
        ).alias("conversion_rate"),
        F.col("median_delay_s").cast("double").alias("median_delay_s"),
        F.col("p90_delay_s").cast("double").alias("p90_delay_s"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival estimator
# ---------------------------------------------------------------------------


@register(
    "ml_kaplan_meier",
    oracle="""
WITH per AS (
  SELECT user_id,
         MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS t0,
         MIN(CASE WHEN event_type = 'error'
                  THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS t_err,
         MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS t_end
  FROM events GROUP BY user_id
),
obs AS (
  SELECT user_id,
         -- integer division: DuckDB's / on BIGINTs is FLOAT division and
         -- CAST(double AS BIGINT) ROUNDS where Spark's cast truncates
         CASE WHEN t_err IS NOT NULL THEN (t_err - t0) // 3600
              ELSE (t_end - t0) // 3600 END AS dur_h,
         (t_err IS NOT NULL) AS failed
  FROM per
),
ev AS (
  SELECT dur_h AS t,
         COUNT(CASE WHEN failed THEN 1 END) AS d,
         COUNT(*) AS leaving
  FROM obs GROUP BY dur_h
),
risk AS (
  SELECT t, d,
         CAST((SELECT COUNT(*) FROM obs) AS BIGINT)
           - CAST(COALESCE(SUM(leaving) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM ev
),
km AS (
  -- a step where EVERYONE at risk fails drives survival exactly to 0;
  -- track it with a flag instead of ln(0)
  SELECT t, d, n_risk,
         SUM(CASE WHEN d > 0 AND d < n_risk THEN ln(1.0 - d * 1.0 / n_risk)
             ELSE 0.0 END)
           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS log_s,
         MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS hit_zero
  FROM risk
)
SELECT CAST(t AS BIGINT) AS t_hours, CAST(d AS BIGINT) AS n_failed,
       n_risk,
       CASE WHEN hit_zero = 1 THEN 0.0 ELSE ROUND(exp(log_s), 4) END
         AS survival
FROM km WHERE d > 0
""",
    tags=("ml", "timeseries", "stats"),
)
def ml_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve over machine time-to-first-failure
    (hours from first event; machines with no failure are
    right-censored at their last observation) — the NONPARAMETRIC
    estimator beside the parametric Weibull AFT (ml_survival_aft):
    S(t) = prod over failure times of (1 - d_i / n_i), with censored
    machines leaving the risk set without contributing a failure term.

    Determinism: risk sets and failure counts are exact integers; the
    product is a running sum of logs in TIME order (both engines add
    the same terms in the same order, so the float sum is
    bit-identical) exponentiated at the edge. Scale: the fact
    collapses to per-machine (t0, t_err, t_end) in one pass; the curve
    itself lives at distinct-duration grain."""
    from ..functions.timeutil import epoch_us

    ev = _t(spark, sf_dir, "events")
    sec = (epoch_us(F.col("ts")) / 1_000_000).cast("long")
    per = ev.groupBy("user_id").agg(
        F.min(sec).alias("t0"),
        F.min(F.when(F.col("event_type") == "error", sec)).alias("t_err"),
        F.max(sec).alias("t_end"),
    )
    obs = per.select(
        F.when(
            F.col("t_err").isNotNull(),
            ((F.col("t_err") - F.col("t0")) / 3600).cast("long"),
        )
        .otherwise(((F.col("t_end") - F.col("t0")) / 3600).cast("long"))
        .alias("dur_h"),
        F.col("t_err").isNotNull().alias("failed"),
    )
    evd = obs.groupBy(F.col("dur_h").alias("t")).agg(
        F.count(F.when(F.col("failed"), 1)).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    n_total = obs.count()
    wprev = (
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_risk = F.lit(n_total) - F.coalesce(
        F.sum("leaving").over(wprev), F.lit(0)
    )
    # a step where EVERYONE at risk fails drives survival exactly to
    # 0; track it with a flag instead of ln(0)
    km = evd.select(
        "t",
        "d",
        n_risk.alias("n_risk"),
        F.sum(
            F.when(
                (F.col("d") > 0) & (F.col("d") < n_risk),
                F.log(1.0 - F.col("d") / n_risk),
            ).otherwise(F.lit(0.0))
        )
        .over(wcum)
        .alias("log_s"),
        F.max(F.when(F.col("d") == n_risk, 1).otherwise(0))
        .over(wcum)
        .alias("hit_zero"),
    )
    return km.filter(F.col("d") > 0).select(
        F.col("t").alias("t_hours"),
        F.col("d").alias("n_failed"),
        "n_risk",
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("log_s"), 4))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# Bucketed shuffle-free aggregation
# ---------------------------------------------------------------------------


@register(
    "src_bucketed_groupby",
    oracle="""
SELECT l_orderkey, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY l_orderkey
""",
    tags=("source", "agg", "eager-io"),
)
def src_bucketed_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free aggregation on a bucketed table: lineitem written
    ``bucketBy(8, l_orderkey)`` aggregates on the bucket key with ZERO
    exchange — the scan's hash-clustered bucket layout already
    satisfies the aggregation's distribution requirement
    (plan-asserted in tests/test_governance.py). The aggregation twin
    of src_bucketed_join: at 100 TB, bucketing the fact on its
    dominant group/join key removes the biggest shuffle from BOTH
    operations for the cost of one layout-time sort.

    The oracle is the same aggregate off the raw table — bucketing
    must never change results, only the plan."""
    from ..sources.scratch import scratch_dir

    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    wh = scratch_dir("bucketed_gb_")
    name = "li_bucketed_gb"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        l.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/{name}")
        .saveAsTable(name)
    )
    return (
        spark.table(name)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# SQL-defined scalar functions
# ---------------------------------------------------------------------------


@register(
    "rel_sql_udf",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS disc_revenue_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
            AS BIGINT)) AS BIGINT) AS charged_cents
FROM lineitem GROUP BY l_returnflag
""",
    tags=("sql", "functions"),
)
def rel_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 4 ``CREATE FUNCTION ...
    RETURN expr``): the business logic (discounted price, charged
    amount COMPOSED from the first function) lives as named catalog
    functions that any SQL user calls — the governance answer to
    copy-pasted expressions drifting apart across queries. Catalyst
    INLINES the bodies, so the plan is identical to writing the
    expressions by hand (zero runtime cost, unlike an opaque Python
    UDF) — which is exactly what the oracle checks, being the same
    aggregate with the functions inlined manually.

    Scale: one partial-aggregated scan; SQL UDFs never leave the JVM
    or break whole-stage codegen."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_sqludf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(ROUND(p * (1 - d) * 100) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged_cents(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS BIGINT RETURN CAST(ROUND(p * (1 - d) * (1 + t) * 100) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(disc_cents(l_extendedprice, l_discount)) AS disc_revenue_cents,
               SUM(charged_cents(l_extendedprice, l_discount, l_tax)) AS charged_cents
        FROM li_sqludf GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# Parameterized SQL
# ---------------------------------------------------------------------------


@register(
    "rel_parameterized_sql",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_totalprice > 1000.0
GROUP BY o_orderpriority
""",
    tags=("sql",),
)
def rel_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (``spark.sql(query, args=...)``): the
    injection-safe way applications template queries — parameters bind
    as typed literals in the parse tree, never by string splicing, so
    a hostile value cannot change query structure. The oracle is the
    same query with the values inlined: binding must be semantically
    equivalent to literal text (including pushing the bound filters
    down to the scan).

    Scale: identical plan to the literal form — parameter binding is a
    parse-time concern with zero execution footprint."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_param")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents
        FROM orders_param
        WHERE o_orderdate >= :cutoff AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        """,
        args={"cutoff": datetime.date(1996, 1, 1), "min_price": 1000.0},
    )
