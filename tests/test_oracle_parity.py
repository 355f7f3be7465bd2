"""Driver-harness mirror: every oracled query in the registry must
hash-match DuckDB at sf0.001 (fast loop; driver re-checks at sf0.01).
Rows-only queries must at least execute and return a stable schema.
"""

from __future__ import annotations

import pytest

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

from .conftest import SF_SMOKE
from .oracle_harness import compare, duck_connection

QUERIES = all_queries()
ORACLED = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, duck, name):
    q = QUERIES[name]
    try:
        compare(q.spark(spark, SF_SMOKE), duck, q.oracle)
    finally:
        if "caches" in q.tags:
            # "caches"-tagged plans persist intermediates that outlive
            # the returned DataFrame; drop them so the session-scoped
            # SparkSession doesn't accumulate storage across the suite
            spark.catalog.clearCache()


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.spark(spark, SF_SMOKE)
    assert df.columns  # stable schema
    assert df.count() >= 0
    if "caches" in q.tags:
        spark.catalog.clearCache()


def test_approx_distinct_within_epsilon(spark):
    """HLL++ estimate within 5 % of exact (rel_approx_distinct is
    rows-only — this is its accuracy gate)."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    approx = {
        r.event_type: r.approx_users
        for r in all_queries()["rel_approx_distinct"]
        .spark(spark, "/root/testdata/sf0.01")
        .collect()
    }
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] < 0.05


def test_approx_quantile_within_rank_error(spark):
    """approx_percentile estimate within the ±1/accuracy rank-error
    band of the exact quantile (rel_approx_quantile is rows-only — this
    is its accuracy gate): the approx p50/p95 must lie between the
    exact quantiles at q ∓ 2/accuracy."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    sf = "/root/testdata/sf0.01"
    approx = {
        r.l_returnflag: (r.p50, r.p95)
        for r in all_queries()["rel_approx_quantile"].spark(spark, sf).collect()
    }
    eps = 2 / 1000.0
    li = spark.read.parquet(sf + "/lineitem.parquet")
    bands = {
        r.l_returnflag: r.bands
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile(
                "l_extendedprice",
                F.array(*[F.lit(q) for q in (0.5 - eps, 0.5 + eps, 0.95 - eps, 0.95 + eps)]),
            ).alias("bands")
        )
        .collect()
    }
    assert set(approx) == set(bands)
    for k, (p50, p95) in approx.items():
        lo50, hi50, lo95, hi95 = bands[k]
        assert lo50 <= p50 <= hi50, (k, p50, lo50, hi50)
        assert lo95 <= p95 <= hi95, (k, p95, lo95, hi95)


def test_dtype_class_drift_caught_locally(spark, duck):
    """Regression for the r03 `rel_agg_bool_bit` driver fail: DuckDB
    count_if returns HUGEINT (pandas float64) while Spark emits int64;
    values are identical, so a value-tolerant compare passes — but the
    driver's hash is dtype-sensitive. The harness must now fail the
    UNCAST oracle locally (before the driver does) and pass the cast
    one (the registered query, covered by test_oracle_match)."""
    from pyspark.sql import functions as F

    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    sdf = l.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 45).alias("n_heavy")
    )
    uncast = (
        "SELECT l_returnflag, count_if(l_quantity > 45) AS n_heavy "
        "FROM lineitem GROUP BY l_returnflag"
    )
    with pytest.raises(AssertionError, match="dtype-class drift"):
        compare(sdf, duck, uncast)
    cast = (
        "SELECT l_returnflag, CAST(count_if(l_quantity > 45) AS BIGINT) "
        "AS n_heavy FROM lineitem GROUP BY l_returnflag"
    )
    compare(sdf, duck, cast)
