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
    compare(q.spark(spark, SF_SMOKE), duck, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.spark(spark, SF_SMOKE)
    assert df.columns  # stable schema
    assert df.count() >= 0


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
