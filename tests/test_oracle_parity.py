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
    """HLL++ estimate within 5 % of exact. Since r16 the gate is
    IN-PLAN (``approx_ok``, hash-checked by the driver against literal
    TRUE); this test asserts the gate fires AND independently recomputes
    the raw estimate against exact so a broken gate expression can't
    self-certify."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    sf = "/root/testdata/sf0.01"
    rows = all_queries()["rel_approx_distinct"].spark(spark, sf).collect()
    assert rows and all(r.approx_ok for r in rows)
    ev = spark.read.parquet(sf + "/events.parquet")
    pairs = {
        r.event_type: (r.n, r.a)
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n"),
            F.approx_count_distinct("user_id", 0.02).alias("a"),
        )
        .collect()
    }
    assert {r.event_type for r in rows} == set(pairs)
    for r in rows:
        n, a = pairs[r.event_type]
        assert r.exact_users == n
        assert abs(a - n) / n < 0.05


def test_approx_quantile_within_rank_error(spark):
    """approx_percentile estimate within the ±1/accuracy rank-error
    band of the exact quantile. Since r16 the gate is IN-PLAN
    (``p50_ok``/``p95_ok``, hash-checked against literal TRUE); this
    test asserts the gate fires AND recomputes the band check from raw
    aggregates so a broken gate expression can't self-certify."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    sf = "/root/testdata/sf0.01"
    rows = all_queries()["rel_approx_quantile"].spark(spark, sf).collect()
    assert rows and all(r.p50_ok and r.p95_ok for r in rows)
    eps = 2 / 1000.0
    li = spark.read.parquet(sf + "/lineitem.parquet")
    raw = {
        r.l_returnflag: (r.a, r.bands)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(1000)
            ).alias("a"),
            F.percentile(
                "l_extendedprice",
                F.array(*[F.lit(q) for q in (0.5 - eps, 0.5 + eps, 0.95 - eps, 0.95 + eps)]),
            ).alias("bands"),
        )
        .collect()
    }
    assert {r.l_returnflag for r in rows} == set(raw)
    for k, ((p50, p95), (lo50, hi50, lo95, hi95)) in raw.items():
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


def test_dirty_events_oracle_alignment(spark, tmp_path):
    """The r9/r10 verdict's latent divergence: rel_heavy_hitters and
    ts_ewma_last exclude null/NaN rows (operators/skew.py,
    operators/timeseries.py) but their oracles used to count them —
    hash-neutral only because the fixtures carry zero nulls. This runs
    BOTH the registered Spark query and the registered oracle text on a
    null-bearing events table and demands byte parity.

    The heavy-hitter fixture is built so the alignment is load-bearing:
    `view` (60 rows) clears the null-excluding threshold
    (1090/20 = 54.5) but NOT the null-counting one (1590/20 = 79.5) —
    an unaligned oracle drops it and the compare fails."""
    import datetime as dt

    import duckdb

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0

    def add(user_id, ts, event_type, value):
        nonlocal eid
        eid += 1
        rows.append((eid, ts, user_id, event_type, value, None))

    # heavy-hitter block (value NULL -> invisible to ewma_last):
    # click x400 + view x60 + 63 singleton-ish types x10 + 500 nulls
    for i in range(400):
        add(900, t0, "click", None)
    for i in range(60):
        add(900, t0, "view", None)
    for t in range(63):
        for i in range(10):
            add(900, t0, f"type_{t}", None)
    for i in range(500):
        add(900, t0, None, None)
    # ewma block (event_type NULL -> excluded from heavy hitters):
    # user 1: 5 clean obs + a null-value row + a null-ts row
    for i, v in enumerate([10.0, 20.0, 30.0, 40.0, 50.0]):
        add(1, t0 + dt.timedelta(minutes=i), None, v)
    add(1, t0 + dt.timedelta(hours=2), None, None)
    add(1, None, None, 99.0)
    # user 2: only null observations -> must disappear from both sides
    add(2, t0, None, None)
    add(2, None, None, 7.0)
    # user 3: null-ts rows interleaved with clean ones
    add(3, t0, None, 5.0)
    add(3, None, None, 123.0)
    add(3, t0 + dt.timedelta(minutes=1), None, 6.0)

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    try:
        for name in ("rel_heavy_hitters", "ts_ewma_last"):
            q = QUERIES[name]
            compare(q.spark(spark, sf_dir), con, q.oracle)
        # sanity on the discriminating facts (not just parity)
        hh = {
            (r.event_type, r.n)
            for r in QUERIES["rel_heavy_hitters"].spark(spark, sf_dir).collect()
        }
        assert hh == {("click", 400), ("view", 60)}
        ew = {
            r.user_id for r in QUERIES["ts_ewma_last"].spark(spark, sf_dir).collect()
        }
        assert ew == {1, 3}
    finally:
        con.close()
