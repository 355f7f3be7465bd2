"""Physical-plan assertions — the 100 TB design contract, checked at
small scale by inspecting what Catalyst actually planned.

These tests pin the *plan shape*, not timings: pushdown reaching the
scan, broadcasts where expected, no shuffle where co-location should
hold. A regression here is a scale regression even if sf0.01 wall-time
looks fine.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

SF = "/root/testdata/sf0.01"


def _plan(df, mode="formatted"):
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_q6_pushdown_and_pruning(spark):
    q = all_queries()["q6_forecast_revenue"]
    plan = _plan(q.spark(spark, SF))
    assert "PushedFilters:" in plan
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan).group(1)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to scan"
    read = re.search(r"ReadSchema: struct<(.*?)>", plan).group(1)
    cols = [c.split(":")[0] for c in read.split(",")]
    assert sorted(cols) == [
        "l_discount",
        "l_extendedprice",
        "l_quantity",
        "l_shipdate",
    ], f"scan reads extra columns: {cols}"


def test_q5_broadcasts_dims(spark):
    plan = _plan(all_queries()["q5_local_supplier"].spark(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_topk_is_take_ordered(spark):
    """Global top-k must plan TakeOrderedAndProject, never a full sort."""
    plan = _plan(all_queries()["rel_topk_global"].spark(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_q1_partial_aggregation(spark):
    """Hash agg must be partial (map-side) then final — shuffle carries
    group aggregates, not raw rows."""
    plan = _plan(all_queries()["q1_pricing_summary"].spark(spark, SF), "simple")
    assert plan.count("HashAggregate") >= 2


def test_no_python_udf_in_relational_plans(spark):
    """Every relational/text query stays JVM-side (no BatchEvalPython /
    ArrowEvalPython) — the whole-stage-codegen contract."""
    qs = all_queries()
    for name in (
        "q1_pricing_summary",
        "q10_returned_items",
        "doc_quality",
        "doc_langid",
        "doc_fingerprint",
        "dedup_ngram_jaccard",
        "rel_window_running",
    ):
        plan = _plan(qs[name].spark(spark, SF), "simple")
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing contract: two tables bucketed+sorted on the join key
    sort-merge-join with ZERO Exchange — the co-located join pattern
    that saves the dominant shuffle at 100 TB."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    od = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    wh = str(tmp_path / "wh")
    for df, name, key in ((li, "li_b", "l_orderkey"), (od, "od_b", "o_orderkey")):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}")
            .saveAsTable(name)
        )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        j = spark.table("li_b").join(
            spark.table("od_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(j, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # sanity: result is correct
        assert j.count() == li.join(od, li.l_orderkey == od.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS od_b")


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A fact laid out with partitionBy(key) must be dynamically pruned
    when joined to a filtered dim on that key: the dim's surviving keys
    become a runtime partition filter (`dynamicpruning` subquery) so
    only matching directories are scanned. At 100 TB a date-partitioned
    lake + a filtered date dim reads days, not the lake. (useStats is
    disabled so tiny-fixture size estimates don't veto the rewrite the
    way real-scale stats never would.)"""
    fact_dir = str(tmp_path / "orders_part")
    (
        spark.read.parquet(f"{SF}/orders.parquet")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .mode("overwrite")
        .parquet(fact_dir)
    )
    saved = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    try:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
        fact = spark.read.parquet(fact_dir)
        dim = spark.createDataFrame(
            [(y, f"t{y}") for y in range(1995, 2002)], "y int, tag string"
        ).filter(F.col("tag") == "t1996")
        j = fact.join(dim, fact.o_year == dim.y)
        plan = _plan(j)
        assert "dynamicpruning" in plan.lower(), plan
        expected = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .filter(F.year("o_orderdate") == 1996)
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", saved)


def test_topk_per_group_rank_pushdown(spark):
    """Grouped top-k must plan a WindowGroupLimit: the rank predicate
    pushes below the window so each map task keeps only k rows per
    group before AND after the shuffle — the difference between
    shuffling k rows/group and shuffling the whole fact at 100 TB."""
    df = all_queries()["rel_topk_per_group"].spark(spark, SF)
    plan = _plan(df, "simple")
    assert "WindowGroupLimit" in plan, plan


def test_runtime_bloom_filter_injected_on_fact_side(spark):
    """Runtime row-level filtering: when a selective dim filter feeds a
    shuffle join, Spark injects a bloom filter (`might_contain`) on the
    fact side so non-matching rows die at the scan, not in the shuffle.
    At 100 TB the default size thresholds trigger this automatically;
    sf0.01 sits below them, so the thresholds are pinned here to assert
    the at-scale plan shape (and that results are unchanged)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        od = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = _plan(j, "simple")
        assert "might_contain" in plan, plan
        n = j.count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert n == li.join(od, F.col("l_orderkey") == F.col("o_orderkey")).count()


def test_salted_join_equals_plain_join(spark):
    """Salting must not change semantics: salted inner join == plain
    inner join row-for-row (including duplicate multiplicity)."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators.skew import (
        salted_join,
    )

    l = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = l.join(o, "l_orderkey").groupBy("l_orderkey").count()
    salted = salted_join(l, o, "l_orderkey", n_salts=8).groupBy("l_orderkey").count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_keeps_unmatched(spark):
    from real_time_predictive_maintenance_data_pipeline_spark.operators.skew import (
        salted_join,
    )

    l = spark.range(10).withColumnRenamed("id", "k")
    r = spark.range(5).withColumnRenamed("id", "k").withColumn("v", F.lit("x"))
    out = salted_join(l, r, "k", how="left", n_salts=4)
    assert out.count() == 10
    assert out.filter(F.col("v").isNull()).count() == 5


def test_partition_pruning_on_partitioned_dataset(spark, tmp_path):
    """Hive-style partition pruning: a year= filter over a
    partitionBy('year') dataset must scan only matching partitions
    (plan shows the pruned partition filter, and the scan reads no
    'year' data column — it comes from the directory layout)."""
    src = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    src.write.mode("overwrite").partitionBy("year").parquet(path)

    back = spark.read.parquet(path).filter(F.col("year") == 1997)
    plan = _plan(back)
    assert "PartitionFilters" in plan and "1997" in plan
    n_direct = src.filter(F.col("year") == 1997).count()
    assert back.count() == n_direct


def test_schema_evolution_merge(spark, tmp_path):
    """Parquet schema evolution: readers must handle datasets written
    across schema versions (mergeSchema unions columns; old files read
    null for new columns) — a pipeline-lifetime reality at 100 TB."""
    path = str(tmp_path / "evolving")
    v1 = spark.range(5).select(F.col("id").alias("k"), F.lit(1.0).alias("a"))
    v1.write.parquet(f"{path}/batch=1")
    v2 = spark.range(5, 10).select(
        F.col("id").alias("k"), F.lit(2.0).alias("a"), F.lit("x").alias("b")
    )
    v2.write.parquet(f"{path}/batch=2")

    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"k", "a", "b", "batch"}
    assert merged.count() == 10
    assert merged.filter(F.col("b").isNull()).count() == 5  # v1 rows


def test_spread_is_noop_when_input_already_parallel(spark, tmp_path):
    """spread() must add a shuffle only for under-split scans: a frame
    that already has >= defaultParallelism partitions passes through
    with its plan unchanged (no Exchange added at 100 TB scale)."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators.spread import (
        spread,
    )

    cores = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, 1, cores * 2)
    assert spread(wide) is wide

    narrow = spark.range(0, 10_000, 1, 1)
    out = spread(narrow)
    assert out.rdd.getNumPartitions() == cores


def test_q18_aggregates_before_join(spark):
    """The q18 rewrite's signature: lineitem is scanned ONCE (the
    HAVING aggregate IS the output aggregate — grain is orderkey), and
    the scan reads only the two needed columns. The naive shape scans
    lineitem twice and re-aggregates every row after a 3-way join."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    df = all_queries()["q18_large_orders"].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1, plan
    li_scan = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "l_orderkey" in ln
    ]
    assert li_scan and "l_quantity" in li_scan[0]
    assert "l_extendedprice" not in li_scan[0]  # column pruning held


def test_q9_dims_broadcast_filter_before_shuffle(spark):
    """q9's five-way join must broadcast every dim (part/supplier/
    nation) and prune the lineitem scan to the six needed columns; the
    p_name filter must reach the part scan so the fact is thinned by
    the broadcast join before any exchange."""
    df = all_queries()["q9_nation_profit"].spark(spark, SF)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3
    li = re.search(
        r"Location: InMemoryFileIndex \[[^\]]*lineitem\.parquet\].*?ReadSchema: struct<(.*?)>",
        plan,
        re.S,
    ).group(1)
    cols = sorted(c.split(":")[0] for c in li.split(","))
    assert cols == [
        "l_discount",
        "l_extendedprice",
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        "l_suppkey",
    ], f"lineitem scan reads {cols}"
    part = re.search(
        r"Location: InMemoryFileIndex \[[^\]]*part\.parquet\].*?PushedFilters: \[(.*?)\]",
        plan,
        re.S,
    ).group(1)
    assert "p_name" in part, "p_name filter not pushed to part scan"


def test_q8_dims_broadcast_fact_thinned_before_shuffle(spark):
    """q8's eight-way join: every dimension side (part, region⋈nation,
    nation-joined customer/supplier prep) plans as a broadcast, the
    p_type filter reaches the part scan (so the broadcast join thins
    the fact ~6x before the orderkey shuffle), and the date filter
    pushes into the orders scan."""
    df = all_queries()["q8_market_share"].spark(spark, SF)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "NestedLoop" not in plan
    assert plan.count("lineitem.parquet") == 1
    part = re.search(
        r"Location: InMemoryFileIndex \[[^\]]*part\.parquet\].*?PushedFilters: \[(.*?)\]",
        plan,
        re.S,
    ).group(1)
    assert "EqualTo(p_type,ECONOMY)" in part
    orders = re.search(
        r"Location: InMemoryFileIndex \[[^\]]*orders\.parquet\].*?PushedFilters: \[(.*?)\]",
        plan,
        re.S,
    ).group(1)
    assert "o_orderdate" in orders


def test_q21_single_fact_aggregate_no_self_join(spark):
    """q21's rewrite signature: the EXISTS / NOT EXISTS correlated
    self-joins AND the candidate rejoin collapse into one
    (order, supplier)-grain aggregate + window counts, so lineitem is
    scanned exactly ONCE (the classic plan scans it three times), and
    no nested-loop join appears anywhere."""
    df = all_queries()["q21_sole_returner"].spark(spark, SF)
    plan = _plan(df, "simple")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "NestedLoop" not in plan


def test_ngram_jaccard_no_corpus_broadcast(spark):
    """The (lang, length-bucket) blocking key makes pair generation an
    EQUI join. With broadcast off (the 100 TB shape — a corpus never
    fits executor memory) the plan must stay a shuffle equi-join, never
    a nested-loop, and never a forced broadcast of the corpus side."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = all_queries()["dedup_ngram_jaccard"].spark(spark, SF)
        plan = _plan(df, "simple")
        assert "BroadcastNestedLoop" not in plan
        assert "BroadcastHashJoin" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unigram_logprob_broadcasts_vocab(spark):
    """The token→frequency join must broadcast the vocabulary side —
    the corpus side never shuffles on the word key (which would move
    every token occurrence at 100 TB)."""
    plan = _plan(all_queries()["doc_unigram_logprob"].spark(spark, SF), "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the final per-doc aggregate is the only wide exchange keyed on data
    assert "SortMergeJoin" not in plan


def test_hard_negatives_broadcasts_queries(spark):
    """ANN mining joins corpus x queries: the query side (always the
    small side) must broadcast; scoring is map-side, and the only
    shuffle is the per-query top-k window."""
    plan = _plan(all_queries()["sim_hard_negatives"].spark(spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" in plan  # non-equi (label !=) join
    assert "SortMergeJoin" not in plan


def test_pack_sequences_single_exchange_reused(spark):
    """Packing = one window + one aggregate on compatible keys: the
    (lang, shard) hash exchange that feeds the running-sum window must
    be the ONLY data shuffle (the groupBy on (lang, shard, bin) reuses
    the window's partitioning via partial aggregation)."""
    df = all_queries()["doc_pack_sequences"].spark(spark, SF)
    plan = _plan(df, "simple")
    # exchanges: the spread() round-robin (scan under-split guard) plus
    # ONE hashpartitioning on (lang, shard); AQE may add nothing else
    assert plan.count("hashpartitioning(lang") == 1, plan


def test_keep_decision_window_exchange_carries_no_text(spark):
    """The dedup-keeper window shuffles on the 256-bit digest with all
    per-doc metrics derived map-side first — document text must never
    enter a hash exchange (only spread()'s round-robin under-split
    guard, a no-op at real scale, may carry it)."""
    df = all_queries()["doc_keep_decision"].spark(spark, SF)
    plan = _plan(df)
    hash_exchanges = [
        m.group(1)
        for m in re.finditer(
            r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: ([^\n]*)",
            plan,
        )
        if "hashpartitioning" in m.group(2)
    ]
    assert hash_exchanges, "expected hash exchanges in the plan"
    assert not any("text" in e for e in hash_exchanges), hash_exchanges


def test_bucketed_join_no_shuffle_on_either_side(spark):
    """src_bucketed_join's contract: with both tables bucketed on the
    join key, SortMergeJoin consumes the bucketed layout directly — no
    Exchange under either join child. Broadcast is disabled so AQE
    can't sidestep the claim at test scale (at 100 TB neither side
    broadcasts)."""
    all_queries()["src_bucketed_join"].spark(spark, SF)  # creates tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table("rtpmdp_orders_bucketed")
        cb = spark.table("rtpmdp_customer_bucketed")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = _plan(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mad_outliers_stats_broadcast(spark):
    """events_mad_outliers: the per-type median/MAD stats join the fact
    side by broadcast — the events stream itself never shuffles for the
    outlier count (only the bounded-cardinality median aggregates
    exchange)."""
    q = all_queries()["events_mad_outliers"]
    plan = _plan(q.spark(spark, SF), "simple")
    assert "BroadcastHashJoin" in plan


def test_coreset_centroids_broadcast(spark):
    """emb_coreset_per_label: centroids (labels x dims) broadcast into
    the cosine join; the embedding corpus never shuffles on label before
    scoring."""
    q = all_queries()["emb_coreset_per_label"]
    plan = _plan(q.spark(spark, SF), "simple")
    assert "BroadcastHashJoin" in plan


def test_ngram_novelty_gram_exchange_reused(spark):
    """doc_ngram_novelty: the first-occurrence aggregate and the
    gram-stream join both hash-partition on the gram — the optimizer
    must not add a second full shuffle of the gram stream (ReusedExchange
    or aligned partitioning), and the final aggregate exchanges only
    compact (doc_id, flag) rows."""
    q = all_queries()["doc_ngram_novelty"]
    plan = _plan(q.spark(spark, SF), "simple")
    n_gram_shuffles = plan.count("Exchange hashpartitioning(gram")
    assert n_gram_shuffles <= 2, plan  # agg build + probe align, no more


def test_zorder_layout_skips_files_on_both_dims(spark, tmp_path):
    """The point of Z-ordering: a linear sort is perfect for filters on
    its sort key and useless for the other dimension (every file
    overlaps); the Morton layout stays selective on BOTH. Measured on
    real parquet footer min/max stats, the way an engine's data-skipping
    actually prunes."""
    import pyarrow.parquet as pq
    import glob as g

    from real_time_predictive_maintenance_data_pipeline_spark.functions.zorder import (
        zorder_key,
    )

    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    orders = load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("a"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias("b"),
    )
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "l")
    orders.withColumn("z", zorder_key(F.col("a"), F.col("b"))).repartitionByRange(
        16, "z"
    ).drop("z").write.mode("overwrite").parquet(zdir)
    orders.repartitionByRange(16, "a").write.mode("overwrite").parquet(ldir)

    def stats(d):
        out = []
        for f in g.glob(f"{d}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins = {"a": None, "b": None}
            maxs = {"a": None, "b": None}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in mins and col.statistics is not None:
                        s = col.statistics
                        mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                        maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
            out.append((mins, maxs))
        return out

    amin, amax, bmin, bmax = orders.agg(
        F.min("a"), F.max("a"), F.min("b"), F.max("b")
    ).first()

    def touched(files, dim, lo, hi):
        return sum(
            1
            for mn, mx in files
            if not (mx[dim] < lo or mn[dim] > hi)
        )

    zf, lf = stats(zdir), stats(ldir)
    assert len(zf) == len(lf) == 16
    # a-only filter (1/8 of the a range) and b-only filter (1/8 of b)
    a_lo, a_hi = amin, amin + (amax - amin) // 8
    b_lo, b_hi = bmin, bmin + (bmax - bmin) // 8
    z_cost = touched(zf, "a", a_lo, a_hi) + touched(zf, "b", b_lo, b_hi)
    l_cost = touched(lf, "a", a_lo, a_hi) + touched(lf, "b", b_lo, b_hi)
    # linear layout: ~2 files for a, ALL 16 for b. Z-order: bounded on both.
    assert touched(lf, "b", b_lo, b_hi) == 16
    assert touched(zf, "a", a_lo, a_hi) < 16
    assert touched(zf, "b", b_lo, b_hi) < 16
    assert z_cost < l_cost


def test_bm25_single_stats_broadcast_and_topk(spark):
    """doc_bm25_search: corpus stats (1 row) must reach the scoring
    side via a broadcast nested-loop, the top-20 must be
    TakeOrderedAndProject (never a global sort), and scoring must stay
    in JVM codegen (no Python UDF)."""
    plan = _plan(all_queries()["doc_bm25_search"].spark(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_span_dedup_partial_agg_no_cartesian(spark):
    """doc_span_dedup: the span count must partial-aggregate map-side
    (shuffle carries (span, partial) not raw span instances) and no
    all-pairs stage may appear."""
    plan = _plan(all_queries()["doc_span_dedup"].spark(spark, SF))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_merge" in plan.lower() or "Partial" in plan


def test_triangle_count_no_cartesian(spark):
    """graph_triangle_count: wedge closure is equi-join only — a
    cartesian stage would be quadratic in edges at scale."""
    plan = _plan(all_queries()["graph_triangle_count"].spark(spark, SF))
    # the single-row count combine at the end is a legitimate BNLJ;
    # raw CartesianProduct of edge relations is not
    assert "CartesianProduct" not in plan


def test_seasonal_profile_broadcasts_key_totals(spark):
    plan = _plan(all_queries()["ts_seasonal_hour_profile"].spark(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_chunk_dedup_no_corpus_broadcast(spark):
    """doc_chunk_dedup: the chunk-frequency join must carry NO forced
    broadcast hint — at fixture scale AQE may legitimately broadcast
    the tiny freq table, but a mandatory hint would OOM at 100 TB
    where the chunk set scales with the corpus. Pin the logical plan
    hint-free (size-based promotion stays allowed) plus no cartesian."""
    df = all_queries()["doc_chunk_dedup"].spark(spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    logical = df._jdf.queryExecution().logical().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical


def test_pareto_sorts_dimension_not_fact(spark):
    """rel_pareto_cumshare: the global window sort must run over the
    part-level pre-aggregation (|parts| rows), never the lineitem fact
    — below the single-partition exchange an aggregate must appear
    BEFORE any parquet scan (i.e. the sorted relation is the
    aggregated dimension, not raw fact rows)."""
    plan = _plan(all_queries()["rel_pareto_cumshare"].spark(spark, SF))
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n", 1)[0].splitlines()
    idx = next(i for i, ln in enumerate(tree) if "Sort (" in ln)
    below = "\n".join(tree[idx + 1 :])
    agg_pos = below.find("HashAggregate")
    scan_pos = below.find("Scan parquet")
    assert agg_pos != -1 and (scan_pos == -1 or agg_pos < scan_pos), (
        "single-partition sort feeds raw scan rows, not the aggregate"
    )


def test_rolling_active_users_no_self_join_of_events(spark):
    """events_rolling_active_users: the rolling-distinct must come from
    the 7x contribution expansion, not an events-to-events range self
    join (quadratic at scale)."""
    plan = _plan(all_queries()["events_rolling_active_users"].spark(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # events scanned at most twice (days grid + contributions)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2


def test_exact_stratified_sample_rank_is_group_limited(spark):
    """exact_stratified_sample: the per-stratum rank filter must be
    pushed into a WindowGroupLimit so tasks keep a bounded heap
    instead of fully sorting each stratum."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators.skew import (
        exact_stratified_sample,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(exact_stratified_sample(docs, "lang", 5, "doc_id"))
    assert "WindowGroupLimit" in plan


def test_incremental_refresh_rescans_only_delta(spark):
    """rel_incremental_agg_refresh: the refresh must scan the orders
    fact ONCE (the delta) — the base arrives as the stored aggregate
    parquet, never a rescan of historical fact data."""
    plan = _plan(all_queries()["rel_incremental_agg_refresh"].spark(spark, SF))
    tree = plan.split("\n\n", 1)[0]
    scans = [ln for ln in tree.splitlines() if "Scan parquet" in ln]
    # one orders scan (delta) + one base-aggregate scan
    assert len(scans) == 2, scans


def test_curation_funnel_no_cartesian_and_broadcast_bench(spark):
    plan = _plan(all_queries()["doc_curation_funnel"].spark(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # decontamination semi-join


def test_aqe_splits_skewed_join_partition(spark):
    """session.py enables AQE skew-join splitting; this pins that the
    mechanism actually FIRES: a join with one pathological hot key must
    show skew=true on the sort-merge join in the adaptive executed
    plan (the runtime remedy that complements operators/skew.py's
    explicit salting)."""
    import pyspark.sql.functions as F

    overrides = {
        # force a shuffle join (no broadcast escape hatch)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # make the skew detector sensitive enough for a test-sized frame
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        # non-foldable payload so the shuffle actually carries bytes
        pad = F.concat(F.lit("x" * 100), F.col("id").cast("string"))
        # 150k rows on ONE key, 50k spread over the rest
        left = spark.range(200_000).select(
            F.when(F.col("id") < 150_000, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            pad.alias("pad"),
        )
        right = spark.range(50_000).select(
            F.col("id").alias("k"), pad.alias("pad2")
        )
        # keep the payload columns through the shuffle — projecting to
        # the (constant-0) key alone would RLE-compress the hot
        # partition below the skew threshold
        out = left.join(right, "k").select("k", "pad", "pad2")
        # execute THROUGH this Dataset so its own AQE plan finalizes
        assert len(out.collect()) == 150_000
        executed = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in executed
        assert "skew=true" in executed, executed[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_matryoshka_truncate_map_only(spark):
    df = all_queries()["emb_matryoshka_truncate"].spark(spark, SF)
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    plan = jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Exchange" not in plan, plan


def test_k_anonymity_single_aggregation_pass(spark):
    """QI audit = one grouped aggregation over the corpus (the
    distinct-count expands in the same plan, no join/window)."""
    df = all_queries()["rel_k_anonymity"].spark(spark, SF)
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    plan = jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Join" not in plan and "Window" not in plan
    scans = [ln for ln in plan.splitlines() if "Scan parquet" in ln]
    assert len(scans) == 1


# ---------------------------------------------------------------------------
# Round-5 analytics wave plan shapes
# ---------------------------------------------------------------------------


def _simple_plan(spark, name):
    df = all_queries()[name].spark(spark, SF)
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


@pytest.mark.parametrize(
    "name", ["doc_ttr", "doc_shingle_uniqueness", "emb_simhash_bits"]
)
def test_wave_map_only_queries_have_no_exchange(spark, name):
    """Per-row text/embedding profiles must stay map-only: the arrays
    are reduced INSIDE their row, nothing explodes into a shuffle."""
    plan = _simple_plan(spark, name)
    assert "Exchange" not in plan, plan


def test_self_excluding_avg_single_window_no_join(spark):
    """Leave-one-out averages must use the (sum-x)/(n-1) window
    identity — a self-join here would shuffle the fact table twice."""
    plan = _simple_plan(spark, "rel_self_excluding_avg")
    assert "Join" not in plan, plan
    assert "Window" in plan
    assert len([ln for ln in plan.splitlines() if "Scan parquet" in ln]) == 1


def test_date_spine_broadcasts_spine_side(spark):
    """The generated calendar spine (tiny) must broadcast; the daily
    aggregate side must never be collected or nested-looped."""
    plan = _simple_plan(spark, "rel_date_spine_fill")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_jaccard_pairs_blocked_no_cartesian(spark):
    """Supplier-pair candidates must come from the shared-customer
    equi-join (blocked), never an all-pairs product."""
    plan = _simple_plan(spark, "graph_jaccard_pairs")
    assert "CartesianProduct" not in plan, plan


def test_pivot_multi_agg_single_pass(spark):
    """Explicit pivot values = one scan + one aggregate (no eager
    distinct-values job, no second scan)."""
    plan = _simple_plan(spark, "rel_pivot_multi_agg")
    assert len([ln for ln in plan.splitlines() if "Scan parquet" in ln]) == 1
    assert "Join" not in plan


def test_confusion_matrix_one_pass_no_join(spark):
    """All four confusion cells from ONE aggregate (indicator sums),
    not four filtered scans."""
    plan = _simple_plan(spark, "ml_confusion_threshold")
    assert len([ln for ln in plan.splitlines() if "Scan parquet" in ln]) == 1
    assert "Join" not in plan


def test_skew_report_single_scan_stack_unpivot(spark):
    """The skew audit must unpivot map-side (stack), not scan the fact
    table once per key column."""
    plan = _simple_plan(spark, "rel_skew_report")
    assert len([ln for ln in plan.splitlines() if "Scan parquet" in ln]) == 1
    assert "Join" not in plan


def test_offset_pagination_plans_global_limit(spark):
    """LIMIT/OFFSET must plan a bounded global limit (offset+limit
    rows), never materialize the full sort."""
    plan = _simple_plan(spark, "rel_offset_fetch_pagination")
    assert "GlobalLimit" in plan or "TakeOrdered" in plan, plan


def test_roc_auc_hist_no_window_bounded_join(spark):
    """The scale-safe AUC must never plan a window (the exact variant's
    global rank is the audit path); the only join runs on the bounded
    bin histogram, broadcast."""
    plan = _simple_plan(spark, "ml_roc_auc_hist")
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_lift_bucketed_no_window_single_scan(spark):
    """Score-band lift: one fact scan, one groupBy, no window, no
    rank/NTILE total order anywhere."""
    plan = _simple_plan(spark, "ml_lift_bucketed")
    assert "Window" not in plan, plan
    assert len([ln for ln in plan.splitlines() if "Scan parquet" in ln]) == 1, plan


def test_abc_prefix2_only_partitioned_windows(spark):
    """The two-level prefix rewrite must run every window PARTITIONED
    (by the bounded range_id) — an unpartitioned windowspec here would
    recreate the single-task bottleneck it exists to remove."""
    df = all_queries()["rel_abc_prefix2"].spark(spark, SF)
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    plan = jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected a window in the plan"
    for s in specs:
        assert s.split(",")[0].strip().startswith("range_id"), (
            f"window not partitioned by range_id: {s}"
        )


def test_rfm_bucketed_no_window(spark):
    """Boundary-bucketed RFM must plan zero windows — the three
    NTILE sorts are exactly what this variant removes."""
    plan = _simple_plan(spark, "rel_rfm_bucketed")
    assert "Window" not in plan, plan


def test_join_explosion_histograms_join_counts_not_rows(spark):
    """The prediction side must join per-key COUNT frames; only the
    verification side touches the raw join."""
    df = all_queries()["rel_join_explosion_estimate"].spark(spark, SF)
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    plan = jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # both tables scanned exactly twice: once for histograms, once for
    # the actual-join verification
    scans = [ln for ln in plan.splitlines() if "Scan parquet" in ln]
    assert len(scans) == 4, plan


def _embs(spark):
    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    return load_table(spark, SF, "embeddings")


def _shuffle_exchange_ids(plan):
    """Unique shuffle-Exchange node ids in a formatted plan (excludes
    BroadcastExchange; formatted mode lists each node twice)."""
    return set(re.findall(r"(?<!Broadcast)Exchange \((\d+)\)", plan))


def test_pq_encode_is_map_only(spark):
    """The PQ docstring's billion-vector claim, pinned: encoding the
    full corpus against broadcast codebooks must plan ZERO exchanges —
    scan → prune → mapInPandas, embarrassingly parallel."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators import (
        similarity as S,
    )

    e = _embs(spark)
    plan = _plan(S.pq_encode(e, S.pq_train_codebooks(e, m=4, k=8), m=4))
    assert "Exchange" not in plan, "PQ encode must stay map-only"
    assert "Join" not in plan


def test_pq_adc_single_topk_shuffle_no_join(spark):
    """ADC search's scale shape: the lookup tables ship in the closure
    (bounded query batch), the code scan is map-side, and the ONLY
    shuffle is the per-query top-k — with a map-side WindowGroupLimit
    pruning to k before the exchange, so the shuffle moves at most
    k rows per (query, partition), never the scored corpus."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators import (
        similarity as S,
    )

    e = _embs(spark)
    books = S.pq_train_codebooks(e, m=4, k=8)
    q = e.limit(8).withColumnRenamed("vec_id", "query_id")
    plan = _plan(S.pq_adc_topk(e, books, q, k=5, m=4))
    assert "Join" not in plan, "ADC must not join against the corpus"
    assert len(_shuffle_exchange_ids(plan)) == 1, plan
    # partial top-k must prune BEFORE the shuffle (rank pushdown)
    tree = plan.split("\n\n")[0]
    pre_shuffle = tree[tree.index("Exchange") :]
    assert "WindowGroupLimit" in pre_shuffle


def test_ivf_probe_join_is_broadcast_no_sortmerge(spark):
    """IVF search must never sort-merge or cartesian the corpus: the
    centroid table (nlist rows) and the probe table (|queries|×nprobe
    rows) are both broadcast, so the corpus is touched by one
    BroadcastHashJoin on cell id and is never re-shuffled for the
    join."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators import (
        similarity as S,
    )

    e = _embs(spark)
    q = e.limit(8).withColumnRenamed("vec_id", "query_id")
    plan = _plan(S.ivf_topk(e, q, k=5, nlist=8, nprobe=3))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # probes → corpus, on cell id
