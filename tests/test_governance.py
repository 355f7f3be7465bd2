"""Gates for the round-4 governance/curriculum/eval wave
(plans/governance.py) beyond the oracle mirror: BPE encode/train
consistency, copy-on-write delete file-level behavior, statistical
correctness vs scipy-free closed forms, and plan-shape assertions for
the 100 TB designs the docstrings claim.
"""

from __future__ import annotations

import datetime
import glob
import math
import os

import pytest
from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

from .conftest import SF_SMOKE

SF = "/root/testdata/sf0.01"


def _plan(df, mode="formatted"):
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


# ---------------------------------------------------------------------------
# BPE encode
# ---------------------------------------------------------------------------


def test_bpe_encode_matches_training_histogram(spark):
    """Every distinct corpus word must encode (via the distributed
    pandas-UDF encoder) to EXACTLY the symbol count the training
    histogram ends with — replaying merges in order is the definition
    of BPE encoding for in-vocabulary words."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators.bpe import (
        encode_word,
        encode_words,
        train_bpe,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    merges, hist = train_bpe(docs, n_merges=15)
    assert merges, "corpus must produce merges"
    expected = {
        r["word"]: len(r["symbols"]) for r in hist.collect()
    }
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    got = {
        r["word"]: r["n_bpe_tokens"]
        for r in encode_words(words, merges).collect()
    }
    assert got == expected
    # and the pure-Python encoder agrees symbol-for-symbol on a sample
    merge_seq = [(a, b) for a, b, _ in merges]
    for w in list(expected)[:25]:
        assert len(encode_word(w, merge_seq)) == expected[w]


def test_bpe_encode_query_compression_sane(spark):
    rows = all_queries()["doc_bpe_encode"].spark(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    for r in rows:
        # BPE with </w> markers can't beat characters+1 per word, and
        # must compress at least as well as raw characters while never
        # beating 1 token per whitespace word
        assert r.n_bpe_tokens >= r.n_ws_tokens
        assert r.chars_per_token > 0


# ---------------------------------------------------------------------------
# Copy-on-write delete
# ---------------------------------------------------------------------------


def test_delete_where_rewrite_leaves_untouched_partitions_alone(spark):
    """The COW delete must rewrite ONLY partitions containing doomed
    rows: parquet files under every untouched partition directory are
    byte-identical (same names, same sizes) after the delete."""
    from real_time_predictive_maintenance_data_pipeline_spark.sources import scratch
    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    n = load_table(spark, SF_SMOKE, "nation").withColumn(
        "n_regionkey", F.col("n_regionkey").cast("long")
    )
    path = scratch.scratch_dir("cow_test_")
    n.write.partitionBy("n_regionkey").mode("overwrite").parquet(path)

    pred = F.col("n_name").like("%1")
    hit = {
        r.n_regionkey
        for r in spark.read.parquet(path)
        .filter(pred)
        .select("n_regionkey")
        .distinct()
        .collect()
    }
    all_parts = {
        r.n_regionkey
        for r in spark.read.parquet(path).select("n_regionkey").distinct().collect()
    }
    untouched = all_parts - hit
    assert hit and untouched, "fixture must have both touched and untouched"

    def snap(regs):
        out = {}
        for reg in regs:
            for f in glob.glob(os.path.join(path, f"n_regionkey={reg}", "*.parquet")):
                out[f] = os.path.getsize(f)
        return out

    before = snap(untouched)
    survivors = spark.read.parquet(path).filter(
        F.col("n_regionkey").isin(list(hit)) & ~pred
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        survivors.write.partitionBy("n_regionkey").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert snap(untouched) == before
    # and the doomed rows are gone while untouched partitions kept all rows
    back = spark.read.parquet(path)
    assert back.filter(pred).count() == 0
    assert (
        back.count()
        == n.count() - n.filter(pred).count()
    )


def test_delete_where_rewrite_drops_fully_deleted_partition(spark):
    """When EVERY row of a partition matches the delete predicate,
    dynamic overwrite writes nothing for it — the COW helper must still
    remove its files (the r4-advice gap: 'deleted' rows silently
    surviving the GDPR-style rewrite)."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
        copy_on_write_delete,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.sources import scratch

    df = spark.createDataFrame(
        [(p, i, f"name_{p}_{i}") for p in range(4) for i in range(5)],
        "part long, id long, name string",
    )
    path = scratch.scratch_dir("cow_full_delete_")
    df.write.partitionBy("part").mode("overwrite").parquet(path)

    # partition 1 fully matches; partition 2 partially; 0 and 3 untouched
    pred = (F.col("part") == 1) | ((F.col("part") == 2) & (F.col("id") < 2))
    copy_on_write_delete(spark, path, pred, "part")

    assert not glob.glob(os.path.join(path, "part=1", "*.parquet")), (
        "fully-deleted partition's files must be removed"
    )
    back = spark.read.parquet(path)
    assert back.filter(F.col("part") == 1).count() == 0
    assert back.filter(F.col("part") == 2).count() == 3
    assert back.count() == 20 - 5 - 2


def test_delete_where_rewrite_escaped_string_partition(spark):
    """String partition values needing Hive path-escaping (spaces, ':',
    '/') must still have their directories dropped when fully deleted —
    Spark writes `part=a%3Ab`, so the raw f-string `part=a:b` path never
    matches (the r5-advice gap)."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
        copy_on_write_delete,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.sources import scratch

    parts = ["plain", "a:b", "with space", "pct%20"]
    df = spark.createDataFrame(
        [(p, i) for p in parts for i in range(3)],
        "part string, id long",
    )
    path = scratch.scratch_dir("cow_escaped_delete_")
    df.write.partitionBy("part").mode("overwrite").parquet(path)

    # every escaping-hazard partition fully matches; 'plain' survives
    pred = F.col("part") != "plain"
    copy_on_write_delete(spark, path, pred, "part")

    leftovers = [
        d
        for d in glob.glob(os.path.join(path, "part=*"))
        if glob.glob(os.path.join(d, "*.parquet"))
    ]
    assert leftovers == [os.path.join(path, "part=plain")], (
        f"fully-deleted escaped partitions must be removed, found {leftovers}"
    )
    back = spark.read.parquet(path)
    assert back.count() == 3
    assert back.select("part").distinct().collect()[0][0] == "plain"


def test_delete_where_rewrite_nonstring_partition_rendering(spark):
    """Partition values whose Spark path rendering differs from Python
    str() — timestamps with fractional seconds (`.123` vs `.123000`),
    large doubles (`5.0E10` vs `50000000000.0`), booleans (`true` vs
    `True`) — must still have their directories dropped when fully
    deleted (the r6-review gap: escaping fixed only the character-level
    half; value rendering diverged)."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
        copy_on_write_delete,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.sources import scratch

    cases = [
        (
            "ts",
            "part timestamp, id long",
            [
                (datetime.datetime(2024, 1, 2, 3, 4, 5, 123000), i)
                for i in range(3)
            ]
            + [(datetime.datetime(2024, 6, 1), i) for i in range(3)],
            F.col("part") == datetime.datetime(2024, 1, 2, 3, 4, 5, 123000),
        ),
        (
            "dbl",
            "part double, id long",
            [(5.0e10, i) for i in range(3)] + [(1.5, i) for i in range(3)],
            F.col("part") == 5.0e10,
        ),
        (
            "bool",
            "part boolean, id long",
            [(True, i) for i in range(3)] + [(False, i) for i in range(3)],
            F.col("part") == True,  # noqa: E712
        ),
    ]
    for tag, schema, rows, pred in cases:
        df = spark.createDataFrame(rows, schema)
        path = scratch.scratch_dir(f"cow_render_{tag}_")
        df.write.partitionBy("part").mode("overwrite").parquet(path)
        copy_on_write_delete(spark, path, pred, "part")
        leftovers = [
            d
            for d in glob.glob(os.path.join(path, "part=*"))
            if glob.glob(os.path.join(d, "*.parquet"))
        ]
        assert len(leftovers) == 1, (
            f"{tag}: fully-deleted partition dir must be removed, "
            f"found {leftovers}"
        )
        back = spark.read.parquet(path)
        assert back.count() == 3, tag
        assert back.filter(pred).count() == 0, tag


def test_delete_where_rewrite_null_partition_and_null_pred(spark):
    """DELETE-WHERE null semantics: rows in a NULL-keyed partition that
    do NOT match the predicate must survive (isin never matches NULL, so
    a naive membership filter would drop then delete them), and rows
    where the predicate evaluates to NULL must survive (SQL DELETE only
    removes pred IS TRUE)."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
        copy_on_write_delete,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.sources import scratch

    df = spark.createDataFrame(
        [(None, 0, 10), (None, 1, None), (None, 2, 99), ("a", 3, 10), ("a", 4, 20)],
        "part string, id long, v long",
    )
    path = scratch.scratch_dir("cow_null_sem_")
    df.write.partitionBy("part").mode("overwrite").parquet(path)

    # v = 10 deletes id 0 (null partition) and id 3; v IS NULL on id 1
    # makes the predicate NULL there — id 1 must survive.
    copy_on_write_delete(spark, path, F.col("v") == 10, "part")

    back = spark.read.parquet(path)
    got = sorted((r.id, r.v) for r in back.collect())
    assert got == [(1, None), (2, 99), (4, 20)]
    # the NULL-keyed partition still exists with its two survivors
    assert back.filter(F.col("part").isNull()).count() == 2

    # now fully empty the NULL-keyed partition: its directory must go
    copy_on_write_delete(spark, path, F.col("part").isNull(), "part")
    assert not glob.glob(
        os.path.join(path, "part=__HIVE_DEFAULT_PARTITION__", "*.parquet")
    )
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == [4]


# ---------------------------------------------------------------------------
# Statistics closed-form checks
# ---------------------------------------------------------------------------


def test_ab_ttest_matches_python_closed_form(spark):
    """t and Welch df recomputed in pure Python from the raw rows."""
    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    got = {
        r.event_type: r
        for r in all_queries()["rel_ab_ttest"].spark(spark, SF_SMOKE).collect()
    }
    rows = load_table(spark, SF_SMOKE, "events").select(
        "event_type", (F.col("user_id") % 2).alias("v"), "value"
    ).collect()
    by = {}
    for r in rows:
        by.setdefault((r.event_type, r.v), []).append(round(r.value * 100))
    for et, g in got.items():
        a, b = by[(et, 0)], by[(et, 1)]
        na, nb = len(a), len(b)
        ma, mb = sum(a) / na / 100, sum(b) / nb / 100
        va = (sum(x * x for x in a) - sum(a) ** 2 / na) / (na - 1) / 10000
        vb = (sum(x * x for x in b) - sum(b) ** 2 / nb) / (nb - 1) / 10000
        se2 = va / na + vb / nb
        t = (ma - mb) / math.sqrt(se2)
        df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
        assert g.n_a == na and g.n_b == nb
        assert g.t_stat == pytest.approx(t, abs=1e-3)
        assert g.welch_df == pytest.approx(df, abs=1e-2)


def test_chi_square_matches_python_closed_form(spark):
    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    row = all_queries()["rel_chi_square"].spark(spark, SF_SMOKE).collect()[0]
    obs = {}
    for r in load_table(spark, SF_SMOKE, "documents").groupBy(
        "lang", "source"
    ).count().collect():
        obs[(r.lang, r.source)] = r["count"]
    langs = {k[0] for k in obs}
    srcs = {k[1] for k in obs}
    n = sum(obs.values())
    chi2 = 0.0
    for (lg, sc), o in obs.items():
        row_tot = sum(v for k, v in obs.items() if k[0] == lg)
        col_tot = sum(v for k, v in obs.items() if k[1] == sc)
        e = row_tot * col_tot / n
        chi2 += (o - e) ** 2 / e
    assert row.n_cells == len(obs)
    assert row.dof == (len(langs) - 1) * (len(srcs) - 1)
    assert row.chi2 == pytest.approx(chi2, abs=1e-2)


# ---------------------------------------------------------------------------
# Plan shapes (100 TB designs the docstrings claim)
# ---------------------------------------------------------------------------


def test_curriculum_order_is_map_only(spark):
    """Deterministic shuffle-key assignment must not shuffle: no
    Exchange in the plan beyond spread()'s input round-robin on tiny
    local fixtures (the claimed advantage over an ntile /
    global-row_number curriculum)."""
    df = all_queries()["doc_curriculum_order"].spark(spark, SF)
    # simple mode prints partitioning inline on the Exchange node
    plan = _plan(df, "simple")
    exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert not exchanges, exchanges


def test_normalize_text_is_map_only(spark):
    df = all_queries()["doc_normalize_text"].spark(spark, SF)
    plan = _plan(df, "simple")
    exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert not exchanges, exchanges


def test_recall_eval_broadcasts_query_side(spark):
    """The brute-force eval must broadcast the tiny query sample (the
    corpus side must NOT shuffle into a join)."""
    df = all_queries()["emb_recall_eval"].spark(spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_incremental_batch_joins_on_digest(spark):
    """The incremental dedup join key must include the sha2 digest so
    the shuffle moves 32-byte keys, not document bodies."""
    df = all_queries()["dedup_incremental_batch"].spark(spark, SF)
    plan = _plan(df, "extended")
    assert "sha2" in plan


def test_ab_ttest_single_fact_aggregation(spark):
    """Sufficient-statistics shape: BOTH cohorts' statistics come from
    ONE conditional-aggregation pass — exactly one scan of the events
    fact and no join anywhere."""
    df = all_queries()["rel_ab_ttest"].spark(spark, SF)
    plan = _plan(df, "simple")
    scans = [ln for ln in plan.splitlines() if "Scan parquet" in ln]
    assert len(scans) == 1, scans
    assert "Join" not in plan


def test_token_budget_respects_budget_and_order(spark):
    rows = (
        all_queries()["doc_token_budget_select"].spark(spark, SF_SMOKE).collect()
    )
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (-r.quality, r.doc_id))
        cum = 0
        for r in rs:
            cum += r.n_tokens
            assert r.cum_tokens == cum
            assert cum <= 1500


def test_basket_pairs_apriori_shape(spark):
    """Pair generation must be an equi-join on the basket key (pairs
    form only inside an order) with the supports re-attached by
    broadcast — the pair table must not reshuffle."""
    df = all_queries()["rel_basket_pairs_lift"].spark(spark, SF)
    plan = _plan(df, "simple")
    assert "CartesianProduct" not in plan
    # support + total joins are broadcast
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # 1-row total cross join


def test_activity_streaks_single_user_shuffle(spark):
    """Island window, island grouping, and the per-user rollup must
    all ride ONE hash exchange on user_id (plus the distinct's own
    exchange) — no repeated reshuffling of the same key."""
    df = all_queries()["events_activity_streaks"].spark(spark, SF)
    plan = _plan(df, "simple")
    # exchanges: one for the distinct (user_id, day) dedup, one for the
    # user_id window; the groupBys reuse the window's partitioning
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_activity_streaks_islands_correct(spark):
    """Streak arithmetic on a hand-checkable reconstruction."""
    from real_time_predictive_maintenance_data_pipeline_spark.functions.timeutil import (
        epoch_us,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    got = {
        r.user_id: r
        for r in all_queries()["events_activity_streaks"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    days = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            F.floor(epoch_us(F.col("ts")) / F.lit(86400_000_000)).alias("d"),
        )
        .distinct()
        .collect()
    )
    by_user = {}
    for r in days:
        by_user.setdefault(r.user_id, set()).add(r.d)
    for uid, ds in by_user.items():
        ds = sorted(ds)
        streaks = []
        cur = 1
        for prev, nxt in zip(ds, ds[1:]):
            if nxt == prev + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        g = got[uid]
        assert g.n_active_days == len(ds)
        assert g.n_streaks == len(streaks)
        assert g.longest_streak == max(streaks)


def test_state_spans_single_user_shuffle(spark):
    """lag window, span-id running sum, span grouping, and the final
    rollup must all reuse ONE hash exchange on user_id."""
    df = all_queries()["events_state_spans"].spark(spark, SF)
    plan = _plan(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_state_spans_rle_correct(spark):
    """RLE span stats recomputed in pure Python per machine."""
    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    got = {
        r.user_id: r
        for r in all_queries()["events_state_spans"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        spans = []
        for r in rs:
            if spans and spans[-1][0] == r.event_type:
                spans[-1][1].append(r)
            else:
                spans.append((r.event_type, [r]))
        g = got[uid]
        assert g.n_spans == len(spans)
        assert g.longest_span_events == max(len(s[1]) for s in spans)


def test_cms_never_underestimates_and_merges(spark):
    """CMS invariants: estimate >= exact for every probe (one-sided
    error), and the sketch is mergeable — building on two disjoint
    halves and summing cells equals the single-pass sketch."""
    from pyspark.sql import functions as F

    rows = (
        all_queries()["rel_cms_freq_estimate"].spark(spark, SF_SMOKE).collect()
    )
    assert rows
    for r in rows:
        assert r.overestimate >= 0
        assert r.estimate >= r.exact_n

    # mergeability on the raw cells
    from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
        _CMS_HASHES,
        _CMS_P,
        _CMS_W,
    )

    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select("l_partkey")

    def cells(df):
        out = {}
        for r in df.collect():
            for i, (a, b) in enumerate(_CMS_HASHES):
                k = (i, (a * r.l_partkey + b) % _CMS_P % _CMS_W)
                out[k] = out.get(k, 0) + 1
        return out

    full = cells(l)
    h1 = cells(l.filter(F.col("l_partkey") % 2 == 0))
    h2 = cells(l.filter(F.col("l_partkey") % 2 == 1))
    merged = dict(h1)
    for k, v in h2.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == full


def test_holt_linear_matches_python_recursion(spark):
    """Level/trend/forecasts recomputed with the sequential Holt
    recursion in pure Python over the same hourly-mean series."""
    from real_time_predictive_maintenance_data_pipeline_spark.functions.timeutil import (
        epoch_bucket,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    got = {
        r.user_id: r
        for r in all_queries()["ts_holt_linear"].spark(spark, SF_SMOKE).collect()
    }
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id", epoch_bucket(F.col("ts"), 3600).alias("b"))
        .agg(
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / F.count(F.lit(1))
                / 100
            ).alias("v")
        )
        .collect()
    )
    series = {}
    for r in rows:
        series.setdefault(r.user_id, []).append((r.b, r.v))
    a, bt = 0.3, 0.1
    for uid, pts in series.items():
        vals = [v for _, v in sorted(pts)]
        l, t = vals[0], 0.0
        for x in vals[1:]:
            nl = a * x + (1 - a) * (l + t)
            t = bt * (nl - l) + (1 - bt) * t
            l = nl
        g = got[uid]
        assert g.n_obs == len(vals)
        assert g.level == pytest.approx(l, abs=1e-3)
        assert g.trend == pytest.approx(t, abs=1e-3)
        assert g.forecast_3 == pytest.approx(l + 3 * t, abs=1e-3)


def test_spatial_grid_join_equals_brute_force(spark):
    """The 3x3 grid neighborhood must be lossless: grid-join pairs ==
    brute-force all-pairs radius filter, each pair exactly once."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
        _GEO_RADIUS,
    )

    rows = (
        all_queries()["rel_spatial_grid_join"].spark(spark, SF).collect()
    )
    got = {(r.id_a, r.id_b) for r in rows}
    assert len(got) == len(rows), "pair emitted more than once"
    s = spark.read.parquet(f"{SF}/supplier.parquet").select("s_suppkey").collect()
    pts = {
        r.s_suppkey: (
            (r.s_suppkey * 73 % 1600) / 10 - 80,
            (r.s_suppkey * 131 % 3600) / 10 - 180,
        )
        for r in s
    }
    expected = set()
    ids = sorted(pts)
    for i, ia in enumerate(ids):
        for ib in ids[i + 1 :]:
            (la, lo), (lb, lo2) = pts[ia], pts[ib]
            if (la - lb) ** 2 + (lo - lo2) ** 2 <= _GEO_RADIUS**2:
                expected.add((ia, ib))
    assert got == expected


def test_capped_balance_matches_python_fold(spark):
    from real_time_predictive_maintenance_data_pipeline_spark.functions.timeutil import (
        epoch_us,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    got = {
        r.user_id: r
        for r in all_queries()["rel_capped_running_balance"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            epoch_us(F.col("ts")).alias("t"),
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    by = {}
    for r in rows:
        d = r.c if r.event_type in ("purchase", "signup", "view") else -r.c
        by.setdefault(r.user_id, []).append((r.t, r.event_id, d))
    for uid, ds in by.items():
        bal, hits = 0, 0
        for _, _, d in sorted(ds):
            if bal + d < 0:
                hits += 1
            bal = max(0, bal + d)
        g = got[uid]
        assert g.n_events == len(ds)
        assert g.final_balance_cents == bal
        assert g.n_floor_hits == hits


def test_fifo_allocation_conserves_quantities(spark):
    """Allocation must conserve: per demand line, allocations sum to
    min(demand, remaining supply coverage); per supply lot they never
    exceed the lot; and every allocation is positive."""
    rows = all_queries()["rel_fifo_allocation"].spark(spark, SF_SMOKE).collect()
    assert rows
    per_supply = {}
    per_demand = {}
    for r in rows:
        assert r.alloc_qty > 0
        per_supply.setdefault(
            (r.partkey, r.supply_order, r.supply_line), 0
        )
        per_supply[(r.partkey, r.supply_order, r.supply_line)] += r.alloc_qty
        per_demand.setdefault(
            (r.partkey, r.demand_order, r.demand_line), 0
        )
        per_demand[(r.partkey, r.demand_order, r.demand_line)] += r.alloc_qty
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    qty = {}
    for r in l:
        k = (r.l_partkey, r.l_orderkey, r.l_linenumber)
        qty[k] = qty.get(k, 0) + int(r.l_quantity)
    for k, alloc in per_supply.items():
        assert alloc <= qty[k], ("supply overallocated", k)
    for k, alloc in per_demand.items():
        assert alloc <= qty[k], ("demand overfilled", k)


def test_snapshot_diff_roundtrip_with_changelog_apply(spark):
    """Composition proof: applying the derived diff to v1 reproduces
    v2 exactly — snapshot_diff and changelog-apply are inverses."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    o = load_table(spark, SF_SMOKE, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v1 = {
        r.o_orderkey: (r.o_orderpriority, r.price_cents)
        for r in o.filter(F.col("o_orderkey") % 101 != 0)
        .select("o_orderkey", "o_orderpriority", cents.alias("price_cents"))
        .collect()
    }
    v2 = {
        r.o_orderkey: (r.o_orderpriority, r.price_cents)
        for r in o.filter(F.col("o_orderkey") % 103 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 97 == 0, F.lit("1-URGENT"))
            .otherwise(F.col("o_orderpriority"))
            .alias("o_orderpriority"),
            cents.alias("price_cents"),
        )
        .collect()
    }
    diff = all_queries()["rel_snapshot_diff"].spark(spark, SF_SMOKE).collect()
    applied = dict(v1)
    for r in diff:
        if r.op == "D":
            del applied[r.o_orderkey]
        else:
            applied[r.o_orderkey] = (r.new_priority, r.new_price_cents)
    assert applied == v2
    # and the diff is minimal: every emitted U actually changes a column
    for r in diff:
        if r.op == "U":
            assert v1[r.o_orderkey] != (r.new_priority, r.new_price_cents)


def test_equidepth_buckets_balanced(spark):
    rows = (
        all_queries()["rel_equidepth_histogram"].spark(spark, SF_SMOKE).collect()
    )
    total = sum(r.n for r in rows)
    assert total == spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    # buckets contiguous, boundaries monotone
    rows.sort(key=lambda r: r.bucket)
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
    # equi-depth within a tolerance driven by value ties
    avg = total / len(rows)
    for r in rows:
        assert r.n <= avg * 1.5


def test_fifo_join_is_equi_on_partkey(spark):
    """The overlap conditions must ride an EQUI join on the part key
    (interval tests as join filters), never a nested-loop cross."""
    df = all_queries()["rel_fifo_allocation"].spark(spark, SF)
    plan = _plan(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snapshot_diff_single_key_join(spark):
    df = all_queries()["rel_snapshot_diff"].spark(spark, SF)
    plan = _plan(df, "simple")
    assert plan.count("Join") == 1
    assert "FullOuter" in plan


def test_isotonic_calibration_monotone(spark):
    rows = sorted(
        all_queries()["ml_isotonic_calibration"].spark(spark, SF_SMOKE).collect(),
        key=lambda r: r.knot,
    )
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert a.score_boundary <= b.score_boundary
        assert a.calibrated_p <= b.calibrated_p  # isotonic
    for r in rows:
        assert 0.0 <= r.calibrated_p <= 1.0


def test_cv_selects_perfect_candidate(spark):
    rows = all_queries()["ml_cv_model_selection"].spark(spark, SF_SMOKE).collect()
    assert len(rows) == 4  # 2 x 2 grid
    best = [r for r in rows if r.is_best]
    assert len(best) == 1
    # the classes are separable by construction; tuning must find a
    # near-perfect candidate (same bar as the reference's 1.00/1.00)
    assert best[0].mean_f1 >= 0.999
    assert best[0].mean_f1 == max(r.mean_f1 for r in rows)


def test_kaplan_meier_curve_valid(spark):
    """KM invariants: survival non-increasing in [0,1]; risk sets
    strictly decreasing; recompute matches the textbook product."""
    rows = sorted(
        all_queries()["ml_kaplan_meier"].spark(spark, SF_SMOKE).collect(),
        key=lambda r: r.t_hours,
    )
    assert rows
    s_prev, n_prev = 1.0 + 1e-9, None
    surv = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= s_prev + 1e-9
        if n_prev is not None:
            assert r.n_risk < n_prev
        surv *= 1.0 - r.n_failed / r.n_risk
        assert r.survival == pytest.approx(surv, abs=1e-3)
        s_prev, n_prev = r.survival, r.n_risk


def test_bucketed_groupby_no_shuffle(spark):
    """The aggregation on the bucket key must plan ZERO exchanges —
    the bucketed scan already satisfies the required distribution."""
    df = all_queries()["src_bucketed_groupby"].spark(spark, SF)
    try:
        plan = _plan(df, "simple")
        assert "Exchange" not in plan, plan
        assert "HashAggregate" in plan or "SortAggregate" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed_gb")
