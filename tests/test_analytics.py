"""Closed-form cross-checks for the round-5 analytics wave
(plans/analytics.py) — pure-Python recomputations from the raw fixture
rows, independent of the DuckDB oracle (which shares SQL semantics and
could in principle share a misreading of the statistic).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
    load_table,
)

from .conftest import SF_SMOKE


def test_gini_matches_python_closed_form(spark):
    got = {
        r.nationkey: r.gini
        for r in all_queries()["rel_gini_coefficient"].spark(spark, SF_SMOKE).collect()
    }
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).alias("cents"))
        .collect()
    )
    by_nation = defaultdict(list)
    for r in rows:
        by_nation[r.c_nationkey].append((int(r.cents), r.c_custkey))
    for nk, vals in by_nation.items():
        xs = [v for v, _ in sorted(vals, key=lambda t: (t[0], t[1]))]
        n, tot = len(xs), sum(xs)
        gini = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (
            n + 1.0
        ) / n
        assert abs(got[nk] - round(gini, 4)) < 1e-9, (nk, got[nk], gini)
        assert -1e-9 <= got[nk] <= 1.0


def test_roc_auc_matches_tie_aware_python(spark):
    row = all_queries()["ml_roc_auc"].spark(spark, SF_SMOKE).collect()[0]
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    pairs = []
    for r in li:
        y = 1 if r.l_returnflag == "R" else 0
        s = ((r.l_partkey * 31 + r.l_suppkey * 7 + r.l_linenumber) % 1000) / 1000.0 + (
            0.4 if y else 0.0
        )
        pairs.append((s, y))
    # average ranks with tie handling
    pairs.sort(key=lambda t: t[0])
    ranks: dict[float, float] = {}
    i = 0
    while i < len(pairs):
        j = i
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            j += 1
        ranks[pairs[i][0]] = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        i = j
    n_pos = sum(y for _, y in pairs)
    n_neg = len(pairs) - n_pos
    rank_sum = sum(ranks[s] for s, y in pairs if y == 1)
    auc = (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert abs(row.auc - auc) < 1e-12
    assert row.auc > 0.5  # the +0.4 signal term must make it informative


def test_roc_auc_hist_close_to_exact_rank_auc(spark):
    """The histogram variant must reproduce the exact tie-corrected
    Mann-Whitney AUC to bin resolution. Exact equality is impossible
    even on this quantized score: float addition leaves some y=1
    scores 1 ulp off their y=0 twins — the exact rank separates those,
    a 1/1000 bin cannot, so the tolerance is the bin-edge mass."""
    exact = all_queries()["ml_roc_auc"].spark(spark, SF_SMOKE).collect()[0]
    hist = all_queries()["ml_roc_auc_hist"].spark(spark, SF_SMOKE).collect()[0]
    assert hist.n_pos == exact.n_pos and hist.n_neg == exact.n_neg
    assert abs(hist.auc - exact.auc) < 1e-3
    assert hist.auc > 0.5
    assert 0 < hist.n_bins <= 1401


def test_lift_bucketed_consistent_with_totals(spark):
    """Score-band lift table: buckets tile the score domain, counts sum
    to the fact count, and lift·base_rate == response_rate per bucket."""
    rows = all_queries()["ml_lift_bucketed"].spark(spark, SF_SMOKE).collect()
    li_n = load_table(spark, SF_SMOKE, "lineitem").count()
    assert sum(r.n for r in rows) == li_n
    n_pos = sum(r.n_pos for r in rows)
    base = n_pos / li_n
    for r in rows:
        assert 0 <= r.bucket <= 14
        assert abs(r.response_rate - r.n_pos / r.n) < 1e-12
        assert abs(r.lift - round(r.response_rate / base, 4)) < 1e-9
    # the signal term (+0.4 on positives) must concentrate positives in
    # high buckets: top band lift > 1 > bottom band lift
    by_bucket = sorted(rows, key=lambda r: r.bucket)
    assert by_bucket[-1].lift > 1.0 > by_bucket[0].lift


def test_abc_prefix2_equals_exact(spark):
    """The two-level-prefix rewrite must be BYTE-identical to the
    single-window ABC classification — same total order, same exact
    integer prefix sums, same class boundaries."""
    exact = {
        r.partkey: (r.rev_tmt, r.cum_share, r.abc_class)
        for r in all_queries()["rel_abc_classification"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    two = {
        r.partkey: (r.rev_tmt, r.cum_share, r.abc_class)
        for r in all_queries()["rel_abc_prefix2"].spark(spark, SF_SMOKE).collect()
    }
    assert two == exact


def test_rfm_bucketed_matches_exact_ntile(spark):
    """Boundary-bucketed RFM vs exact NTILE: continuous-ish axes
    (recency, monetary) agree on ≥90 % of customers; the frequency
    axis is tie-heavy small integers where NTILE *forcibly splits tie
    runs* by custkey while value-bucketing cannot — ≥75 % there is the
    honest bound (the disagreements are entirely within tie runs).
    Every bucket holds 10–30 % of the customers."""
    exact = {
        r.custkey: (r.r_score, r.f_score, r.m_score)
        for r in all_queries()["rel_rfm_segmentation"].spark(spark, SF_SMOKE).collect()
    }
    buck = {
        r.custkey: (r.r_score, r.f_score, r.m_score)
        for r in all_queries()["rel_rfm_bucketed"].spark(spark, SF_SMOKE).collect()
    }
    assert set(buck) == set(exact)
    n = len(exact)
    for axis, floor_agree in ((0, 0.90), (1, 0.75), (2, 0.90)):
        agree = sum(1 for k in exact if exact[k][axis] == buck[k][axis])
        assert agree / n >= floor_agree, f"axis {axis}: only {agree}/{n} agree"
        for score in range(1, 6):
            cnt = sum(1 for k in buck if buck[k][axis] == score)
            assert 0.10 * n <= cnt <= 0.30 * n, (
                f"axis {axis} score {score}: {cnt}/{n} outside balance band"
            )


def test_max_drawdown_matches_python_loop(spark):
    got = {
        r.event_type: r
        for r in all_queries()["ts_max_drawdown"].spark(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events").collect()
    series = defaultdict(list)
    for r in ev:
        series[r.event_type].append((r.ts, r.event_id, round(r.value * 100)))
    for et, rows in series.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        cum = peak = 0
        best_cum = None
        dd = 0
        for _, _, cents in rows:
            cum += cents
            peak = max(peak if best_cum is not None else cum, cum)
            best_cum = cum if best_cum is None else max(best_cum, cum)
            dd = max(dd, best_cum - cum)
        assert got[et].max_drawdown_cents == dd, et
        assert got[et].high_cents == best_cum


def test_cumulative_users_final_equals_total_distinct(spark):
    rows = (
        all_queries()["events_cumulative_users"]
        .spark(spark, SF_SMOKE)
        .orderBy("day")
        .collect()
    )
    e = load_table(spark, SF_SMOKE, "events")
    total = e.select("user_id").distinct().count()
    assert rows[-1].cumulative_users == total
    assert sum(r.new_users for r in rows) == total
    # running sum is monotone and matches its own prefix sums
    acc = 0
    for r in rows:
        acc += r.new_users
        assert r.cumulative_users == acc


def test_js_divergence_bounds_and_python_value(spark):
    row = all_queries()["doc_js_divergence"].spark(spark, SF_SMOKE).collect()[0]
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in docs:
        (ca if r.source == "src0" else cb).update(r.text.split(" "))
    vocab = set(ca) | set(cb)
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    js = 0.0
    for w in vocab:
        pa = (ca[w] + 1.0) / (na + v)
        pb = (cb[w] + 1.0) / (nb + v)
        m = (pa + pb) / 2
        js += 0.5 * pa * math.log(pa / m) + 0.5 * pb * math.log(pb / m)
    js /= math.log(2)
    assert row.vocab_size == v
    assert abs(row.js_divergence_bits - round(js, 4)) < 1e-9
    assert 0.0 <= row.js_divergence_bits <= 1.0  # JS in bits is bounded by 1


def test_rfm_quintiles_are_balanced(spark):
    rows = all_queries()["rel_rfm_segmentation"].spark(spark, SF_SMOKE).collect()
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        sizes = Counter(getattr(r, col) for r in rows)
        assert sorted(sizes) == [1, 2, 3, 4, 5]
        # NTILE balance: bucket sizes differ by at most 1
        assert max(sizes.values()) - min(sizes.values()) <= 1
        assert sum(sizes.values()) == n


def test_abc_classes_partition_by_share(spark):
    rows = (
        all_queries()["rel_abc_classification"]
        .spark(spark, SF_SMOKE)
        .orderBy("cum_share", "partkey")
        .collect()
    )
    # cumulative share is monotone in [0, 1] and ends at 1
    shares = [r.cum_share for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-9
    # classes are a monotone A->B->C partition of the ranking
    classes = "".join(r.abc_class for r in rows)
    assert classes == "A" * classes.count("A") + "B" * classes.count(
        "B"
    ) + "C" * classes.count("C")


def test_bollinger_window_spot_check(spark):
    rows = (
        all_queries()["ts_bollinger_bands"]
        .spark(spark, SF_SMOKE)
        .filter(F.col("event_type") == "purchase")
        .orderBy("ts_us")
        .collect()
    )
    ev = [
        (r["us"], r["event_id"], round(r["value"] * 100))
        for r in load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.expr(
                "timestampdiff(MICROSECOND, "
                "to_timestamp('1970-01-01 00:00:00'), ts)"
            ).alias("us"),
            "event_id",
            "value",
        )
        .collect()
    ]
    ev.sort(key=lambda t: (t[0], t[1]))
    # recompute the 20th observation's band (first emitted row)
    window = [c for _, _, c in ev[:20]]
    n, s = len(window), sum(window)
    ss = sum(c * c for c in window)
    ma = s / n / 100.0
    sd = math.sqrt((ss - s * s / n) / (n - 1)) / 100.0
    first = rows[0]
    assert first.ts_us == ev[19][0]
    assert abs(first.ma20 - round(ma, 4)) < 1e-9
    assert abs(first.upper_band - round(ma + 2 * sd, 4)) < 1e-9
    assert abs(first.lower_band - round(ma - 2 * sd, 4)) < 1e-9


def test_cuped_theta_matches_python(spark):
    rows = all_queries()["rel_cuped_adjustment"].spark(spark, SF_SMOKE).collect()
    e = load_table(spark, SF_SMOKE, "events").collect()
    cut = (19723 + 15) * 86_400_000_000
    epoch = lambda ts: int(ts.timestamp() * 1_000_000)  # noqa: E731
    per_user: dict[int, list[int]] = {}
    for r in e:
        x, y = per_user.setdefault(r.user_id, [0, 0])
        us = epoch(r.ts.replace(tzinfo=__import__("datetime").timezone.utc))
        c = round(r.value * 100)
        if us < cut:
            per_user[r.user_id][0] = x + c
        else:
            per_user[r.user_id][1] = y + c
    xs = [v[0] for v in per_user.values()]
    ys = [v[1] for v in per_user.values()]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    for r in rows:
        assert abs(r.theta - theta) < 1e-12
    # CUPED must preserve the overall mean: weighted avg of adjusted
    # variant means equals the raw overall mean
    tot_users = sum(r.n_users for r in rows)
    raw = sum(r.mean_y * r.n_users for r in rows) / tot_users
    adj = sum(r.mean_y_cuped * r.n_users for r in rows) / tot_users
    assert abs(raw - adj) < 1e-9
    assert abs(raw - sy / n / 100.0) < 1e-9


def test_bootstrap_ci_brackets_the_mean(spark):
    row = all_queries()["rel_bootstrap_ci"].spark(spark, SF_SMOKE).collect()[0]
    assert row.n_replicates == 100
    assert row.ci_lo < row.mean_full < row.ci_hi
    # half-sample replicate means cannot stray absurdly far
    assert (row.ci_hi - row.ci_lo) / row.mean_full < 0.5


def test_srm_chi2_matches_python(spark):
    row = all_queries()["rel_srm_check"].spark(spark, SF_SMOKE).collect()[0]
    e = load_table(spark, SF_SMOKE, "events")
    users = {
        r.variant: r.n
        for r in e.groupBy((F.col("user_id") % 2).alias("variant"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    n = users[0] + users[1]
    chi2 = sum((users[v] - n / 2.0) ** 2 / (n / 2.0) for v in (0, 1))
    assert row.users_a == users[0] and row.users_b == users[1]
    assert abs(row.chi2_stat - chi2) < 1e-12


def test_join_explosion_prediction_is_exact(spark):
    rows = (
        all_queries()["rel_join_explosion_estimate"].spark(spark, SF_SMOKE).collect()
    )
    assert rows, "buckets must exist"
    for r in rows:
        assert r.predicted_rows == r.actual_rows
