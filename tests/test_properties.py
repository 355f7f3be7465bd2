"""Property-based tests (hypothesis) for engine invariants.

Spark round-trips are slow per example, so DataFrame properties cap
``max_examples`` low; pure-Python helpers get full example counts.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_predictive_maintenance_data_pipeline_spark.operators.multimodal import (
    _fake_decode,
)

# ---------------------------------------------------------------------------
# Pure helpers — cheap, many examples
# ---------------------------------------------------------------------------


@given(st.binary(min_size=0, max_size=512))
def test_fake_decode_total_and_deterministic(buf):
    a = _fake_decode(buf)
    b = _fake_decode(buf)
    assert a == b
    checksum, w, h = a
    assert 0 <= checksum < 1_000_000_007
    assert 16 <= w < 80 and 16 <= h < 80


@given(st.binary(min_size=1, max_size=2048), st.integers(1, 8))
def test_frame_accounting_invariants(buf, every_n):
    """Frame sampling math: idx stride, positive sizes, full coverage of
    the sampled frames."""
    frame = 256
    n_frames = max(1, -(-len(buf) // frame))
    idxs = list(range(0, n_frames, every_n))
    sizes = [min(frame, len(buf) - i * frame) for i in idxs]
    assert all(s > 0 for s in sizes)
    assert idxs[0] == 0
    assert all(b - a == every_n for a, b in zip(idxs, idxs[1:]))


# ---------------------------------------------------------------------------
# DataFrame properties — few examples, real Spark
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=0, max_size=40
    ),
    n_salts=st.integers(1, 6),
)
def test_salted_join_property(spark, pairs, n_salts):
    """salted inner join == plain inner join for arbitrary key multisets
    (including duplicate keys on both sides)."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.operators.skew import (
        salted_join,
    )

    left = spark.createDataFrame(
        [(a, i) for i, (a, _) in enumerate(pairs)] or [(0, 0)], "k INT, lv INT"
    )
    right = spark.createDataFrame(
        [(b, i) for i, (_, b) in enumerate(pairs)] or [(1, 0)], "k INT, rv INT"
    )
    plain = sorted(tuple(r) for r in left.join(right, "k").collect())
    salted = sorted(
        tuple(r) for r in salted_join(left, right, "k", n_salts=n_salts).collect()
    )
    assert plain == salted


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=12,
    )
)
def test_exact_dedup_partition_property(spark, texts):
    """exact_dedup groups partition the input: group sizes sum to the
    row count; each keeper id belongs to its group."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.operators.dedup import (
        exact_dedup,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    out = exact_dedup(df).collect()
    assert sum(r.n_copies for r in out) == len(texts)
    assert len(out) == len(set(texts))
    keepers = {r.keeper_id for r in out}
    assert keepers <= set(range(len(texts)))


def test_hll_sketch_merge_is_consistent_and_accurate(spark):
    """HLL sketch algebra: union of monthly sketches at year grain
    agrees with a direct year-level sketch to within 2% (a union of
    sparse-mode sketches promotes to dense HLL, so small-cardinality
    estimates can differ by a few counts — not bit-equal), and both
    land within 5% of the exact distinct count — the precondition for
    precomputed rollup sketches at 100 TB."""
    from pyspark.sql import functions as F

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    merged = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("mo"))
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .groupBy(F.year("mo").alias("yr"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est"),
        F.countDistinct("o_custkey").alias("exact"),
    )
    m = {r.yr: r.est for r in merged.collect()}
    for r in direct.collect():
        assert abs(m[r.yr] - r.est) / r.exact < 0.02, f"merge drift for {r.yr}"
        assert abs(r.est - r.exact) / r.exact < 0.05
        assert abs(m[r.yr] - r.exact) / r.exact < 0.05


def test_observe_metrics_single_pass(spark):
    """Pipeline observability without a second scan: df.observe attaches
    aggregate metrics (row count, anomaly count, avg) that materialize
    as a side effect of the one action — at 100 TB a data-quality
    readout costs zero extra passes."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("quality")
    df = (
        spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.count_if(F.col("l_quantity") > 45).alias("big_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
        .filter(F.col("l_quantity") > 45)
    )
    kept = df.count()
    m = obs.get
    assert m["rows_seen"] > kept > 0
    assert m["big_qty"] == kept  # metric saw pre-filter rows, counted the same predicate


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.text("abc", max_size=3)),
        min_size=1,
        max_size=25,
    ),
    updates=st.lists(
        st.tuples(st.integers(0, 25), st.one_of(st.none(), st.text("xyz", max_size=3))),
        max_size=10,
    ),
)
@settings(max_examples=8, deadline=None)
def test_merge_upsert_properties(spark, rows, updates):
    """MERGE algebra: (a) idempotent — applying the same batch twice
    equals once; (b) key-complete — result keys = target ∪ source keys;
    (c) source rows appear verbatim (null updates included)."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators.merge import (
        merge_upsert,
    )

    tgt = {k: v for k, v in rows}
    src = {k: v for k, v in updates}
    target = spark.createDataFrame(list(tgt.items()), "k bigint, v string")
    if src:
        source = spark.createDataFrame(list(src.items()), "k bigint, v string")
    else:
        source = spark.createDataFrame([], "k bigint, v string")

    once = {r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()}
    twice = {
        r.k: r.v
        for r in merge_upsert(
            merge_upsert(target, source, ["k"]), source, ["k"]
        ).collect()
    }
    assert once == twice  # idempotent
    assert set(once) == set(tgt) | set(src)  # key-complete
    for k, v in src.items():
        assert once[k] == v  # source wins, nulls honored
    for k, v in tgt.items():
        if k not in src:
            assert once[k] == v  # untouched rows persist


def test_heavy_hitters_exact_on_skewed_data(spark):
    """Misra-Gries + exact-verify must equal the brute-force GROUP BY
    answer on a skewed distribution (Zipf-ish: value = floor(sqrt(id))
    concentrates mass on small values)."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.operators.skew import (
        heavy_hitters,
    )

    # half the rows concentrate on three hot values, the rest are
    # singletons — exactly the skew profile MG exists for
    df = spark.range(0, 20_000, 1, 8).select(
        F.when(F.col("id") % 2 == 0, F.col("id") % 3)
        .otherwise(F.col("id"))
        .cast("bigint")
        .alias("v")
    )
    k = 15
    got = {(r.v, r.n) for r in heavy_hitters(df, "v", k=k).collect()}
    total = df.count()
    want = {
        (r.v, r.n)
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > total / k)
        .collect()
    }
    assert got == want and len(want) > 0


def test_heavy_hitters_null_and_nan_keys_excluded(spark):
    """Dirty-key contract (operators/skew.heavy_hitters docstring):
    null and NaN values are excluded from candidacy AND from the n/k
    total. The NaN case is the load-bearing one — CPython 3.10+ hashes
    each float NaN by identity, so before the guard every NaN row
    opened its own Misra-Gries counter (unbounded dict growth) and
    evicted real candidates. A NaN-flooded column must still find the
    true hot value."""
    import math

    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.operators.skew import (
        heavy_hitters,
    )

    # 2000 NaNs + 1000 nulls (would flood k=10 counters) + 300 copies
    # of the one real heavy hitter + 200 distinct light values
    df = (
        spark.range(2000).select(F.lit(float("nan")).alias("v"))
        .unionAll(spark.range(1000).select(F.lit(None).cast("double").alias("v")))
        .unionAll(spark.range(300).select(F.lit(7.5).alias("v")))
        .unionAll(spark.range(200).select((F.col("id") + 1000.0).alias("v")))
        .repartition(8)
    )
    got = {(r.v, r.n) for r in heavy_hitters(df, "v", k=10).collect()}
    # threshold over the 500 non-null/non-NaN rows: 500/10 = 50
    assert got == {(7.5, 300)}
    assert not any(v is None or math.isnan(v) for v, _ in got)


def test_ewma_last_null_rows_excluded_not_poisoning(spark):
    """Dirty-row contract (operators/timeseries.ewma_last docstring):
    null values and null timestamps are missed observations — excluded
    before the fold, with n counting only folded rows. Before the
    guard one null value NaN-poisoned the key's entire EWMA (pandas
    widens None to NaN and the recursion never recovers)."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.operators.timeseries import (
        ewma_last,
    )

    clean = [(1, i, float(10 + i)) for i in range(5)]
    dirty = clean + [(1, 2_000, None), (1, None, 99.0), (2, 0, None)]

    def run(rows):
        df = spark.createDataFrame(rows, "user_id long, ts long, value double")
        return {
            r.user_id: (r.n, r.ewma)
            for r in ewma_last(
                df, key_col="user_id", ts_col="ts", value_col="value"
            ).collect()
        }

    want = run(clean)
    got = run(dirty)
    assert got == want  # nulls neither crash, poison, nor count
    assert 2 not in got  # a key with ONLY null observations disappears


def test_compression_ratio_matches_direct_zlib(spark):
    """doc_compression_ratio gate: the pandas-UDF output must equal a
    driver-side zlib computation byte-for-byte (same level, same
    rounding) on every doc of the smoke corpus."""
    import zlib

    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    got = {
        r.doc_id: r.zlib_ratio
        for r in all_queries()["doc_compression_ratio"].spark(spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    assert len(got) == len(docs) > 0
    for d in docs:
        raw = d.text.encode("utf-8")
        want = round(len(zlib.compress(raw, 6)) / len(raw), 6) if raw else 1.0
        assert got[d.doc_id] == want, d.doc_id


def test_distributed_bpe_matches_reference(spark):
    """train_bpe gate: the distributed merge sequence (pairs, order,
    counts) must equal the sequential Sennrich-style reference run on
    the same word histogram — same deterministic tie-break, same
    left-to-right overlap semantics."""
    from collections import Counter

    from real_time_predictive_maintenance_data_pipeline_spark.operators.bpe import (
        reference_bpe,
        train_bpe,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    merges, hist = train_bpe(docs, n_merges=25)

    wc = Counter()
    for r in docs.select("text").collect():
        for w in r.text.split(" "):
            if w:
                wc[w] += 1
    want = reference_bpe(dict(wc), n_merges=25)
    assert merges == want, (merges[:5], want[:5])
    assert len(merges) == 25

    # applying the merges must strictly shrink the symbol stream
    n_syms = hist.selectExpr("sum(n * size(symbols)) s").first().s
    n_chars = hist.selectExpr("sum(n * (length(word) + 1)) s").first().s
    assert n_syms < n_chars


def test_bpe_batched_merges_match_reference_on_tie_heavy_corpora(spark):
    """Adversarial gate for the r17 multi-merge batching: a 3-letter
    alphabet makes count ties, overlapping candidates, and same-symbol
    runs (the (z,z)->(zz,zz) cascade the batching must refuse to jump
    over) rampant, so any unsound acceptance rule diverges from the
    sequential reference within a few merges."""
    import random
    from collections import Counter

    from real_time_predictive_maintenance_data_pipeline_spark.operators.bpe import (
        reference_bpe,
        train_bpe,
    )

    for seed in (1, 4, 7):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(40)
        ]
        docs = spark.createDataFrame([(" ".join(words),)], ["text"])
        got, _ = train_bpe(docs, n_merges=12)
        want = reference_bpe(dict(Counter(words)), n_merges=12)
        assert got == want, (seed, got[:5], want[:5])


def test_bpe_long_word_regex_fold_matches_reference(spark):
    """Pins the r16 hybrid fold: words longer than 64 symbols take the
    linear ``_fold_pair_regex`` rewrite instead of the quadratic array
    fold, and the two paths must be indistinguishable — same merge
    sequence AND same final symbol arrays as the sequential reference,
    on a corpus whose long words carry regex metacharacters, backslash/
    dollar (replacement escapes), and odd/even same-symbol runs (the
    left-to-right overlap cases)."""
    from collections import Counter

    from real_time_predictive_maintenance_data_pipeline_spark.operators.bpe import (
        encode_word,
        reference_bpe,
        train_bpe,
    )

    long_meta = ".*+?($)[\\]{}|^" * 8  # 112 chars of pure metacharacters
    long_run_even = "z" * 80  # even same-char run: collapses fully
    long_run_odd = "z" * 81  # odd run: trailing singleton survives
    corpus = [
        (long_meta + " " + long_run_even) * 2,
        long_run_odd + " " + long_run_odd,
        "the quick brown fox " * 5,
        "ab" * 50 + " " + "ab" * 50,  # long alternation, repeats pair (a,b)
        "a\\b$c a\\b$c a\\b$c",  # short words w/ escape-sensitive chars
    ]
    docs = spark.createDataFrame([(t,) for t in corpus], ["text"])
    merges, hist = train_bpe(docs, n_merges=20)

    wc = Counter()
    for t in corpus:
        for w in t.split(" "):
            if w:
                wc[w] += 1
    assert merges == reference_bpe(dict(wc), n_merges=20)

    # final histogram must equal the sequential replay for EVERY word —
    # this is what distinguishes a wrong fold that still produces the
    # right pair counts early on
    merge_seq = [(a, b) for a, b, _ in merges]
    got = {r["word"]: list(r["symbols"]) for r in hist.collect()}
    assert set(got) == set(wc)
    for w in wc:
        assert got[w] == encode_word(w, merge_seq), w


# ---------------------------------------------------------------------------
# Round-4 governance ops — pure-Python mirrors, many examples
# ---------------------------------------------------------------------------


def _normalize_py(s: str) -> str:
    import re

    return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", s.lower())).strip()


@given(st.text(max_size=200))
def test_normalize_idempotent_and_canonical(s):
    """Normalization is idempotent and its output alphabet is closed
    (lowercase alnum + single spaces, no edge spaces) — the contract
    doc_normalize_text's md5 verifies against DuckDB."""
    n = _normalize_py(s)
    assert _normalize_py(n) == n
    assert n == n.strip()
    assert "  " not in n
    assert all(c.islower() or c.isdigit() or c == " " for c in n)


@given(
    st.dictionaries(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x7F),
            min_size=1,
            max_size=8,
        ),
        st.integers(1, 50),
        min_size=1,
        max_size=30,
    ),
    st.integers(0, 25),
)
def test_bpe_encode_replay_matches_reference_training(word_counts, n_merges):
    """Encoding by merge replay must reproduce the reference trainer's
    final symbol sequences for every trained word, at any merge count."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators.bpe import (
        encode_word,
        reference_bpe,
    )

    merges = reference_bpe(word_counts, n_merges=n_merges)
    merge_seq = [(a, b) for a, b, _ in merges]
    # replay training sequentially to get the expected final histogram
    hist = {tuple(list(w) + ["</w>"]): w for w in word_counts}
    for a, b, _ in merges:
        new = {}
        for syms, w in hist.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new[tuple(out)] = w
        hist = new
    expected = {w: list(syms) for syms, w in hist.items()}
    for w in word_counts:
        assert encode_word(w, merge_seq) == expected[w]


@given(st.lists(st.text(max_size=30), max_size=30))
def test_blocklist_partition_invariant(words):
    """Blocklist filtering partitions tokens exactly: hits + survivors
    == input, and hits are precisely the lexicon members."""
    block = {"slow", "dup", "big"}
    hits = [w for w in words if w in block]
    keep = [w for w in words if w not in block]
    assert len(hits) + len(keep) == len(words)
    assert all(w in block for w in hits)
    assert not any(w in block for w in keep)


@settings(max_examples=5, deadline=None)
@given(
    lines=st.lists(
        st.one_of(
            st.text(max_size=80).filter(
                lambda s: "\n" not in s and "\r" not in s and s.strip()
            ),
            st.builds(
                lambda m, t, v, ts: (
                    f'{{"machineId":"{m}","temperature":{t},'
                    f'"vibration":{v},"timestamp":{ts}}}'
                ),
                st.sampled_from(["A", "B"]),
                st.floats(0, 100, allow_nan=False),
                st.floats(0, 10, allow_nan=False),
                st.integers(0, 2_000_000_000),
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_quarantine_total_partition_property(spark, tmp_path_factory, lines):
    """O24 robustness: for ARBITRARY input lines (valid payloads mixed
    with garbage), parsing never throws and good + quarantined is a
    partition of the non-empty input — nothing dropped, nothing
    duplicated, and every good row has non-null sensor fields."""
    from real_time_predictive_maintenance_data_pipeline_spark.streaming.pipeline import (
        parse_telemetry,
        quarantine_split,
    )

    d = tmp_path_factory.mktemp("fuzz")
    (d / "in.txt").write_text("\n".join(lines))
    raw = spark.read.text(str(d))
    n_in = raw.count()  # text source may drop trailing empties
    good, bad = quarantine_split(parse_telemetry(raw))
    g = good.collect()
    b = bad.count()
    assert len(g) + b == n_in
    for r in g:
        assert r.temperature is not None and r.vibration is not None


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=40,
    ),
    doomed=st.sets(st.integers(0, 50), max_size=20),
)
@settings(max_examples=5, deadline=None)
def test_copy_on_write_delete_property(spark, rows, doomed):
    """COW DELETE WHERE == logical anti-filter for ANY predicate,
    including predicates that empty whole partitions (the r4-advice
    gap) and predicates that match nothing."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
        copy_on_write_delete,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.sources import scratch

    df = spark.createDataFrame(
        [(p, i, v) for i, (p, v) in enumerate(rows)],
        "part long, id long, v long",
    )
    path = scratch.scratch_dir("cow_prop_")
    df.write.partitionBy("part").mode("overwrite").parquet(path)

    pred = F.col("v").isin(list(doomed)) if doomed else F.lit(False)
    copy_on_write_delete(spark, path, pred, "part")

    survivors = sorted(
        (r.part, r.id, r.v)
        for r in df.filter(~pred).collect()
    )
    got = sorted(
        (r.part, r.id, r.v) for r in spark.read.parquet(path).collect()
    ) if survivors else []
    # an entirely-emptied table reads back as an empty/absent dataset
    if survivors:
        assert got == survivors
    else:
        import glob as _glob
        import os as _os

        assert not _glob.glob(_os.path.join(path, "part=*", "*.parquet"))


@settings(max_examples=6, deadline=None)
@given(
    revs=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=20),
            # exact powers of two probe the log2 range boundaries
            st.sampled_from([1, 2, 4, 1024, 2**20, 2**40]),
            st.integers(min_value=0, max_value=2**45),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_abc_two_level_prefix_equals_single_window(spark, revs):
    """The two-level prefix-sum ABC decomposition must equal the plain
    single-window running sum for ANY revenue multiset with positive
    total (the query's domain — cumulative SHARE is undefined on zero
    revenue) — ties, zeros, exact powers of two at the log2 range
    boundaries, single rows."""
    from hypothesis import assume
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    assume(sum(revs) > 0)

    from real_time_predictive_maintenance_data_pipeline_spark.plans.analytics import (
        abc_two_level_prefix,
    )

    rev = spark.createDataFrame(
        [(i, v) for i, v in enumerate(revs)], "partkey LONG, rev_tmt LONG"
    )
    got = {
        r.partkey: (r.rev_tmt, r.cum_share, r.abc_class)
        for r in abc_two_level_prefix(rev).collect()
    }

    w = Window.orderBy(F.desc("rev_tmt"), F.asc("partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = rev.agg(F.sum("rev_tmt").alias("total"))
    share = F.col("cum_tmt") * 1.0 / F.col("total")
    exact = {
        r.partkey: (r.rev_tmt, r.cum_share, r.abc_class)
        for r in rev.withColumn("cum_tmt", F.sum("rev_tmt").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "partkey",
            "rev_tmt",
            F.round(share, 4).alias("cum_share"),
            F.when(share <= 0.8, "A")
            .when(share <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .collect()
    }
    assert got == exact


# ---------------------------------------------------------------------------
# Dedup exact-dup collapse: operator == brute force on arbitrary corpora
# ---------------------------------------------------------------------------

_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]


def _spark_round4(x: float):
    """Spark's round(): HALF_UP over the double's shortest decimal
    string (see plans/registry.py conventions)."""
    import decimal

    return decimal.Decimal(repr(x)).quantize(
        decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
    )


def _brute_jaccard_pairs(rows, threshold):
    """All same-block doc pairs with round4(jaccard) >= threshold,
    straight from Python sets — the oracle for the blocked operator."""
    out = {}
    for i, (id_a, lang_a, text_a) in enumerate(rows):
        for id_b, lang_b, text_b in rows[i + 1 :]:
            if lang_a != lang_b:
                continue
            if text_a is None or text_b is None:
                # null text never pairs: jaccard over null token arrays
                # is null and the threshold filter drops it (pinned by
                # the r7 null-set collapse fix)
                continue
            sa, sb = set(text_a.split(" ")), set(text_b.split(" "))
            j = len(sa & sb) / len(sa | sb)
            jr = _spark_round4(j)
            if jr >= decimal_threshold(threshold):
                lo, hi = sorted((id_a, id_b))
                out[(lo, hi)] = jr
    return out


def decimal_threshold(t):
    import decimal

    return decimal.Decimal(repr(t))


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # duplicate-heavy ids -> dropped below
            st.sampled_from(["en", "de"]),
            st.one_of(
                st.none(),  # null text must never pair (r7 collapse fix)
                st.lists(
                    st.sampled_from(_WORDS), min_size=1, max_size=6
                ).map(lambda ws: " ".join(ws)),
            ),
        ),
        min_size=2,
        max_size=25,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.9, 1.0]),
)
def test_ngram_jaccard_collapse_equals_bruteforce(spark, rows, threshold):
    """The exact-dup-collapsed blocked Jaccard operator must emit
    EXACTLY the brute-force pair set with identical rounded values, on
    corpora dense in identical token sets (the collapse's hot path) —
    within-set pairs (J=1), cross-set expansion, block isolation, and
    threshold boundaries all at once."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators import dedup as D

    # unique ids (hypothesis may repeat); duplicate TEXTS stay — they
    # are the point
    uniq = {i: (lang, text) for i, lang, text in rows}
    data = [(i, lang, text) for i, (lang, text) in uniq.items()]
    df = spark.createDataFrame(data, "doc_id long, lang string, text string")
    got = {
        (r.doc_a, r.doc_b): _spark_round4(r.jaccard)
        for r in D.ngram_jaccard_pairs(df, threshold=threshold).collect()
    }
    want = _brute_jaccard_pairs(data, threshold)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.one_of(
                st.none(),  # null text must never pair (size(__h) filter)
                st.lists(
                    st.sampled_from(_WORDS), min_size=1, max_size=6
                ).map(lambda ws: " ".join(ws)),
            ),
        ),
        min_size=2,
        max_size=25,
    ),
)
def test_minhash_collapse_precision_and_identical_recall(spark, rows):
    """MinHash LSH after the collapse: every emitted pair's jaccard
    must equal the brute-force value and clear the threshold
    (precision stays 1.0 by construction), and every IDENTICAL-set
    pair must be present (identical sets collide in every band, so
    their recall is deterministic)."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators import dedup as D

    uniq = {i: text for i, text in rows}
    data = [(i, "en", text) for i, text in uniq.items()]
    df = spark.createDataFrame(data, "doc_id long, lang string, text string")
    got = {
        (r.doc_a, r.doc_b): _spark_round4(r.jaccard)
        for r in D.minhash_lsh_pairs(df, jaccard_threshold=0.9).collect()
    }
    brute = _brute_jaccard_pairs(data, 0.0)  # all pairs with values
    for pair, j in got.items():
        assert pair in brute and brute[pair] == j
        assert j >= decimal_threshold(0.9)
    identical = {
        p for p, j in brute.items() if j == decimal_threshold(1.0)
    }
    assert identical <= set(got)


@settings(max_examples=4, deadline=None)
@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(alphabet="ab ", max_size=12),  # incl. "", "a", "   "
        ),
        min_size=1,
        max_size=10,
    )
)
def test_text_expressions_total_on_degenerate_docs(spark, texts):
    """Every text-analysis expression must be TOTAL over arbitrary
    degenerate documents (null, empty, single-token, whitespace soup):
    null in → null out, never a thrown expression. word_bigrams used
    to hard-crash on 1-token docs (sequence(1, 0) is descending, and
    element_at(words, 0) always throws)."""
    from real_time_predictive_maintenance_data_pipeline_spark.functions import text as T

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select(
        "id",
        T.word_bigrams("text").alias("g"),
        T.avg_token_len("text").alias("a"),
        T.quality_score("text").alias("q"),
        T.fingerprint("text").alias("f"),
        T.langid_guess("text").alias("l"),
    ).collect()  # must not raise
    for r, t in zip(sorted(rows, key=lambda r: r.id), texts):
        if t is None:
            assert r.g is None and r.a is None and r.q is None
        elif len(t.split(" ")) < 2:
            assert r.g is None  # documented: bigrams undefined < 2 tokens
