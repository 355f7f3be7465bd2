"""Dedup-family semantics tests (SURVEY §2.4) at sf0.01.

The MinHash LSH path is probabilistic in RECALL only (candidates are
verified with exact Jaccard, so precision is 1.0 by construction); the
recall floor asserted here is the b=4, r=8 banding bound
P(candidate) = 1-(1-J^r)^b ≈ 0.89 at J = 0.9, → 1 as J → 1.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.operators import dedup as D

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _pair_set(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_exact_dedup_counts(spark, docs):
    out = D.exact_dedup(docs)
    total = out.agg(F.sum("n_copies").alias("s"), F.count(F.lit(1)).alias("g")).first()
    assert total.s == docs.count()  # every row in exactly one group
    assert total.g <= docs.count()


def test_minhash_lsh_recall_and_precision(spark, docs):
    """Every LSH pair must be a true ≥0.9-Jaccard pair (precision 1.0);
    recall vs the exact pair set ≥ 0.8 (banding bound minus slack)."""
    exact = _pair_set(
        D.ngram_jaccard_pairs(docs, block_col="lang", threshold=0.9).select(
            "doc_a", "doc_b"
        )
    )
    lsh_df = D.minhash_lsh_pairs(docs, jaccard_threshold=0.9)
    lsh = _pair_set(lsh_df.select("doc_a", "doc_b"))
    assert exact, "fixture must contain near-dup pairs"
    # LSH is unblocked: it may legitimately find cross-lang pairs the
    # lang-blocked exact join can't see, so recall is measured against
    # the blocked exact set and precision via the verified jaccard.
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.3f} below banding floor"
    # precision: verified jaccard must be >= threshold for every emitted pair
    bad = lsh_df.filter(F.col("jaccard") < 0.9).count()
    assert bad == 0


def test_minhash_jaccard_matches_exact(spark, docs):
    """Hashed-token Jaccard == word Jaccard (no collisions at this scale):
    join LSH pairs to the exact computation and compare values."""
    lsh = D.minhash_lsh_pairs(docs, jaccard_threshold=0.9).alias("l")
    exact = D.ngram_jaccard_pairs(docs, block_col="lang", threshold=0.9).alias("e")
    joined = lsh.join(exact, ["doc_a", "doc_b"]).select(
        (F.col("l.jaccard") - F.col("e.jaccard")).alias("diff")
    )
    max_diff = joined.agg(F.max(F.abs("diff"))).first()[0]
    assert max_diff is not None and max_diff == 0.0


def test_simhash_near_dup_hamming(spark, docs):
    """Near-identical docs (J≥0.9) must sit within small Hamming distance;
    the signature is deterministic."""
    sigs1 = {r.doc_id: r.simhash for r in D.simhash_signatures(docs).collect()}
    sigs2 = {r.doc_id: r.simhash for r in D.simhash_signatures(docs).collect()}
    assert sigs1 == sigs2  # deterministic
    near = D.ngram_jaccard_pairs(docs, threshold=0.95).select("doc_a", "doc_b").collect()
    assert near
    mask = (1 << 64) - 1  # signatures are signed longs; mask before popcount
    for r in near[:200]:
        ham = bin((sigs1[r.doc_a] ^ sigs1[r.doc_b]) & mask).count("1")
        assert ham <= 16, f"J>=0.95 pair at hamming {ham}"


def test_simhash_pairs_blocked(spark, docs):
    out = D.simhash_pairs(docs, max_hamming=8)
    row = out.agg(
        F.count(F.lit(1)).alias("n"), F.max("hamming").alias("hmax")
    ).first()
    assert row.n > 0 and row.hmax <= 8


def test_near_dup_clusters_match_union_find(spark, docs):
    """Label-propagation components must equal a driver-side union-find
    over the SAME pair set (exact structural check), cover every doc,
    and pick min-id keepers."""
    pairs = [(r.doc_a, r.doc_b) for r in
             D.minhash_lsh_pairs(docs, jaccard_threshold=0.9)
             .select("doc_a", "doc_b").collect()]
    ids = [r.doc_id for r in docs.select("doc_id").collect()]

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    truth = {}
    for i in ids:
        truth.setdefault(find(i), set()).add(i)

    got_rows = D.near_dup_clusters(docs, jaccard_threshold=0.9).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r.cluster_id, set()).add(r.doc_id)
        if r.is_keeper:
            assert r.doc_id == r.cluster_id
    # NB: LSH is seeded+deterministic, so both runs see identical pairs
    assert {frozenset(v) for v in got.values()} == {
        frozenset(v) for v in truth.values()
    }
    # min-id labeling: cluster_id is the minimum member
    for cid, members in got.items():
        assert cid == min(members)


def test_min_label_components_chain_graph(spark):
    """A path graph deeper than the iteration bound exercises the
    documented degradation mode: labels stop at the k-hop minimum, but
    every node still gets a row, labels never increase past the true
    minimum, and the true component minimum always keeps its own label
    (so a downstream keeper-join can only under-dedup, never lose
    docs). With require_convergence=True the same graph must propagate
    to the exact single component."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators.dedup import (
        min_label_components,
    )

    n = 20  # diameter 19 > the default 6-round bound
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    nodes = spark.range(n).select(
        F.col("id").alias("node"), F.col("id").alias("lbl")
    )

    partial = {
        r.node: r.lbl
        for r in min_label_components(pairs, nodes, max_iters=6).collect()
    }
    assert set(partial) == set(range(n))  # every node labeled
    assert all(0 <= partial[i] <= i for i in range(n))  # monotone, bounded
    assert partial[0] == 0  # the true minimum is always its own keeper

    full = {
        r.node: r.lbl
        for r in min_label_components(
            pairs, nodes, max_iters=6, require_convergence=True
        ).collect()
    }
    assert full == {i: 0 for i in range(n)}  # exact single component


def test_near_dup_clusters_window_filtered_input(spark, docs):
    """Regression: a constraint-rich upstream plan (window + self-equal
    filter, the exact-dedup idiom in examples/curate_corpus.py) used to
    crash label propagation's round-1 checkpoint with Catalyst's
    'NoSuchElementException: key not found: node#N' — the same
    checkpointed labels frame sat on both sides of a Union and
    DeduplicateRelations left LogicalRDD constraints under stale
    attribute ids. The loop now uses self-loop edges instead of a
    per-round union; this pins the failing input shape end-to-end."""
    from pyspark.sql import Window

    filtered = (
        docs.withColumn("dg", F.sha2("text", 256))
        .withColumn("keep_id", F.min("doc_id").over(Window.partitionBy("dg")))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("dg", "keep_id")
    )
    n_in = filtered.count()
    labels = D.near_dup_clusters(filtered, jaccard_threshold=0.9)
    rows = labels.collect()
    assert len(rows) == n_in  # every surviving doc is labeled
    for r in rows:
        if r.is_keeper:
            assert r.doc_id == r.cluster_id


def test_stratified_sample_fractions(spark, docs):
    """sampleBy fractions within 5σ binomial CI per stratum."""
    import math

    from real_time_predictive_maintenance_data_pipeline_spark.operators.skew import (
        stratified_sample,
    )

    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    fractions = {lang: (0.2 if lang == "en" else 0.5) for lang in totals}
    out = stratified_sample(docs, "lang", fractions)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n_total in totals.items():
        p = fractions[lang]
        sigma = math.sqrt(p * (1 - p) * n_total)
        assert abs(got.get(lang, 0) - p * n_total) <= 5 * sigma + 1


def test_stratified_sample_default_fraction(spark, docs):
    """default= path: no strata enumeration, unlisted langs fall back to
    the default fraction; within 5σ binomial CI per stratum."""
    import math

    from real_time_predictive_maintenance_data_pipeline_spark.operators.skew import (
        stratified_sample,
    )

    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = stratified_sample(docs, "lang", {"en": 0.2}, default=0.5)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n_total in totals.items():
        p = 0.2 if lang == "en" else 0.5
        sigma = math.sqrt(p * (1 - p) * n_total)
        assert abs(got.get(lang, 0) - p * n_total) <= 5 * sigma + 1


def test_streaming_exact_dedup(spark, tmp_path):
    """Exact dedup composes with Structured Streaming: digests stream
    through dropDuplicates, collapsing duplicate documents across
    micro-batches (the streaming twin of operators.dedup.exact_dedup —
    state carries the 64-char digest, not the document)."""
    import json

    src = tmp_path / "docs"
    src.mkdir()
    texts = ["alpha beta", "gamma delta", "alpha beta", "epsilon", "gamma delta"]
    (src / "a.jsonl").write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in enumerate(texts))
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string").json(str(src))
        .withColumn("digest", F.sha2("text", 256))
        .dropDuplicates(["digest"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_docdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    kept = sorted(r.text for r in spark.table("t_docdedup").collect())
    assert kept == ["alpha beta", "epsilon", "gamma delta"]


def test_simhash_banded_equals_bruteforce(spark, docs):
    """Banded chunk join must reproduce brute-force Hamming pairs
    EXACTLY for max_hamming <= 3 (pigeonhole recall 1.0, XOR-verified
    precision 1.0)."""
    banded = {
        (r.doc_a, r.doc_b): r.hamming
        for r in D.simhash_banded_pairs(docs, max_hamming=3).collect()
    }
    sigs = D.simhash_signatures(docs)
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = {
        (r.doc_a, r.doc_b): r.hamming
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute
    assert len(brute) > 0  # corpus contains near-dups by construction


def test_pagerank_matches_numpy_power_iteration(spark):
    """Distributed PageRank must match a dense numpy power iteration on
    the same symmetrized graph to ~1e-5 (same damping, same iteration
    count, same uniform init)."""
    import numpy as np

    from real_time_predictive_maintenance_data_pipeline_spark.operators.dedup import (
        pagerank,
        simhash_banded_pairs,
    )
    from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(300)
    edges = simhash_banded_pairs(docs, max_hamming=3)
    got = {r.doc_id: r.rank for r in pagerank(edges, n_iter=10).collect()}

    pairs = [(r.doc_a, r.doc_b) for r in edges.collect()]
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = np.zeros(len(nodes))
    for a, b in pairs:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.ones(len(nodes))
    for _ in range(10):
        contrib = np.zeros(len(nodes))
        for a, b in pairs:
            contrib[idx[b]] += r[idx[a]] / deg[idx[a]]
            contrib[idx[a]] += r[idx[b]] / deg[idx[b]]
        r = (1 - 0.85) + 0.85 * contrib
    for n in nodes:
        assert abs(got[n] - r[idx[n]]) < 1e-5, (n, got[n], r[idx[n]])


def test_semantic_dedup_precision_and_recall(spark):
    """SemDeDup gates: (a) every reported direct detection (vec_id,
    via, cos) is a true cosine >= threshold pair (precision 1.0,
    re-verified with numpy); (b) dup_of is a KEPT representative —
    never itself in the dropped set — and earlier than the dropped
    vector; (c) the drop set recovers a healthy fraction of the
    brute-force >= threshold near-dup population (clustering can
    split a pair across cells — that miss rate is the price of the
    O(n²) → O(n²/k) reduction; gate the floor)."""
    import numpy as np

    thr = 0.4
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    dropped = D.semantic_dedup(e, threshold=thr).collect()
    assert dropped, "corpus contains near-dup embeddings; expected drops"

    vecs = {r.vec_id: np.array(r.embedding, dtype="float64") for r in e.collect()}
    unit = {
        i: v / (np.linalg.norm(v) or 1.0) for i, v in vecs.items()
    }
    dropped_ids = {r.vec_id for r in dropped}
    for r in dropped:
        cos = float(unit[r.vec_id] @ unit[r.via])
        assert cos >= thr - 1e-9, (r.vec_id, r.via, cos)
        assert round(cos, 6) == r.cos
        assert r.via < r.vec_id
        assert r.dup_of < r.vec_id
        assert r.dup_of not in dropped_ids  # keeper is actually kept

    ids = sorted(unit)
    mat = np.vstack([unit[i] for i in ids])
    sims = mat @ mat.T
    iu = np.triu_indices(len(ids), k=1)
    true_dup_rows = {
        ids[j]
        for i, j in zip(*iu)
        if sims[i, j] >= thr
    }
    recall = len(dropped_ids & true_dup_rows) / len(true_dup_rows)
    assert recall >= 0.6, f"recall {recall:.3f} vs brute-force population"



def test_exact_stratified_sample_sizes_and_stability(spark, docs):
    """exact_stratified_sample gate: exact per-stratum sizes (min of n
    and stratum size), deterministic across runs, and insertion-stable
    (adding rows to one stratum never changes another stratum's
    picks)."""
    from real_time_predictive_maintenance_data_pipeline_spark.operators.skew import (
        exact_stratified_sample,
    )

    n = 20
    s1 = exact_stratified_sample(docs, "lang", n, "doc_id")
    sizes = {r.lang: r.cnt for r in s1.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    full = {r.lang: r.cnt for r in docs.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    for lang, c in full.items():
        assert sizes[lang] == min(n, c), (lang, sizes[lang], c)

    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    ids2 = {
        r.doc_id
        for r in exact_stratified_sample(docs, "lang", n, "doc_id")
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2  # run-to-run determinism

    # grow one stratum; every other stratum's picks must be unchanged
    extra = docs.filter(F.col("lang") == "en").withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    grown = exact_stratified_sample(docs.unionByName(extra), "lang", n, "doc_id")
    ids3 = {r.doc_id for r in grown.filter(F.col("lang") != "en").select("doc_id").collect()}
    assert ids3 == {i for i in ids1 if i not in
                    {r.doc_id for r in docs.filter(F.col("lang") == "en").select("doc_id").collect()}}


def test_banded_hamming_null_signatures_never_pair(spark):
    """Null signatures (null text -> null simhash) must produce NO pairs
    — pre-collapse they never equi-joined (null chunk keys); the round-6
    representative collapse must not group them into a bogus hamming-0
    clique (r6 ADVICE)."""
    sigs = spark.createDataFrame(
        [("a", 7), ("b", 7), ("c", None), ("d", None), ("e", None)],
        "__id string, __sig long",
    )
    pairs = D.banded_hamming_pairs(sigs, max_hamming=3).collect()
    got = {(r.doc_a, r.doc_b, r.hamming) for r in pairs}
    assert got == {("a", "b", 0)}  # identical non-null sigs pair; nulls never


def test_ngram_jaccard_null_text_never_pairs(spark):
    """Null text (null token set) must produce NO pairs — pre-collapse
    jaccard over null arrays is null and the threshold filter drops it;
    the representative collapse must not group null sets into a bogus
    J=1.0 clique (same hazard class as the banded-Hamming null fix)."""
    df = spark.createDataFrame(
        [
            ("a", "en", "the quick brown fox"),
            ("b", "en", "the quick brown fox"),
            ("c", "en", None),
            ("d", "en", None),
            ("e", "fr", None),
        ],
        "doc_id string, lang string, text string",
    )
    pairs = D.ngram_jaccard_pairs(df, block_col="lang", threshold=0.5).collect()
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in pairs}
    assert got == {("a", "b", 1.0)}  # identical real docs pair; nulls never


def test_minhash_max_bucket_caps_hot_clusters(spark):
    """The opt-in hot-bucket skip (``max_bucket``): a boilerplate-style
    cluster of NEAR-identical but DISTINCT documents floods every band
    bucket (the exact-dup collapse cannot merge them), which is the
    one quadratic term in the LSH plan — 10M such docs at 100 TB means
    10^14 candidate pairs. With the cap: output is a SUBSET of the
    uncapped pairs (precision stays exact — verification is unchanged),
    exact-duplicate pairs survive (they never enter the bucket join),
    and the hot cluster's pair count collapses from quadratic to
    bounded."""
    base = " ".join(f"w{i}" for i in range(60))
    rows = []
    # 40 near-identical distinct docs: one token differs per doc
    # (J = 59/61 ≈ 0.967 for every pair — a true near-dup mega-cluster).
    for i in range(40):
        rows.append((i, base + f" extra{i}"))
    # one exact-dup group (collapsed before banding; immune to the cap)
    for i in range(40, 44):
        rows.append((i, "alpha beta gamma delta epsilon zeta"))
    # unrelated singletons
    for i in range(44, 60):
        rows.append((i, " ".join(f"u{i}_{j}" for j in range(30))))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    uncapped = _pair_set(D.minhash_lsh_pairs(docs, jaccard_threshold=0.9))
    capped = _pair_set(
        D.minhash_lsh_pairs(docs, jaccard_threshold=0.9, max_bucket=5)
    )
    exact_pairs = {
        (a, b) for a in range(40, 44) for b in range(40, 44) if a < b
    }
    # uncapped finds the mega-cluster quadratically
    mega_uncapped = {p for p in uncapped if p[0] < 40 and p[1] < 40}
    assert len(mega_uncapped) > 100  # ~40*39/2 at this similarity
    # capped output is a strict subset with the quadratic term bounded
    assert capped <= uncapped
    mega_capped = {p for p in capped if p[0] < 40 and p[1] < 40}
    assert len(mega_capped) < len(mega_uncapped)
    # exact-dup pairs never enter the bucket join — cap cannot drop them
    assert exact_pairs <= capped


def test_ngram_jaccard_max_bucket_caps_hot_groups(spark):
    """Same cap on the blocked-jaccard path: over-cap (block, bucket)
    groups leave the pair join; exact-dup pairs survive; output with
    the cap is a strict subset."""
    base = " ".join(f"w{i}" for i in range(60))
    rows = [(i, "en", base + f" extra{i}") for i in range(30)]
    rows += [(i, "en", "alpha beta gamma delta") for i in range(30, 34)]
    rows += [
        (i, "de", " ".join(f"u{i}_{j}" for j in range(30)))
        for i in range(34, 44)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    uncapped = _pair_set(D.ngram_jaccard_pairs(docs, threshold=0.9))
    capped = _pair_set(
        D.ngram_jaccard_pairs(docs, threshold=0.9, max_bucket=5)
    )
    exact_pairs = {
        (a, b) for a in range(30, 34) for b in range(30, 34) if a < b
    }
    mega_uncapped = {p for p in uncapped if p[0] < 30 and p[1] < 30}
    assert len(mega_uncapped) > 100
    assert capped <= uncapped
    assert not {p for p in capped if p[0] < 30 and p[1] < 30}
    assert exact_pairs <= capped


def test_banded_hamming_max_bucket_caps_hot_buckets(spark):
    """Same cap on the 16-bit-chunk band join: a signature in a skipped
    hot bucket still pairs through its other three chunks; duplicate
    signatures (collapsed pre-join) are immune."""
    # 20 signatures sharing chunk0 == 0x0001 (hot bucket) but differing
    # high bits far beyond hamming 3 -> the hot bucket is pure noise.
    rows = [(i, (i << 32) | 0x0001) for i in range(20)]
    # a true near-dup pair differing in 1 bit, sharing three quiet chunks
    rows += [(100, 0x7777000000020000), (101, 0x7777000000020001)]
    # an identical-signature group (collapse path)
    rows += [(200, 0x12345678), (201, 0x12345678)]
    sigs = spark.createDataFrame(rows, "__id bigint, __sig long")
    capped = D.banded_hamming_pairs(sigs, max_hamming=3, max_bucket=5)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (100, 101) in got  # quiet chunks still pair it
    assert (200, 201) in got  # identical signatures immune to the cap
    assert not {p for p in got if p[0] < 20}  # hot-bucket noise skipped
