"""Quantify the ``max_bucket`` hot-bucket cap (r11 verdict item 2):
wall time AND pair recall, capped vs uncapped, for all three
pair-generating dedup joins, on a corpus with a synthetic boilerplate
MEGA-CLUSTER — the skew shape the cap exists for.

Corpus (sf0.1-like volume, fully synthetic so the ground truth is
controlled): 5 000 BACKGROUND docs forming 2 500 known near-dup pairs
(doc 2p+1 = doc 2p with 2 tokens mutated), with per-pair-unique
vocabulary and varied lengths/langs so every operator's buckets stay
small — the diverse-corpus shape; plus M near-identical DISTINCT
mega-cluster documents (one shared ~120-token template, each member
mutating 2 token positions uniquely → pairwise J ≈ 0.967, above the
0.9 threshold). Because the members are distinct token sets, the
exact-dup collapse cannot absorb them: uncapped, every operator must
push ~M²/2 pairs through its verify stage — the quadratic term the
cap bounds. (The sf0.1 ``documents`` fixture is NOT usable as the
background here: it is generated from a ~30-word vocabulary, so the
whole fixture is itself one near-dup blob and the cap suppresses it
for reasons unrelated to the knob under test.)

Method: one Spark session; per (operator, cap) the pair output is
written to parquet and the WALL TIME of that materialization recorded;
counts and recall are then computed from the written files. Capped
output is provably a SUBSET of uncapped (the cap only removes
candidate groups), asserted per run via a left-anti join. Recall is
split into BACKGROUND pairs (≥1 real fixture doc) and MEGA pairs
(both ids synthetic) — the cap's contract is "background recall
unchanged, mega-cluster pairs traded for bounded cost".

Usage: python tools/bench_max_bucket.py [M] [caps...]
Defaults: M=2000, caps None,512,128. Prints a markdown table for
SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

MEGA_BASE_ID = 10_000_000
TEMPLATE_TOKENS = 120
THRESHOLD = 0.9


def build_corpus(spark, m: int, n_bg_pairs: int = 2500):
    """Diverse background (known near-dup pairs) + an m-member
    near-identical mega-cluster."""
    langs = ("en", "de", "fr", "es", "zh")
    rows = []
    # Background pair p: two docs sharing L-2 of L+2 distinct tokens
    # (J = (L-2)/(L+2) ≥ 0.905 at L = 42). Vocabulary is unique per
    # pair and lengths cycle 42..441, so no cross-pair similarity and
    # every (block, length-bucket) / LSH bucket stays tiny — the
    # diverse-corpus background the cap must NOT disturb.
    for p in range(n_bg_pairs):
        length = 42 + (p % 400)
        base = [f"w{p}_{j}" for j in range(length)]
        mut = list(base)
        mut[0] = f"mut{p}a"
        mut[1] = f"mut{p}b"
        lang = langs[p % len(langs)]
        rows.append((2 * p, " ".join(base), lang))
        rows.append((2 * p + 1, " ".join(mut), lang))
    # Mega-cluster: member i replaces positions (i mod 118) and +1 of a
    # shared 120-token template with tokens unique to i, so every pair
    # of members shares 116-118 of 120-124 distinct tokens
    # (J ≈ 0.94-0.97 ≥ 0.9) while every token SET is distinct — the
    # exact-dup collapse cannot absorb the cluster.
    template = [f"tok{j}" for j in range(TEMPLATE_TOKENS)]
    for i in range(m):
        toks = list(template)
        q = i % (TEMPLATE_TOKENS - 2)
        toks[q] = f"uniq{i}a"
        toks[q + 1] = f"uniq{i}b"
        rows.append((MEGA_BASE_ID + i, " ".join(toks), "en"))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    ).repartition(64)


def run_variants(spark, corpus, out_root: str, caps):
    from real_time_predictive_maintenance_data_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_banded_pairs,
    )

    ops = {
        "minhash_lsh": lambda cap: minhash_lsh_pairs(
            corpus, jaccard_threshold=THRESHOLD, max_bucket=cap
        ),
        "ngram_jaccard": lambda cap: ngram_jaccard_pairs(
            corpus, threshold=THRESHOLD, max_bucket=cap
        ),
        "simhash_banded": lambda cap: simhash_banded_pairs(corpus, max_bucket=cap),
    }
    results = []  # (op, cap, seconds, path)
    for op_name, build in ops.items():
        for cap in caps:
            path = os.path.join(out_root, f"{op_name}_{cap or 'none'}")
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build(cap).select("doc_a", "doc_b").write.mode(
                "overwrite"
            ).parquet(path)
            secs = time.perf_counter() - t0
            results.append((op_name, cap, secs, path))
            print(f"  {op_name} cap={cap}: {secs:.2f}s", file=sys.stderr)
    return results


def report(spark, results):
    lines = [
        "| operator | cap | wall s | pairs | background recall | mega recall |",
        "|---|---|---|---|---|---|",
    ]
    by_op: dict[str, dict] = {}
    for op_name, cap, secs, path in results:
        df = spark.read.parquet(path)
        mega = (F.col("doc_a") >= MEGA_BASE_ID) & (F.col("doc_b") >= MEGA_BASE_ID)
        n_bg = df.filter(~mega).count()
        n_mega = df.filter(mega).count()
        by_op.setdefault(op_name, {})[cap] = (secs, n_bg, n_mega, df)
    for op_name, caps in by_op.items():
        base_secs, base_bg, base_mega, base_df = caps[None]
        for cap, (secs, n_bg, n_mega, df) in caps.items():
            if cap is not None:
                extra = df.join(
                    base_df, ["doc_a", "doc_b"], "left_anti"
                ).count()
                assert extra == 0, (
                    f"{op_name} cap={cap}: {extra} pairs NOT in the "
                    "uncapped output — the cap must only remove pairs"
                )
            bg_rec = n_bg / base_bg if base_bg else 1.0
            mega_rec = n_mega / base_mega if base_mega else 1.0
            lines.append(
                f"| {op_name} | {cap if cap is not None else '—'} "
                f"| {secs:.2f} | {n_bg + n_mega} "
                f"| {bg_rec:.4f} | {mega_rec:.4f} |"
            )
    return "\n".join(lines)


def main() -> int:
    import tempfile

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    caps = (
        [None if c == "none" else int(c) for c in sys.argv[2:]]
        if len(sys.argv) > 2
        else [None, 512, 128]
    )
    if None not in caps:
        caps = [None] + caps

    from real_time_predictive_maintenance_data_pipeline_spark.session import (
        get_spark,
    )

    spark = get_spark()
    corpus = build_corpus(spark, m).persist()
    n = corpus.count()
    print(f"corpus: {n} docs ({m} mega-cluster members)", file=sys.stderr)
    with tempfile.TemporaryDirectory(prefix="max_bucket_bench_") as out_root:
        results = run_variants(spark, corpus, out_root, caps)
        print(report(spark, results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
