"""Run the LLM-data curation pipeline end-to-end, locally:

    python examples/curate_corpus.py [sf_dir] [out_dir]

Chains the engine's curation operators the way a training-data run
composes them (each stage an operator family from QUERIES.md):

  1. normalize            lowercase/strip/collapse (doc_normalize_text)
  2. blocklist            drop docs containing blocked terms
  3. exact dedup          256-bit digest keep-min-id
  4. near-dup dedup       banded MinHash LSH -> components -> keepers
  5. quality filter       composite score >= 0.5
  6. decontaminate        >= 50 % bigram containment vs the eval split
  7. curriculum           quality buckets + deterministic shuffle keys
  8. pack + write         parquet ordered by (bucket, shuffle_key)

Prints the per-stage yield report and the output token count.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.functions import text as T
from real_time_predictive_maintenance_data_pipeline_spark.operators.dedup import (
    near_dup_clusters,
)
from real_time_predictive_maintenance_data_pipeline_spark.session import get_spark

BLOCKLIST = ("dup",)  # the one genuinely rare term in the synthetic corpus


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="curated_corpus_")
    )
    spark = get_spark("curate-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    stages: list[tuple[str, int]] = []
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stages.append(("raw", d.count()))

    # 1. normalize (idempotent canonical text)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    d = d.withColumn("text", norm).filter(F.length("text") > 0)
    stages.append(("normalized", d.count()))

    # 2. blocklist
    words = F.split("text", " ")
    d = d.filter(F.size(F.filter(words, lambda w: w.isin(*BLOCKLIST))) == 0)
    stages.append(("blocklist_pass", d.count()))

    # 3. exact dedup on content digest
    d = (
        d.withColumn("dg", F.sha2("text", 256))
        .withColumn("keep_id", F.min("doc_id").over(Window.partitionBy("dg")))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("dg", "keep_id")
    )
    stages.append(("exact_dedup", d.count()))

    # 4. near-dup dedup (banded MinHash -> components -> keepers)
    labels = near_dup_clusters(d, jaccard_threshold=0.9)
    d = d.join(labels.filter("is_keeper").select("doc_id"), "doc_id")
    stages.append(("near_dedup", d.count()))

    # 5. quality filter
    d = d.filter(T.quality_score("text") >= 0.5)
    stages.append(("quality_pass", d.count()))

    # 6. decontaminate against the held-out split (doc_id % 20 == 0)
    grams = T.word_bigrams("text")
    g = d.filter(F.size(words) >= 2).select("doc_id", grams.alias("grams"))
    bench = (
        g.filter(F.col("doc_id") % 20 == 0)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    train = g.filter(F.col("doc_id") % 20 != 0).select(
        "doc_id", F.size("grams").alias("n_grams"), F.explode("grams").alias("gram")
    )
    contaminated = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.round(F.col("n_hit") / F.col("n_grams"), 4) >= 0.5)
        .select("doc_id")
    )
    d = (
        d.filter(F.col("doc_id") % 20 != 0)
        .join(contaminated, "doc_id", "left_anti")
    )
    stages.append(("decontaminated", d.count()))

    # 7. curriculum: quality buckets + deterministic shuffle key
    q = T.quality_score("text")
    bucket = (
        F.when(q >= 0.75, 0).when(q >= 0.6, 1).when(q >= 0.45, 2).otherwise(3)
    )
    d = d.select(
        "doc_id",
        "text",
        "lang",
        bucket.alias("bucket"),
        F.md5(F.concat(F.lit("s42:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
        T.token_count("text").alias("n_tokens"),
    )

    # 8. write in training order
    (
        d.orderBy("bucket", "shuffle_key")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    out = spark.read.parquet(out_dir)
    n_docs = out.count()
    n_tokens = out.agg(F.sum("n_tokens")).collect()[0][0]
    stages.append(("written", n_docs))

    width = max(len(n) for n, _ in stages)
    print("\ncuration yield report")
    prev = None
    for name, n in stages:
        kept = f"  ({n / prev:.1%} of prev)" if prev else ""
        print(f"  {name:<{width}}  {n:>8}{kept}")
        prev = n
    print(f"\noutput: {out_dir}  docs={n_docs}  tokens={n_tokens}")
    spark.stop()
    if out_dir.startswith(tempfile.gettempdir()):
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
