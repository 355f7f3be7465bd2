"""Run a quarterly-business-review pack end-to-end, locally:

    python examples/business_review.py [sf_dir]

Chains the round-5 analytics operators the way an analytics team
composes a review deck (each stage a catalog query from QUERIES.md):

  1. growth          year-over-year revenue (rel_yoy_growth)
  2. mix             new vs returning revenue split (rel_new_vs_returning)
  3. concentration   nation revenue shares + supplier HHI + customer Gini
  4. segmentation    RFM cells — which segments hold the revenue
  5. inventory       ABC classes — how much of the catalog is tail
  6. cadence         reorder gaps — replenishment cycle health
  7. cohorts         LTV triangle — is later-acquired revenue deeper?

Every stage is a lazy DataFrame from the shared registry; this script
only sequences and prints them, so the same plans that pass the DuckDB
oracle drive the report.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
from real_time_predictive_maintenance_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("business-review")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    print("== Growth: YoY revenue ==")
    q["rel_yoy_growth"].spark(spark, sf_dir).orderBy("order_year").show()

    print("== Mix: new vs returning (first/last 4 months) ==")
    mix = q["rel_new_vs_returning"].spark(spark, sf_dir).orderBy("month_idx")
    mix.show(4)

    print("== Concentration ==")
    q["rel_percent_of_total"].spark(spark, sf_dir).orderBy("rev_rank").show(5)
    q["rel_herfindahl_index"].spark(spark, sf_dir).orderBy(
        F.desc("hhi")
    ).show(5)
    q["rel_gini_coefficient"].spark(spark, sf_dir).orderBy(
        F.desc("gini")
    ).show(5)

    print("== Segmentation: top RFM cells by revenue ==")
    # rel_rfm_bucketed is the scale-safe default (no NTILE sort);
    # rel_rfm_segmentation is the exact-quintile audit path.
    rfm = q["rel_rfm_bucketed"].spark(spark, sf_dir)
    rfm.groupBy("rfm_cell").agg(
        F.count("*").alias("customers"),
        (F.sum("monetary_cents") / 100.0).alias("revenue"),
    ).orderBy(F.desc("revenue")).show(5)

    print("== Inventory: ABC class sizes ==")
    # rel_abc_prefix2 = two-level prefix sum, byte-identical to the
    # single-window rel_abc_classification audit path.
    abc = q["rel_abc_prefix2"].spark(spark, sf_dir)
    abc.groupBy("abc_class").agg(
        F.count("*").alias("parts"),
        (F.sum("rev_tmt") / 10000.0).alias("revenue"),
    ).orderBy("abc_class").show()

    print("== Cadence: slowest reorder cycles ==")
    q["rel_reorder_gaps"].spark(spark, sf_dir).filter(
        F.col("n_gaps") > 0
    ).orderBy(F.desc("avg_gap_days")).show(5)

    print("== Cohorts: LTV triangle (first cohort) ==")
    ltv = q["rel_cohort_ltv"].spark(spark, sf_dir)
    first = ltv.agg(F.min("cohort_month")).collect()[0][0]
    ltv.filter(F.col("cohort_month") == first).orderBy("age_months").show()

    spark.stop()


if __name__ == "__main__":
    main()
