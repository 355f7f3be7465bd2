"""Whole-catalog ONE-row robustness — the filter-leaves-one-row shape.

The sibling of ``test_empty_inputs.py`` one boundary up: at 100 TB a
predicate routinely leaves a single row (or a single row per group),
and that is where n−1 variance denominators, single-class AUC/lift
denominators, and estimators with fewer rows than clusters live. The
round-11 audit found 11 ANSI DIVIDE_BY_ZERO job-killers (Welch t,
KS-D, CUPED θ, MDE, AUC ×2, lift ×2, confusion-matrix rates,
recall@k, per-dim variance) and 4 MLlib fits dying with a bare
ArrayIndexOutOfBoundsException when rows < k.

Contract pinned here, over EVERY registered catalog query run against
a one-row copy of all ten fixture tables:

- queries whose statistic is undefined on a single observation (or a
  single class) emit NULL for that statistic and complete — never an
  ANSI DIVIDE_BY_ZERO;
- estimator-backed queries raise ``ml.fitguard``'s crisp ValueError
  (zero rows after an internal filter, or fewer rows than the
  estimator can train on) — never a deep MLlib stack;
- the 11 guarded queries agree with their DuckDB oracles ON THIS
  INPUT — the guards exist exactly here, so parity is asserted
  exactly here (the heavy-hitters lesson from r9: an impl/oracle
  divergence that real fixtures never exercise is still a divergence).
"""

from __future__ import annotations

import os

import pytest

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

from .audit_walk import walk_catalog
from .conftest import SF_SMOKE
from .oracle_harness import compare, duck_connection

# Training on fewer rows than clusters/components is undefined by
# contract; these must fail CRISPLY (ml/fitguard naming the operator).
EXPECTED_CRISP = {
    "emb_opq_rotation",  # covariance needs >= 2 rows (r15)
    "emb_pca_whitening",  # covariance needs >= 2 rows
    "ml_als_recommend",  # ratings frame filters to zero rows
    "ml_kmeans_embeddings",  # k=8 > 1 row
    "sem_dedup",  # k_clusters=10 > 1 row
    "sim_ivf_pq_topk",  # nlist=16 > 1 row
    "sim_ivf_topk",  # nlist=16 > 1 row
}

# The 11 queries whose divisions were guarded by the r11 one-row audit:
# their oracles carry the SAME guard, asserted on the one-row fixture
# below (the only input where the guard changes the answer).
GUARDED = (
    "ml_roc_auc",
    "ml_roc_auc_hist",
    "ml_lift_deciles",
    "ml_lift_bucketed",
    "ml_confusion_threshold",
    "ml_precision_at_k",
    "emb_dim_variance_topk",
    "rel_cuped_adjustment",
    "rel_experiment_mde",
    "rel_ab_ttest",
    "events_ks_two_sample",
)


@pytest.fixture(scope="module")
def onerow_sf_dir(tmp_path_factory):
    """One-row copies of every fixture table (first row of the sf0.001
    parquet, real schemas — physical-type drift propagates here)."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_onerow")
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(SF_SMOKE, f))
            pq.write_table(t.slice(0, 1), str(d / f))
    return str(d)


@pytest.mark.slow
def test_every_query_is_one_row_safe(spark, onerow_sf_dir):
    crisp, bad = walk_catalog(spark, onerow_sf_dir)
    assert not bad, f"not one-row safe: {bad}"
    assert crisp == EXPECTED_CRISP, (
        f"crisp-failure set drifted: +{sorted(crisp - EXPECTED_CRISP)} "
        f"-{sorted(EXPECTED_CRISP - crisp)}"
    )


@pytest.mark.parametrize("name", GUARDED)
def test_guarded_query_matches_oracle_on_one_row(spark, onerow_sf_dir, name):
    """Spark == DuckDB on the input where the division guards FIRE:
    single-class AUC/lift → NULL, n=1 variance/θ/MDE → NULL, one-sided
    KS → NULL. Real fixtures never exercise these branches (that is
    why the r11 driver sweep stayed hash-green); this is the parity
    evidence for the guarded branch itself."""
    q = all_queries()[name]
    con = duck_connection(onerow_sf_dir)
    try:
        compare(q.spark(spark, onerow_sf_dir), con, q.oracle)
    finally:
        con.close()
