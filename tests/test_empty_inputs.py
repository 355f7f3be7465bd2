"""Whole-catalog zero-row robustness — the filters-to-zero shape.

At 100 TB a frame that arrives EMPTY is routine: a predicate that
matches nothing, a partition-pruned scan, a day with no data. Under
Spark 4's default ANSI mode that shape is where latent job-killers
hide (the r11 audit caught events_time_to_convert dying with
DIVIDE_BY_ZERO on a zero-signup funnel, and sim_ann_lsh raising a bare
TypeError off a driver-side ``first()``).

Contract pinned here, over EVERY registered catalog query run against
a zero-row copy of all ten fixture tables (real schemas, no rows):

- queries with defined empty semantics (the overwhelming majority)
  execute to completion — usually an empty result, sometimes a
  zero-count / null-stat row;
- estimator-backed queries, where training on nothing is undefined,
  raise ``ml.fitguard``'s crisp ValueError naming the operator — never
  a deep MLlib/numpy stack;
- NOTHING else: any new exception class is a regression.
"""

from __future__ import annotations

import os

import pytest

from .audit_walk import walk_catalog
from .conftest import SF_SMOKE

# Training on an empty corpus is undefined by contract; these must fail
# CRISPLY (ml/fitguard.fit_nonempty or the PQ empty-codebook guard).
EXPECTED_CRISP = {
    "emb_opq_rotation",
    "emb_pca_whitening",
    "emb_pq_codes",
    "ml_als_recommend",
    "ml_kmeans_embeddings",
    "ml_survival_aft",
    "sem_dedup",
    "sim_ivf_pq_topk",
    "sim_ivf_topk",
    "sim_pq_adc_topk",
}


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Zero-row copies of every fixture table with the REAL parquet
    schemas (taken from the sf0.001 footers, so physical-type drift in
    the fixtures propagates here automatically)."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_empty")
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(SF_SMOKE, f))
            pq.write_table(schema.empty_table(), str(d / f))
    return str(d)


@pytest.mark.slow
def test_every_query_is_empty_input_safe(spark, empty_sf_dir):
    crisp, bad = walk_catalog(spark, empty_sf_dir)
    assert not bad, f"not empty-input safe: {bad}"
    assert crisp == EXPECTED_CRISP, (
        f"crisp-failure set drifted: +{sorted(crisp - EXPECTED_CRISP)} "
        f"-{sorted(EXPECTED_CRISP - crisp)}"
    )
