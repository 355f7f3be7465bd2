"""Whole-catalog null-injection robustness — the dirty-column shape.

Third of the degenerate-input family (zero rows, one row, and now
NULLS EVERYWHERE): every column the parquet schema marks nullable gets
~30 % nulls — including join keys, timestamps, embedding vectors, and
document text. At 100 TB null cells are routine, and this is where the
round-11 audit found the last latent job-killers:

- null embeddings reaching MLlib fits (KMeans NPE deep in Scala:
  ``ml_kmeans_embeddings``, ``emb_pca_whitening``, ``sem_dedup``) —
  now excluded with pushable ``isNotNull`` predicates, the same policy
  as the ANN entry points;
- null machine ids / timestamps poisoning the AFT survival labels;
- null text crashing Python workers (``doc_compression_ratio``'s
  ``str.encode``, ``rel_python_udtf``'s ``str.split``);
- two more ANSI DIVIDE_BY_ZERO sites (``ml_ndcg_at_k`` on an all-null
  relevance group, ``rel_geo_harmonic_means`` on an all-null group —
  its means now run over positive observations only).

Contract pinned here: EVERY registered catalog query completes on the
null-injected fixture. No crisp-error allowance — 30 % nulls still
leaves enough valid rows for every estimator, so any exception at all
is a regression.
"""

from __future__ import annotations

import os

import pytest

from .audit_walk import walk_catalog
from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def nullinj_sf_dir(tmp_path_factory):
    """Copies of every fixture table with ~30 % nulls injected into
    every nullable column (rows 0-2 of each 10, deterministic), real
    schemas preserved."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_nullinj")
    for f in os.listdir(SF_SMOKE):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(SF_SMOKE, f))
        n = t.num_rows
        mask = pa.array([(i % 10) < 3 for i in range(n)])
        cols = []
        for i, field in enumerate(t.schema):
            col = t.column(i)
            if field.nullable and n:
                col = pa.compute.if_else(
                    mask, pa.nulls(n, field.type), col.combine_chunks()
                )
            cols.append(col)
        pq.write_table(pa.table(cols, schema=t.schema), str(d / f))
    return str(d)


@pytest.mark.slow
def test_every_query_survives_null_injection(spark, nullinj_sf_dir):
    crisp, bad = walk_catalog(spark, nullinj_sf_dir)
    assert not bad, f"not null-safe: {bad}"
    # 30% nulls leaves every estimator fittable — a crisp fitguard
    # ValueError here is a regression, same as any other exception
    assert crisp == set(), f"estimators stopped fitting under nulls: {crisp}"
