"""Whole-catalog RAGGED-EMBEDDING robustness — the wrong-dimension shape.

Ninth of the degenerate-input family. Embedding columns are
`array<float>` — the SCHEMA carries no length, so a truncated, empty,
or over-long vector (a partial upstream write, a model-version mix, a
bad batch) is schema-legal and reaches every consumer. The r12 probe
measured the blast radius on a fixture with every 20th vector ragged
(truncated to 3 / emptied / extended by 8): 7 of the 16
embedding-family queries die —

- MLlib fits/transforms reject mismatched dims deep in Scala
  (``ml_kmeans_embeddings``, ``sem_dedup``, ``sim_ivf_topk``,
  ``sim_ann_lsh``; ``emb_pca_whitening``'s "source vector size 3 must
  be no less than k=16");
- PQ's numpy codebook reshape throws "all input arrays must have the
  same shape" (``emb_pq_codes``);
- ``emb_matryoshka_truncate`` asserts its prefix contract.

And the paths that DO complete (zip_with dot products) can return
silently wrong similarities for the ragged rows — worse than dying.

Per-query dim guards would be the wrong architecture (same argument as
NaN/±Inf and extreme timestamps): the engine's answer is the DIMENSION
leg of the lake boundary — ``finite_split(array_dims={col: dim})``
once at ingestion (catalog entry ``lake_dim_quarantine``), after which
every downstream query may assume fixed-width vectors. Pinned here:

1. ``array_dims`` semantics: exact complement split; NULL vectors pass
   (missing is the null contract's business, ragged is poison).
2. The fixture's modal embedding length matches ``EMBEDDING_DIM`` (the
   constant is a data contract the oracle hardcodes).
3. The poison is real: ``emb_pca_whitening`` DIES on the raw ragged
   fixture.
4. The recipe works END-TO-END: after one dim split on the embeddings
   table, EVERY catalog query completes.
"""

from __future__ import annotations

import os
import shutil

import pytest

from real_time_predictive_maintenance_data_pipeline_spark.operators.quarantine import (
    finite_split,
)
from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
    EMBEDDING_DIM,
)
from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
    TABLES,
    load_table,
)

from .audit_walk import ESTIMATOR_CRISP_OK, walk_catalog
from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def ragged_sf_dir(tmp_path_factory):
    """Fixture copy where every 20th embedding is ragged (truncated to
    3 elements / emptied / extended by 8); other tables byte-identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_ragged")
    for f in os.listdir(SF_SMOKE):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(SF_SMOKE, f)
        if f != "embeddings.parquet":
            shutil.copyfile(src, str(d / f))
            continue
        t = pq.read_table(src)
        emb = t.column("embedding").to_pylist()
        for j in range(0, t.num_rows, 20):
            k = (j // 20) % 3
            if k == 0:
                emb[j] = emb[j][:3]
            elif k == 1:
                emb[j] = []
            else:
                emb[j] = list(emb[j]) + [0.5] * 8
        cols = [
            pa.array(emb, type=fld.type)
            if fld.name == "embedding"
            else t.column(i)
            for i, fld in enumerate(t.schema)
        ]
        pq.write_table(pa.table(cols, schema=t.schema), str(d / f))
    return str(d)


@pytest.fixture(scope="module")
def dim_cleaned_sf_dir(spark, ragged_sf_dir, tmp_path_factory):
    """The documented recipe: one dim split on the embeddings table at
    the boundary, clean side written back as the lake."""
    d = tmp_path_factory.mktemp("sf_ragged_clean")
    for name in TABLES:
        df = load_table(spark, ragged_sf_dir, name)
        if name == "embeddings":
            df, _bad = finite_split(
                df, (), array_dims={"embedding": EMBEDDING_DIM}
            )
        df.write.mode("overwrite").parquet(str(d / f"{name}.parquet"))
    return str(d)


def test_fixture_modal_dim_matches_contract(spark):
    """EMBEDDING_DIM is a data contract the oracle hardcodes — pin it
    against the live fixture's modal vector length."""
    from pyspark.sql import functions as F

    df = load_table(spark, SF_SMOKE, "embeddings")
    top = (
        df.groupBy(F.size("embedding").alias("dim"))
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    assert top.dim == EMBEDDING_DIM, (
        f"fixture modal embedding dim {top.dim} != EMBEDDING_DIM "
        f"{EMBEDDING_DIM} — update the constant AND the "
        "lake_dim_quarantine oracle together"
    )


def test_dim_split_is_exact_complement(spark):
    rows = [
        (1, [0.1] * 4),
        (2, [0.1] * 3),
        (3, None),
        (4, []),
        (5, [0.1] * 5),
    ]
    df = spark.createDataFrame(rows, "id bigint, e array<double>")
    clean, bad = finite_split(df, (), array_dims={"e": 4})
    assert sorted(r.id for r in clean.collect()) == [1, 3]
    assert sorted(r.id for r in bad.collect()) == [2, 4, 5]


def test_lake_dim_quarantine_counts_poison(spark, ragged_sf_dir):
    r = all_queries()["lake_dim_quarantine"].spark(spark, ragged_sf_dir).first()
    assert r.n_quarantined > 0
    assert r.n_clean + r.n_quarantined == r.n_rows


def test_raw_poison_still_kills_an_mllib_fit(spark, ragged_sf_dir):
    """Documents WHY the dim boundary exists: MLlib rejects mismatched
    vector dims deep in Scala."""
    q = all_queries()["emb_pca_whitening"]
    with pytest.raises(Exception, match="size|dimension|shape"):
        q.spark(spark, ragged_sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()


@pytest.mark.slow
def test_every_query_survives_after_dim_split(spark, dim_cleaned_sf_dir):
    crisp, bad = walk_catalog(spark, dim_cleaned_sf_dir)
    assert not bad, f"dim boundary did not make the catalog safe: {bad}"
    assert crisp <= ESTIMATOR_CRISP_OK, f"unexpected crisp failures: {crisp}"
