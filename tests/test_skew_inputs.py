"""Whole-catalog hot-key skew robustness — the 90%-one-key shape.

Sixth degenerate-input audit (zero rows, one row, nulls, constants,
NaN/Inf, and now EXTREME KEY SKEW): 90 % of fact rows collapse onto a
single join/group key — one mega-order, one hyperactive machine, one
dominant language. At 100 TB this is the shape that melts shuffles;
correctness must hold regardless (partition-size pathology is AQE's
job — `spark.sql.adaptive.enabled` with skew-join handling — plus the
explicit salted-join operators in ``operators/skew.py``).

The r11 audit found ZERO failures: every catalog query completes with
the skewed keys. Pinned so a future operator that assumes key
uniqueness or bounded group size (a collect_list that only works on
small groups, a window that materializes a partition) reds the suite
instead of melting a cluster.
"""

from __future__ import annotations

import os

import pytest

from .audit_walk import ESTIMATOR_CRISP_OK, walk_catalog
from .conftest import SF_SMOKE

# fact → key columns collapsed onto one hot value (first row's value)
SKEWED = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_custkey",),
    "events": ("user_id",),
    "documents": ("lang", "source"),
}


@pytest.fixture(scope="module")
def skewed_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_skew")
    for f in os.listdir(SF_SMOKE):
        if not f.endswith(".parquet"):
            continue
        name = f.removesuffix(".parquet")
        t = pq.read_table(os.path.join(SF_SMOKE, f))
        n = t.num_rows
        cols = []
        for i, field in enumerate(t.schema):
            col = t.column(i).combine_chunks()
            if field.name in SKEWED.get(name, ()) and n:
                vals = col.to_pylist()
                hot = vals[0]
                for j in range(n):
                    if j % 10 != 0:  # 90 % of rows -> the hot key
                        vals[j] = hot
                col = pa.array(vals, type=field.type)
            cols.append(col)
        pq.write_table(pa.table(cols, schema=t.schema), str(d / f))
    return str(d)


@pytest.mark.slow
def test_every_query_survives_hot_key_skew(spark, skewed_sf_dir):
    crisp, bad = walk_catalog(spark, skewed_sf_dir)
    assert not bad, f"not hot-key-skew safe: {bad}"
    assert crisp <= ESTIMATOR_CRISP_OK, f"unexpected crisp failures: {crisp}"
