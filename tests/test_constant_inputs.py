"""Whole-catalog constant-column robustness — the zero-variance shape.

Fourth of the degenerate-input family (zero rows, one row, nulls
everywhere, and now ZERO VARIANCE): every measure column is flattened
to one constant, so every sample variance, covariance, spread, and
score distribution collapses to exactly 0. At 100 TB this is a real
shape — a sensor pinned at a constant reading, a flat pricing tier, a
partition of identical events — and it is where denominators built
from variances live.

The round-11 audit found one job-killer the one-row audit could not
see (it needs n > 1 WITH zero spread): Spark's builtin ``corr``
divides by sqrt(varx*vary) unconditionally in its final evaluation —
an ANSI DIVIDE_BY_ZERO that a wrapping CASE cannot stop, fixed in
``rel_corr_covar`` by assembling r from the safe covar_pop/stddev_pop
builtins behind a variance guard. Everything else already holds: the
one-row guards (se2 > 0, base_rate > 0, idcg > 0, theta's covariate
variance) cover their zero-variance cases too.

Contract pinned here: EVERY registered catalog query completes on the
constant-measure fixture (keys/ids/timestamps stay real, so joins and
windows still exercise their normal paths).
"""

from __future__ import annotations

import os

import pytest

from .audit_walk import ESTIMATOR_CRISP_OK, walk_catalog
from .conftest import SF_SMOKE

# Measure columns flattened to one constant (7 / 7.0 — away from zero
# so rate/ratio denominators stay defined; zero spread is the point).
CONST_COLS = {
    "value",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "o_totalprice",
    "c_acctbal",
    "s_acctbal",
    "p_retailprice",
    "p_size",
    "n_chars",
}


@pytest.fixture(scope="module")
def const_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_const")
    for f in os.listdir(SF_SMOKE):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(SF_SMOKE, f))
        n = t.num_rows
        cols = []
        for i, field in enumerate(t.schema):
            col = t.column(i)
            if field.name in CONST_COLS and n:
                py = 7 if pa.types.is_integer(field.type) else 7.0
                col = pa.chunked_array([pa.array([py] * n, type=field.type)])
            cols.append(col)
        pq.write_table(pa.table(cols, schema=t.schema), str(d / f))
    return str(d)


@pytest.mark.slow
def test_every_query_survives_constant_measures(spark, const_sf_dir):
    crisp, bad = walk_catalog(spark, const_sf_dir)
    assert not bad, f"not constant-input safe: {bad}"
    assert crisp <= ESTIMATOR_CRISP_OK, f"unexpected crisp failures: {crisp}"
