"""Driver-bounded PCA power-iteration dispatch (operators/powerpca.py, r13).

Both PCA queries rebuild a fresh literal-embedding plan per round, so
at bench scale the loop cost is per-round analysis + codegen +
scheduling (measured at sf0.1: 2.86 s -> 0.36 s for the second
component, 1.76 s -> 0.33 s for the first). These tests pin (a) the
NumPy finishers against hand-computed values on a tiny matrix, (b)
driver-vs-forced-distributed row AND schema equality on BOTH
registered queries (the dispatch must be invisible in results), and
(c) the bound predicate's edges (degenerate n, the byte cutoff).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from hivetomysql_spark.operators import powerpca
from hivetomysql_spark.queries import similarity_suite


def _reference_top(X, iters):
    """Pure-Python replica of the distributed algebra (list math, no
    NumPy) — what the per-round Spark loop computes."""
    n, dim = len(X), len(X[0])
    mu = [sum(row[i] for row in X) / n for i in range(dim)]
    v = [1.0 / 8.0] * dim
    nrm = 0.0
    for _ in range(iters):
        ds = [
            sum(x * vi for x, vi in zip(row, v))
            - sum(m * vi for m, vi in zip(mu, v))
            for row in X
        ]
        s = [
            sum(row[i] * d for row, d in zip(X, ds)) - mu[i] * sum(ds)
            for i in range(dim)
        ]
        nrm = math.sqrt(sum(si * si for si in s))
        v = [si / nrm for si in s]
    return mu, v, nrm


# Small anisotropic cloud: dominant direction ~(1, 0.5), clear gap.
_X = [
    [2.0, 1.0],
    [4.0, 2.2],
    [6.0, 2.9],
    [8.0, 4.1],
    [1.0, 0.4],
    [9.0, 4.6],
]


def test_power_top_matches_reference_algebra():
    mu, v, nrm = powerpca.power_top(np.array(_X), 3)
    rmu, rv, rnrm = _reference_top(_X, 3)
    assert mu == pytest.approx(rmu, rel=1e-12)
    assert list(v) == pytest.approx(rv, rel=1e-12)
    assert nrm == pytest.approx(rnrm, rel=1e-12)
    # the direction is a unit vector pointing along the data spread
    assert float(v @ v) == pytest.approx(1.0, rel=1e-12)
    assert v[0] > 0.85  # dominant axis is x (slope ~0.5 cloud)


def test_power_second_deflation_orthogonal():
    v, nrm1, w, nrm2, ortho = powerpca.power_second(np.array(_X), 3)
    # Hotelling deflation: second direction orthogonal to the first
    assert ortho < 1e-12
    assert float(w @ w) == pytest.approx(1.0, rel=1e-12)
    # on an anisotropic cloud the spectrum gap is real
    assert nrm2 < nrm1
    # first-component state must equal a standalone power_top run
    _, v_ref, nrm1_ref = powerpca.power_top(np.array(_X), 3)
    assert list(v) == pytest.approx(list(v_ref), rel=1e-12)
    assert nrm1 == pytest.approx(nrm1_ref, rel=1e-12)


def test_matrix_fits_edges():
    assert not powerpca.matrix_fits(0, 64)   # degenerate: /(n-1)
    assert not powerpca.matrix_fits(1, 64)
    assert powerpca.matrix_fits(2, 64)
    limit = powerpca.DRIVER_MATRIX_BOUND // (64 * 8)
    assert powerpca.matrix_fits(limit, 64)
    assert not powerpca.matrix_fits(limit + 1, 64)


def test_collect_matrix_shape(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 4.0],)], "x: array<double>"
    )
    X = powerpca.collect_matrix(df)
    assert X.shape == (2, 2)
    assert X.dtype == np.float64
    assert X.tolist() == [[1.0, 2.0], [3.0, 4.0]]


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize(
    "qname",
    ["embedding_pca_power_iteration", "embedding_pca_second_component"],
)
def test_pca_query_driver_vs_loop(spark, sf_dir, qname, monkeypatch):
    fn = getattr(similarity_suite, qname)
    drv = fn(spark, sf_dir)
    drv_rows = _rows(drv)
    monkeypatch.setattr(similarity_suite, "_PCA_FORCE_DISTRIBUTED", True)
    loop = fn(spark, sf_dir)
    assert drv_rows == _rows(loop)
    assert drv.schema == loop.schema
