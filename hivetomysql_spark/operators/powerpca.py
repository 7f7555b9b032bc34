"""Driver-bounded replay for the matrix-free PCA power iterations.

Both PCA queries (``embedding_pca_power_iteration``,
``embedding_pca_second_component``) iterate ``v <- normalize(C v)``
with the centered covariance applied matrix-free: each round is one
distributed job (scan + 64-bucket aggregate + a 64-double collect)
whose PLAN is rebuilt per round because the current ``v`` is embedded
as literals — so every round pays analysis + codegen compile + task
scheduling to move 64 doubles. Measured at sf0.1 (2,000 x 64 matrix,
min-of-3 noop): ~2.5 s for the second-component query's 8 sequential
jobs, nearly all of it scheduler/codegen, not data.

Dispatch rule (the measured-dispatch pattern of
``operators/smallgraph.py`` and the gbdt split search): the loop
already counts the frame (``n`` feeds ``lambda = |Cv|/(n-1)``); when
``n * dim * 8`` bytes is at most :data:`DRIVER_MATRIX_BOUND` the
embedding matrix is collected ONCE via Arrow and the fixed-round
iteration replays here in NumPy — the identical algebra (``mu``,
``d = x.v - mu.v``, ``s_i = sum(x_i d) - mu_i sum(d)``, Hotelling
deflation for the second component) with the same fixed starts and
round counts. Larger corpora keep the distributed loop unchanged; the
bound is a driver-memory statement (64 MB of doubles — smaller than a
broadcast join side), not a local-core tune, and a cluster driver
gains exactly the same scheduler-round savings.

Float contract (the argument the HITS and gbdt finishers pinned): the
distributed form's per-dimension sums already run in Spark's partial-
aggregation order, which is nondeterministic run-to-run at the last
bits; the replay sums in NumPy row order. Both arms meet at the
queries' ``ROUND(3/4/6)`` output contract (~1e-12 relative
perturbation against >=5e-5 of rounding slack), and the gates verify
rows bit-identical driver-vs-loop at sf0.001/0.01/0.1
(``tests/test_pca_dispatch.py``) plus the sf1 re-certification.
"""

from __future__ import annotations

import numpy as np

# Collected-matrix byte bound (n rows x dim x 8 bytes of float64)
# under which the power iteration replays on the driver.
DRIVER_MATRIX_BOUND = 64 * 1024 * 1024


def matrix_fits(n: int, dim: int) -> bool:
    """True when an n x dim float64 matrix is within the driver bound
    (and the iteration is non-degenerate: n >= 2 keeps the
    ``/(n - 1)`` contract identical to the distributed arm)."""
    return 2 <= n and n * dim * 8 <= DRIVER_MATRIX_BOUND


def collect_matrix(e, col: str = "x") -> np.ndarray:
    """Pull the (pre-counted) embedding frame to the driver via Arrow.

    Callers MUST have gated on :func:`matrix_fits` first — this helper
    is the transfer, not the gate.
    """
    pdf = e.select(col).toPandas()
    return np.array([np.asarray(r, dtype="float64") for r in pdf[col]])


def _mat_vec(X: np.ndarray, mu: np.ndarray, v: np.ndarray) -> np.ndarray:
    """One centered-covariance product: s_i = sum(x_i d) - mu_i sum(d)
    with d = x.v - mu.v — term-for-term the distributed algebra."""
    d = X @ v - float(mu @ v)
    return X.T @ d - mu * float(d.sum())


def power_top(X: np.ndarray, iters: int):
    """First component: uniform 1/8 start, ``iters`` fixed rounds.

    Returns ``(mu, v, nrm)`` — the mean vector, the normalized
    dominant direction, and the last un-normalized image norm |Cv|
    (what ``lambda_1 = nrm / (n - 1)`` reads).
    """
    mu = X.mean(axis=0)
    v = np.full(X.shape[1], 1.0 / 8.0)
    nrm = 0.0
    for _ in range(iters):
        s = _mat_vec(X, mu, v)
        nrm = float(np.sqrt(float(s @ s)))
        v = s / nrm
    return mu, v, nrm


def power_second(X: np.ndarray, iters: int):
    """Second component by Hotelling deflation: run :func:`power_top`
    for v1, then iterate from the alternating +/-1/8 start with v1
    projected out of the start and of every image (s <- s - (s.v1)v1).

    Returns ``(v, nrm1, w, nrm2, ortho)`` matching the distributed
    loop's terminal state: v/nrm1 from the first iteration, w/nrm2
    from the deflated second, ortho = |w.v|.
    """
    mu, v, nrm1 = power_top(X, iters)
    dim = X.shape[1]
    w = np.array([0.125 if i % 2 == 0 else -0.125 for i in range(dim)])
    w = w - float(w @ v) * v
    nrm2 = 0.0
    for _ in range(iters):
        s = _mat_vec(X, mu, w)
        s = s - float(s @ v) * v
        nrm2 = float(np.sqrt(float(s @ s)))
        w = s / nrm2
    ortho = abs(float(w @ v))
    return v, nrm1, w, nrm2, ortho
