"""Unrolled small-matrix Cholesky routines for per-lane fitter algebra.

XLA's generic batched linalg primitives (cholesky/LU solve, eigvalsh)
compile to blocked loop programs sized for large matrices; on the
n <= 8 systems the fitters solve per lane they dominate the survey
batch wall clock on TPU (measured at B=10240, n=6 on v5e: vmapped
``jax.scipy.linalg.solve(assume_a="pos")`` 8.7 ms vs 2.5 ms unrolled;
the covariance-sanity ``eigvalsh`` ~70 ms per call). These routines
unroll the factorization at trace time into pure elementwise ops that
fuse into the surrounding program and vectorize over any leading batch
shape.

All functions take ``A[..., n, n]`` with static n and broadcast over
the leading dims. Failure propagates IEEE-style: a non-positive pivot
produces nan (sqrt of a negative / division by zero), which callers
treat as a rejected step or a flagged covariance — device code never
raises, per the package invariant.
"""
import jax.numpy as jnp

__all__ = ["chol_solve", "chol_inverse", "chol_is_spd"]


def _chol_entries(A):
    """lower-triangular Cholesky entries of A as trace-time lists.

    Returns (L, pivots): L[i][j] (i >= j) arrays of A's leading shape,
    and the n pre-sqrt pivot values (A is SPD iff all pivots > 0 -
    Sylvester's criterion via the leading principal minors).
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    pivots = []
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        pivots.append(s)
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            t = A[..., i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv_d
    return L, pivots


def chol_solve(A, b):
    """solve A x = b for SPD A[..., n, n], b[..., n] -> x[..., n].

    nan where A is not positive definite (callers reject such steps).
    """
    L, _ = _chol_entries(A)
    n = len(L)
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def chol_inverse(A):
    """inverse of SPD A[..., n, n] via inv(L): A^-1 = L^-T L^-1.

    nan where A is not positive definite. Note the deliberate semantic
    vs an LU inverse: an indefinite (hence invalid-covariance) matrix
    comes back nan and is caught by the callers' finiteness flags,
    where LU would return finite garbage.
    """
    L, _ = _chol_entries(A)
    n = len(L)
    invL = [[None] * n for _ in range(n)]
    for j in range(n):
        invL[j][j] = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = L[i][j] * invL[j][j]
            for k in range(j + 1, i):
                s = s + L[i][k] * invL[k][j]
            invL[i][j] = -s / L[i][i]
    rows = []
    for i in range(n):
        cols = []
        for j in range(n):
            s = None
            for k in range(max(i, j), n):
                t = invL[k][i] * invL[k][j]
                s = t if s is None else s + t
            cols.append(s)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def chol_is_spd(A):
    """[...] bool: every Cholesky pivot strictly positive.

    For finite symmetric A this is exactly "all eigenvalues > 0"
    (Sylvester). Callers combine it with their own finiteness check;
    nan pivots compare False here.
    """
    _, pivots = _chol_entries(A)
    ok = None
    for s in pivots:
        good = s > 0
        ok = good if ok is None else ok & good
    return ok
