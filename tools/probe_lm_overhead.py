"""Probe: cost of the batched LM driver's non-eval pieces at B=10240.

  (a) vmapped _solve_damped (Cholesky 6x6) - once per iteration
  (b) unrolled closed-form Cholesky solve candidate
  (c) epilogue: linalg.solve for cov + eigvalsh - once per run
  (d) argsort gather - once per cascade level (7 levels)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from ngmix_tpu.fitting.lm import _solve_damped  # noqa: E402


def timeit(label, f, *a, nchain=16):
    @jax.jit
    def g(*a):
        out = 0.0
        for i in range(nchain):
            r = f(*[x + 1e-7 * i if x.dtype.kind == "f" else x for x in a])
            out = out + jax.tree.reduce(lambda s, b: s + jnp.sum(b), r, 0.0)
        return out
    float(g(*a))
    t0 = time.time()
    for _ in range(3):
        float(g(*a))
    dt = (time.time() - t0) / 3 / nchain
    print(f"{label:44s} {dt*1e3:8.3f} ms/call")
    return dt


def chol6_solve(A, b):
    """unrolled per-lane Cholesky solve for [..., 6, 6] SPD systems:
    pure elementwise ops, no XLA linalg loops"""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
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


def main():
    B = 10240
    rng = np.random.RandomState(5)
    M = rng.normal(size=(B, 8, 6)).astype(np.float32)
    JtJ = jnp.asarray(np.einsum("bri,brj->bij", M, M) + np.eye(6) * 1.0)
    Jtr = jnp.asarray(rng.normal(size=(B, 6)).astype(np.float32))
    lam = jnp.full((B,), 1e-3, jnp.float32)

    t_a = timeit("vmapped _solve_damped (XLA cholesky)",
                 jax.vmap(_solve_damped), JtJ, Jtr, lam)

    def damped_unrolled(JtJ, Jtr, lam):
        diag = jnp.diagonal(JtJ, axis1=-2, axis2=-1)
        diag = jnp.where(diag > 0, diag, 1.0)
        A = JtJ + lam[:, None, None] * jax.vmap(jnp.diag)(diag)
        return chol6_solve(A, -Jtr)

    t_b = timeit("unrolled chol6 solve", damped_unrolled, JtJ, Jtr, lam)

    # check agreement
    ref = jax.vmap(_solve_damped)(JtJ, Jtr, lam)
    new = damped_unrolled(JtJ, Jtr, lam)
    err = float(jnp.max(jnp.abs(ref - new) / (jnp.abs(ref) + 1e-6)))
    print(f"  max rel diff vs XLA solve: {err:.2e}")

    def epilogue(JtJ):
        eye = jnp.eye(6, dtype=JtJ.dtype)
        cov = jnp.linalg.solve(JtJ, jnp.broadcast_to(eye, JtJ.shape))
        ev = jnp.linalg.eigvalsh(cov)
        return jnp.sum(cov) + jnp.sum(ev)

    timeit("epilogue linalg.solve + eigvalsh", epilogue, JtJ, nchain=4)

    def epilogue_solve_only(JtJ):
        eye = jnp.eye(6, dtype=JtJ.dtype)
        return jnp.sum(jnp.linalg.solve(JtJ, jnp.broadcast_to(eye, JtJ.shape)))

    timeit("epilogue linalg.solve only", epilogue_solve_only, JtJ, nchain=4)

    act = jnp.asarray(rng.rand(B) > 0.5)

    def gather(act):
        idx = jnp.argsort(~act)[:5120]
        return jnp.sum(idx)

    timeit("argsort gather (one level)", gather, act)


if __name__ == "__main__":
    main()
