"""Unrolled small-matrix Cholesky vs numpy references."""
import numpy as np
import jax
import jax.numpy as jnp

from ngmix_tpu.ops.small_linalg import chol_inverse, chol_is_spd, chol_solve


def _spd_batch(rng, B, n, jitter=1.0):
    M = rng.normal(size=(B, n + 2, n))
    return np.einsum("bri,brj->bij", M, M) + np.eye(n) * jitter


def test_chol_solve_matches_numpy():
    rng = np.random.RandomState(11)
    for n in (2, 3, 6, 7):
        A = _spd_batch(rng, 64, n)
        b = rng.normal(size=(64, n))
        x = np.asarray(chol_solve(jnp.asarray(A), jnp.asarray(b)))
        ref = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(x, ref, rtol=1e-10, atol=1e-12)


def test_chol_solve_unbatched():
    rng = np.random.RandomState(3)
    A = _spd_batch(rng, 1, 6)[0]
    b = rng.normal(size=6)
    x = np.asarray(chol_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-10)


def test_chol_inverse_matches_numpy():
    rng = np.random.RandomState(7)
    for n in (2, 6):
        A = _spd_batch(rng, 32, n)
        inv = np.asarray(chol_inverse(jnp.asarray(A)))
        np.testing.assert_allclose(inv, np.linalg.inv(A), rtol=1e-9,
                                    atol=1e-12)


def test_not_spd_gives_nan_not_garbage():
    A = np.diag([1.0, -1.0, 2.0])
    x = np.asarray(chol_solve(jnp.asarray(A), jnp.ones(3)))
    assert not np.all(np.isfinite(x))
    inv = np.asarray(chol_inverse(jnp.asarray(A)))
    assert not np.all(np.isfinite(inv))


def test_is_spd_matches_eigvalsh():
    rng = np.random.RandomState(5)
    A = _spd_batch(rng, 50, 6, jitter=0.0)
    # make some indefinite by flipping an eigenvalue
    for i in range(0, 50, 3):
        w, V = np.linalg.eigh(A[i])
        w[0] = -abs(w[0]) - 1e-3
        A[i] = (V * w) @ V.T
    got = np.asarray(chol_is_spd(jnp.asarray(A)))
    want = np.array([np.all(np.linalg.eigvalsh(a) > 0) for a in A])
    np.testing.assert_array_equal(got, want)


def test_is_spd_nonfinite_false():
    A = np.eye(4)
    A[2, 2] = np.nan
    assert not bool(chol_is_spd(jnp.asarray(A)))


def test_jit_and_grad_safe():
    rng = np.random.RandomState(2)
    A = jnp.asarray(_spd_batch(rng, 8, 6))
    b = jnp.asarray(rng.normal(size=(8, 6)))

    @jax.jit
    def f(A, b):
        return jnp.sum(chol_solve(A, b) ** 2)

    g = jax.grad(f)(A, b)
    assert np.all(np.isfinite(np.asarray(g)))
