"""Isolate the mb-vs-flat LM SOLVER cost from the metacal pipeline.

profile_mb showed mb/flat = 1.5 at equal nfev statistics, with the
image-set stage identical - so either the solver lowers worse in the
[B, E, P] layout, or upstream work is being fused into (and recomputed
inside) the mb while_loop. This times the solver alone on identical
pixel data fed as jit INPUTS (nothing upstream to fuse):
  flat : _exp_lm_measure over [N, P]
  mb   : the mb FitData path over [N/E, E, P] (epochwise objective)

Run on the TPU: python tools/profile_mb_solver.py [N] [E] [reps]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as BN  # noqa: E402
from ngmix_tpu.batch import (  # noqa: E402
    LMConf,
    MetacalConfig,
    _auto_cascade,
    _exp_lm_measure,
    _lm_result_columns,
    _make_mb_gather_f,
    _mb_epochwise_normal_fn,
    _mb_epochwise_normal_fn_f,
    _mb_epochwise_normal_fn_t,
    _mb_gather_t,
    _moments_lm_guess,
    make_pixels_batch,
)
from ngmix_tpu.fitting.fit_model import FitData  # noqa: E402
from ngmix_tpu.fitting.lm import run_lm_normal_batched  # noqa: E402


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    B = N // E

    jac = (BN.SCALE, 0, 0, BN.SCALE)
    key = jax.random.PRNGKey(11)
    imgs, weights, cens, _, _, _ = BN.make_sim_batch_hetero(
        key, N, jac=jac
    )
    # central 19x19 crop (the headline fit window)
    r0 = (BN.DIMS[0] - 19) // 2
    imgs = imgs[:, r0:r0 + 19, r0:r0 + 19]
    weights = weights[:, r0:r0 + 19, r0:r0 + 19]
    cens = cens - r0
    conf = MetacalConfig(dims=(19, 19), psf_dims=BN.PSF_DIMS, jac=jac)
    pixels = make_pixels_batch(imgs, weights, cens, conf)
    psf_sigma = jnp.full((N,), 0.3, imgs.dtype)

    def fetch(x):
        float(jnp.sum(jax.tree.leaves(x)[0]))

    lm_conf = LMConf()

    @jax.jit
    def flat_solve(px, ps):
        return _exp_lm_measure(px, ps, lm_conf)

    def make_mb_solve(objective):
        @jax.jit
        def mb_solve(px, ps):
            dtype = px.val.dtype
            pixels_mb = jax.tree.map(lambda x: x.reshape(B, E, -1), px)
            sig2 = (ps.reshape(B, E) ** 2)
            psf_gmix = jnp.zeros((B, E, 1, 6), dtype)
            psf_gmix = psf_gmix.at[..., 0, 0].set(1.0)
            psf_gmix = psf_gmix.at[..., 0, 3].set(sig2)
            psf_gmix = psf_gmix.at[..., 0, 5].set(sig2)
            band = jnp.zeros((B, E), jnp.int32)
            data = FitData(
                pixels=pixels_mb, psf_gmix=psf_gmix, band=band
            )
            pix_flat = jax.tree.map(lambda x: x.reshape(B, -1), px)
            guess5, wsum = _moments_lm_guess(pix_flat, 2 * sig2[:, 0])
            guess = jnp.concatenate([guess5, wsum[:, None]], axis=-1)
            lo = jnp.full(6, -jnp.inf, dtype)
            hi = jnp.full(6, jnp.inf, dtype)
            gather_fn = None
            if objective == "epoch-t":
                normal_fn = _mb_epochwise_normal_fn_t("exp", 1)
                data = FitData(
                    pixels=jax.tree.map(
                        lambda x: jnp.swapaxes(x, 0, 1), pixels_mb
                    ),
                    psf_gmix=jnp.swapaxes(psf_gmix, 0, 1),
                    band=band,
                )
                gather_fn = _mb_gather_t
            elif objective == "epoch-f":
                normal_fn = _mb_epochwise_normal_fn_f("exp", 1)
                data = FitData(
                    pixels=jax.tree.map(
                        lambda x: x.reshape((B * E,) + x.shape[2:]),
                        pixels_mb,
                    ),
                    psf_gmix=psf_gmix.reshape(B * E, 1, 6),
                    band=band,
                )
                gather_fn = _make_mb_gather_f(E)
            elif objective == "epoch":
                normal_fn = _mb_epochwise_normal_fn("exp", 1)
            else:
                from ngmix_tpu.fitting.fit_model import make_fdiff_fn

                fdiff_fn = make_fdiff_fn("exp")

                def normal_fn(pars, d):
                    def one(p, dd):
                        def f(q):
                            return fdiff_fn(q, dd)

                        return f(p), jax.jacfwd(f)(p)

                    r, J = jax.vmap(one)(pars, d)
                    from ngmix_tpu.batch import _normal_reductions

                    return _normal_reductions(r, J)
            nres = jnp.sum(pixels_mb.ierr > 0, axis=(-2, -1))
            out = run_lm_normal_batched(
                normal_fn, data, guess, lo, hi, lm_conf,
                nres=nres, compact_capacity=_auto_cascade(B),
                gather_fn=gather_fn,
            )
            _lm_result_columns(out, "exp", 5, nband=1)
            return out

        return mb_solve

    def timeit(fn, *a):
        fetch(fn(*a))
        t0 = time.perf_counter()
        for _ in range(reps):
            fetch(fn(*a))
        return (time.perf_counter() - t0) / reps

    tf = timeit(flat_solve, pixels, psf_sigma)
    tm_fold = timeit(make_mb_solve("epoch-f"), pixels, psf_sigma)
    tm_t = timeit(make_mb_solve("epoch-t"), pixels, psf_sigma)
    tm_e = timeit(make_mb_solve("epoch"), pixels, psf_sigma)
    tm_f = timeit(make_mb_solve("fused"), pixels, psf_sigma)
    print("N=%d E=%d reps=%d" % (N, E, reps))
    print("flat solve       : %.4f s (%.0f stamps/s)" % (tf, N / tf))
    print("mb solve epoch-f : %.4f s (%.0f eps/s)" % (tm_fold, N / tm_fold))
    print("mb solve epoch-t : %.4f s (%.0f eps/s)" % (tm_t, N / tm_t))
    print("mb solve epoch-be: %.4f s (%.0f eps/s)" % (tm_e, N / tm_e))
    print("mb solve fused   : %.4f s (%.0f eps/s)" % (tm_f, N / tm_f))
    print("epoch-f/flat = %.3f | epoch-t/flat = %.3f | epoch-be/flat = %.3f"
          " | fused/flat = %.3f"
          % (tm_fold / tf, tm_t / tf, tm_e / tf, tm_f / tf))


if __name__ == "__main__":
    main()
