"""Probe: per-evaluation cost of the batched LM objective at headline
shapes (B = 5 types x 2048, P = 19x19), timed as N chained evals inside
one jit (per CLAUDE.md: difference timings, never per-op).

  (a) primal residual only (cost)
  (b) full AD normal equations (cost, Jtr, JtJ)  <- the hot call
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from ngmix_tpu.batch import _exp_ad_normal_fn, _model_lm_fdiff  # noqa: E402
from ngmix_tpu.pixels import Pixels  # noqa: E402
from ngmix_tpu.gmix import core as gcore  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    P = 361
    dtype = jnp.float32
    rng = np.random.RandomState(3)
    scale = 0.263
    side = int(np.sqrt(P))
    rr, cc = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    v = ((rr - side / 2).reshape(-1) * scale)[None, :].repeat(B, 0)
    u = ((cc - side / 2).reshape(-1) * scale)[None, :].repeat(B, 0)
    pixels = Pixels(
        v=jnp.asarray(v, dtype),
        u=jnp.asarray(u, dtype),
        area=jnp.full((B, P), scale**2, dtype),
        val=jnp.asarray(rng.normal(size=(B, P)) * 0.01, dtype),
        ierr=jnp.full((B, P), 1.0e4, dtype),
    )
    psf_gmix = jnp.zeros((B, 1, 6), dtype)
    psf_gmix = psf_gmix.at[:, 0, 0].set(1.0)
    psf_gmix = psf_gmix.at[:, 0, 3].set(0.08).at[:, 0, 5].set(0.08)
    pars = jnp.asarray(
        np.tile([0.0, 0.0, 0.05, -0.02, 0.5, 100.0], (B, 1)), dtype
    )
    data = (pixels, psf_gmix)

    NCHAIN = 8

    def chain(f):
        def g(p):
            out = 0.0
            for i in range(NCHAIN):
                r = f(p + 1e-6 * i)
                out = out + jax.tree.reduce(
                    lambda a, b: a + jnp.sum(b), r, 0.0
                )
            return out
        return jax.jit(g)

    def primal(p):
        r = jax.vmap(lambda q, px, pg: _model_lm_fdiff(
            q, (px, pg), gcore.fill_exp))(p, pixels, psf_gmix)
        return jnp.sum(r * r, axis=-1)

    def normal(p):
        return _exp_ad_normal_fn(p, data)

    for name, f in [("primal cost only", primal),
                    ("AD normal (cost,Jtr,JtJ)", normal)]:
        g = chain(f)
        float(g(pars))
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            float(g(pars))
        dt = (time.time() - t0) / reps / NCHAIN
        print(f"{name:28s} {dt*1e3:8.3f} ms/eval  (B={B}, P={P})")


if __name__ == "__main__" and "--measure" not in sys.argv:
    main()


def probe_measure():
    """time _exp_lm_measure on realistic sim stamps and report nfev"""
    from bench import make_sim_batch, DIMS, PSF_DIMS, SCALE
    from ngmix_tpu.batch import (
        MetacalConfig, make_metacal_pipeline_fn, metacal_image_set,
        prepare_psf_kdata, make_pixels_batch, _exp_lm_measure,
    )
    from ngmix_tpu.fitting.lm import LMConf

    B = 2048
    key = jax.random.PRNGKey(314)
    args = jax.block_until_ready(make_sim_batch(key, B))
    imgs, weights, cens, pimgs, pcens, noise = args
    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0.0, 0.0, SCALE),
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
    )

    # build the actual measured pixels (5 types stacked) once, host-side
    @jax.jit
    def build(imgs, weights, cens, pimgs, pcens, noise):
        psfdata = prepare_psf_kdata(pimgs, pcens, conf)
        odict, sigma = metacal_image_set(
            imgs, cens, pimgs, pcens, conf, psfdata=psfdata)
        cen_c = jnp.full_like(cens, (conf.dims[0] - 1) / 2.0)
        ndict, _ = metacal_image_set(
            jnp.rot90(noise, 1, (-2, -1)), cen_c, pimgs, pcens, conf,
            psfdata=psfdata)
        types = list(odict)
        ims = jnp.concatenate(
            [odict[t] + jnp.rot90(ndict[t], 3, (-2, -1)) for t in types], 0)
        wt = jnp.tile(weights * 0.5, (len(types), 1, 1))
        cn = jnp.tile(cens, (len(types), 1))
        fh, fw = conf.fit_dims
        r0 = (conf.dims[0] - fh) // 2
        c0 = (conf.dims[1] - fw) // 2
        px = make_pixels_batch(
            ims[:, r0:r0+fh, c0:c0+fw], wt[:, r0:r0+fh, c0:c0+fw],
            cn - jnp.asarray([r0, c0], cn.dtype),
            conf._replace(dims=(fh, fw)))
        sig_d = sigma * (1 + 2 * conf.step)
        return px, jnp.tile(sig_d, (len(types),))

    px, sig = jax.block_until_ready(build(*args))

    fn = jax.jit(lambda px, sig: _exp_lm_measure(px, sig, LMConf()))
    res = fn(px, sig)
    nfev = np.asarray(res["nfev"])
    print(f"nfev: p50={np.percentile(nfev,50):.0f} "
          f"p90={np.percentile(nfev,90):.0f} max={nfev.max()} "
          f"mean={nfev.mean():.2f}")
    float(jnp.sum(res["pars"]))
    t0 = time.time()
    for _ in range(5):
        float(jnp.sum(fn(px, sig)["pars"]))
    print(f"_exp_lm_measure: {(time.time()-t0)/5*1e3:.1f} ms")

    # no-compaction variant for comparison
    fn2 = jax.jit(lambda px, sig: _exp_lm_measure(
        px, sig, LMConf(), compact_capacity=None))
    float(jnp.sum(fn2(px, sig)["pars"]))
    t0 = time.time()
    for _ in range(5):
        float(jnp.sum(fn2(px, sig)["pars"]))
    print(f"  (no compaction): {(time.time()-t0)/5*1e3:.1f} ms")


if __name__ == "__main__" and "--measure" in sys.argv:
    probe_measure()
