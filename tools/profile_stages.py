"""Stage-level wall-clock profile of the headline metacal pipeline.

Times, as whole jitted programs on the live backend (per CLAUDE.md:
never micro-bench per-op through the axon tunnel):
  1. psf prep (FFTs + target derivation)
  2. the full 10-pipeline image set (5 types + fixnoise) w/o measure
  3. pipeline with the cheap gaussmom measure
  4. pipeline with the headline exp-LM measure
Differences localize the cost of the k-ops vs the LM stage.

Usage: python tools/profile_stages.py [B] [nrep]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import DIMS, PSF_DIMS, SCALE, make_sim_batch  # noqa: E402
from ngmix_tpu.batch import (  # noqa: E402
    MetacalConfig,
    make_metacal_pipeline_fn,
    make_pixels_batch,
    metacal_image_set,
    prepare_psf_kdata,
)


def fetch(x):
    float(jnp.sum(jax.tree.leaves(x)[0]).real)


def rate(label, fn, *a, nrep=5):
    fetch(fn(*a))  # compile
    t0 = time.time()
    for _ in range(nrep):
        fetch(fn(*a))
    dt = (time.time() - t0) / nrep
    print(f"{label:42s} {dt*1e3:9.2f} ms/batch")
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    nrep = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    key = jax.random.PRNGKey(314)
    args = jax.block_until_ready(make_sim_batch(key, B))
    imgs, weights, cens, pimgs, pcens, noise = args
    conf = MetacalConfig(
        dims=DIMS, psf_dims=PSF_DIMS, jac=(SCALE, 0.0, 0.0, SCALE),
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
    )
    print(f"B={B} dims={DIMS} pad={conf.pad_factor} backend={jax.default_backend()}")

    t_psf = rate(
        "psf prep (FFT + target)",
        jax.jit(lambda pi, pc: prepare_psf_kdata(pi, pc, conf)),
        pimgs, pcens, nrep=nrep,
    )

    @jax.jit
    def image_sets(imgs, cens, pimgs, pcens, noise):
        psfdata = prepare_psf_kdata(pimgs, pcens, conf)
        odict, sigma = metacal_image_set(
            imgs, cens, pimgs, pcens, conf, psfdata=psfdata)
        cen_c = jnp.full_like(cens, (conf.dims[0] - 1) / 2.0)
        noise_rot = jnp.rot90(noise, k=1, axes=(-2, -1))
        ndict, _ = metacal_image_set(
            noise_rot, cen_c, pimgs, pcens, conf, psfdata=psfdata)
        out = {t: odict[t] + jnp.rot90(ndict[t], k=3, axes=(-2, -1))
               for t in odict}
        return out, sigma

    t_img = rate("image set (5 types x 2, fixnoise)",
                 image_sets, imgs, cens, pimgs, pcens, noise, nrep=nrep)

    @jax.jit
    def image_sets_pix(imgs, cens, pimgs, pcens, noise):
        out, sigma = image_sets(imgs, cens, pimgs, pcens, noise)
        types = list(out)
        ims_all = jnp.concatenate([out[t] for t in types], axis=0)
        wt_all = jnp.tile(weights * 0.5, (len(types), 1, 1))
        cens_all = jnp.tile(cens, (len(types), 1))
        fh, fw = conf.fit_dims
        r0 = (conf.dims[0] - fh) // 2
        c0 = (conf.dims[1] - fw) // 2
        ims_all = ims_all[:, r0:r0 + fh, c0:c0 + fw]
        wt_all = wt_all[:, r0:r0 + fh, c0:c0 + fw]
        cens_all = cens_all - jnp.asarray([r0, c0], cens_all.dtype)
        return make_pixels_batch(
            ims_all, wt_all, cens_all, conf._replace(dims=(fh, fw))
        ), sigma

    t_pix = rate("image set + stack/crop/pixels",
                 image_sets_pix, imgs, cens, pimgs, pcens, noise, nrep=nrep)

    fn_gm = make_metacal_pipeline_fn(conf, measure="gaussmom")
    t_gm = rate("full pipeline, gaussmom measure", fn_gm, *args, nrep=nrep)

    fn_lm = make_metacal_pipeline_fn(conf, measure="exp-lm")
    t_lm = rate("full pipeline, exp-lm measure", fn_lm, *args, nrep=nrep)

    print()
    print(f"{'psf prep share':30s} {t_psf*1e3:9.2f} ms")
    print(f"{'k-ops beyond psf prep':30s} {(t_img-t_psf)*1e3:9.2f} ms")
    print(f"{'stack/pixels overhead':30s} {(t_pix-t_img)*1e3:9.2f} ms")
    print(f"{'gaussmom measure':30s} {(t_gm-t_pix)*1e3:9.2f} ms")
    print(f"{'exp-LM measure (incl guess)':30s} {(t_lm-t_pix)*1e3:9.2f} ms")
    print(f"{'headline':30s} {t_lm*1e3:9.2f} ms -> {B/t_lm:.0f} stamps/s")


if __name__ == "__main__":
    main()
