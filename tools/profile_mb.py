"""Where does the metacal_pipeline_mb epoch-stamp gap vs the flat
pipeline go?  (VERDICT r3 weak #3 / next #5.)

Times, on the same simulated objects:
  (a) flat pipeline at B*E stamps (the per-epoch-stamp ceiling),
  (b) mb pipeline at B objects x E epochs,
  (c) mb STAGES in isolation - the metacal image sets alone (dominant
      k-space work, identical between a and b up to reshapes) and the
      joint-LM measure alone - so the gap attributes to either the
      solver or the image stage.

Run on the TPU (CPU numbers are structurally useful but not absolute):
  python tools/profile_mb.py [B] [E] [reps]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as B  # noqa: E402
from ngmix_tpu.batch import (  # noqa: E402
    MetacalConfig,
    metacal_image_set,
    metacal_pipeline,
    metacal_pipeline_mb,
    prepare_psf_kdata,
)


def fetch(x):
    float(jnp.sum(jax.tree.leaves(x)[0]))


def timeit(fn, args, reps):
    out = fn(*args)
    fetch(out)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        fetch(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    Bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    jac = (B.SCALE, 0, 0, B.SCALE)
    conf = MetacalConfig(
        dims=B.DIMS, psf_dims=B.PSF_DIMS, jac=jac, fixnoise=True,
        pad_factor=1.3, fit_dims=(19, 19),
    )
    key = jax.random.PRNGKey(5)
    mb_args = B.make_sim_batch_hetero(key, Bsz, jac=jac, nepoch=E)
    flat_args = tuple(
        a.reshape((Bsz * E,) + a.shape[2:]) for a in mb_args
    )
    band = jnp.zeros(E, jnp.int32)

    flat = jax.jit(lambda *a: metacal_pipeline(*a, conf, measure="exp-lm"))
    mb = jax.jit(
        lambda *a: metacal_pipeline_mb(*a, band, 1, conf, measure="exp-lm")
    )

    t_flat = timeit(flat, flat_args, reps)
    t_mb = timeit(mb, mb_args, reps)

    # stage: the metacal image set alone on the folded epochs
    def images_only(images, weights, cens, psf_images, psf_cens, noise):
        psfdata = prepare_psf_kdata(psf_images, psf_cens, conf)
        odict, sigma = metacal_image_set(
            images, cens, psf_images, psf_cens, conf, psfdata=psfdata
        )
        return odict
    img_fn = jax.jit(images_only)
    t_img = timeit(img_fn, flat_args, reps)

    n_es = Bsz * E
    print("B=%d E=%d reps=%d" % (Bsz, E, reps))
    print("flat   : %.3f s  (%.0f epoch-stamps/s)" % (t_flat, n_es / t_flat))
    print("mb     : %.3f s  (%.0f epoch-stamps/s, %.0f obj/s)"
          % (t_mb, n_es / t_mb, Bsz / t_mb))
    print("img set: %.3f s  (x1; both pipelines run ~2x this with "
          "fixnoise)" % t_img)
    print("mb/flat = %.2f" % (t_mb / t_flat))


if __name__ == "__main__":
    main()
