"""Throughput surface: mb (epochwise) vs flat across batch sizes, one
process, interleaved reps. The ab_mb runs showed 4x swings in the FLAT
pipeline's rate between adjacent epoch-stamp counts (6144: 39.6k/s,
12288: 19.6k/s) - compile-shape luck dominates any mb-vs-flat story,
so map the surface before drawing conclusions.

Run on the TPU: python tools/sweep_mb_batch.py [E] [nband] [reps]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as BN  # noqa: E402
from ngmix_tpu.batch import (  # noqa: E402
    MetacalConfig,
    metacal_pipeline,
    metacal_pipeline_mb,
)


def fetch(x):
    float(jnp.sum(jax.tree.leaves(x)[0]))


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    nband = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sizes = (1024, 2048, 4096, 6144)

    jac = (BN.SCALE, 0, 0, BN.SCALE)
    conf = MetacalConfig(
        dims=BN.DIMS, psf_dims=BN.PSF_DIMS, jac=jac, fixnoise=True,
        pad_factor=1.3, fit_dims=(19, 19),
    )
    band = jnp.arange(E, dtype=jnp.int32) % nband

    progs = []
    for B in sizes:
        key = jax.random.PRNGKey(5)
        mb_args = BN.make_sim_batch_hetero(
            key, B, jac=jac, nepoch=E, nband=nband if nband > 1 else None
        )
        flat_args = tuple(
            a.reshape((B * E,) + a.shape[2:]) for a in mb_args
        )
        mb = jax.jit(
            lambda *a: metacal_pipeline_mb(
                *a, band, nband, conf, measure="exp-lm"
            )
        )
        fl = jax.jit(
            lambda *a: metacal_pipeline(*a, conf, measure="exp-lm")
        )
        fetch(mb(*mb_args))
        fetch(fl(*flat_args))
        progs.append((B, mb, mb_args, fl, flat_args))
        print("compiled B=%d" % B, flush=True)

    acc = {B: [0.0, 0.0] for B in sizes}
    for i in range(reps):
        for B, mb, mb_args, fl, flat_args in progs:
            t0 = time.perf_counter(); fetch(mb(*mb_args))
            acc[B][0] += time.perf_counter() - t0
            t0 = time.perf_counter(); fetch(fl(*flat_args))
            acc[B][1] += time.perf_counter() - t0
        print("rep %d done" % i, flush=True)

    print("E=%d nband=%d reps=%d" % (E, nband, reps))
    for B in sizes:
        tm, tf = acc[B][0] / reps, acc[B][1] / reps
        n = B * E
        print(
            "B=%5d (%5d eps): mb %.3f s (%6.0f eps/s, %5.0f obj/s) | "
            "flat %.3f s (%6.0f eps/s) | mb/flat %.2f"
            % (B, n, tm, n / tm, B / tm, tf, n / tf, tm / tf),
            flush=True,
        )


if __name__ == "__main__":
    main()
