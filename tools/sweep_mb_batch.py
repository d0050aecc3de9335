"""Throughput surface: mb (epochwise) vs flat across batch sizes.

One size at a time (holding every size's inputs+programs at once
RESOURCE_EXHAUSTED the 16G chip); within a size the mb/flat reps are
interleaved so that ratio is drift-free. Cross-size absolute rates
carry ~5% tunnel drift. The mb side runs the production chunked
closure (max_chunk=4096 objects, inflight=2), so B=6144/E=3 fits.

Run on the TPU: python tools/sweep_mb_batch.py [E] [nband] [reps] [pad]
"""
import gc
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as BN  # noqa: E402
from ngmix_tpu.batch import (  # noqa: E402
    MetacalConfig,
    make_metacal_pipeline_fn,
    make_metacal_pipeline_mb_fn,
)


def fetch(x):
    float(jnp.sum(jax.tree.leaves(x)[0]))


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    nband = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    pad = float(sys.argv[4]) if len(sys.argv) > 4 else 1.3
    sizes = (1024, 2048, 4096, 6144)

    jac = (BN.SCALE, 0, 0, BN.SCALE)
    conf = MetacalConfig(
        dims=BN.DIMS, psf_dims=BN.PSF_DIMS, jac=jac, fixnoise=True,
        pad_factor=pad, fit_dims=(19, 19),
    )
    band = jnp.arange(E, dtype=jnp.int32) % nband

    print("E=%d nband=%d reps=%d pad=%g" % (E, nband, reps, pad),
          flush=True)
    for B in sizes:
        key = jax.random.PRNGKey(5)
        mb_args = BN.make_sim_batch_hetero(
            key, B, jac=jac, nepoch=E,
            nband=nband if nband > 1 else None,
        )
        flat_args = tuple(
            a.reshape((B * E,) + a.shape[2:]) for a in mb_args
        )
        # the production chunked closure: one program for B <= 4096,
        # bounded-in-flight 4096-object chunks beyond (round 4's
        # single-program B=6144/E=3 row RESOURCE_EXHAUSTED 16G)
        mb = make_metacal_pipeline_mb_fn(
            conf, band, nband, measure="exp-lm"
        )
        # flat side must ALSO be the production closure: a bare jit at
        # B*E = 6144 stamps compiles the XLA wrong-code shape and runs
        # artifact-fast (~39k eps/s with the solver frozen at its
        # guess), corrupting the mb/flat ratio at that row. The
        # closure's quarantine re-splits 6144 into 2048-stamp programs.
        fl = make_metacal_pipeline_fn(conf, measure="exp-lm")
        try:
            fetch(mb(*mb_args))
            fetch(fl(*flat_args))
            tm = tf = 0.0
            for _ in range(reps):
                t0 = time.perf_counter(); fetch(mb(*mb_args))
                tm += time.perf_counter() - t0
                t0 = time.perf_counter(); fetch(fl(*flat_args))
                tf += time.perf_counter() - t0
            tm /= reps; tf /= reps
            n = B * E
            print(
                "B=%5d (%5d eps): mb %.3f s (%6.0f eps/s, %5.0f obj/s)"
                " | flat %.3f s (%6.0f eps/s) | mb/flat %.2f"
                % (B, n, tm, n / tm, B / tm, tf, n / tf, tm / tf),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - record OOMs, keep going
            print("B=%5d: FAILED (%s)" % (B, type(e).__name__),
                  flush=True)
        del mb_args, flat_args, mb, fl
        gc.collect()


if __name__ == "__main__":
    main()
