"""Same-session A/B: fused global-jacfwd mb objective vs the
per-epoch-jacobian objective (batch._mb_epochwise_normal_fn).

The objective is a trace-time keyword, so tracing each variant in
one process gives two programs over identical data; interleaved reps
cancel tunnel drift. Also times the flat pipeline on the folded
epochs as the per-epoch-stamp ceiling.

Run on the TPU: python tools/ab_mb_objective.py [B] [E] [nband] [reps]
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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    nband = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    jac = (BN.SCALE, 0, 0, BN.SCALE)
    conf = MetacalConfig(
        dims=BN.DIMS, psf_dims=BN.PSF_DIMS, jac=jac, fixnoise=True,
        pad_factor=1.3, fit_dims=(19, 19),
    )
    key = jax.random.PRNGKey(5)
    mb_args = BN.make_sim_batch_hetero(
        key, B, jac=jac, nepoch=E, nband=nband if nband > 1 else None
    )
    # epoch->band map matches the sim's construction (arange % nband)
    band = jnp.arange(E, dtype=jnp.int32) % nband
    flat_args = tuple(
        a.reshape((B * E,) + a.shape[2:]) for a in mb_args
    )

    def fetch(x):
        float(jnp.sum(jax.tree.leaves(x)[0]))

    flat = jax.jit(lambda *a: metacal_pipeline(*a, conf, measure="exp-lm"))

    mb_a = jax.jit(
        lambda *a: metacal_pipeline_mb(
            *a, band, nband, conf, measure="exp-lm", objective="fused"
        )
    )
    fetch(mb_a(*mb_args))
    mb_b = jax.jit(
        lambda *a: metacal_pipeline_mb(
            *a, band, nband, conf, measure="exp-lm", objective="epoch"
        )
    )
    fetch(mb_b(*mb_args))
    fetch(flat(*flat_args))

    ta = tb = tf = 0.0
    for i in range(reps):
        t0 = time.perf_counter(); fetch(mb_a(*mb_args)); ta += time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(mb_b(*mb_args)); tb += time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(flat(*flat_args)); tf += time.perf_counter() - t0
        print("rep %d done" % i, flush=True)
    n_es = B * E
    print("B=%d E=%d nband=%d reps=%d" % (B, E, nband, reps))
    print("fused : %.3f s (%.0f epoch-stamps/s)" % (ta / reps, n_es / (ta / reps)))
    print("epoch : %.3f s (%.0f epoch-stamps/s)" % (tb / reps, n_es / (tb / reps)))
    print("flat  : %.3f s (%.0f epoch-stamps/s)" % (tf / reps, n_es / (tf / reps)))
    print("epoch/fused = %.3f | epoch/flat = %.2f | fused/flat = %.2f"
          % (tb / ta, tb / tf, ta / tf))


if __name__ == "__main__":
    main()
