"""A/B: headline default (B=10240, one program) vs B=12288 chunked as
2x6144. HISTORICAL - round 5 root-caused the 6144 shape's apparent
39k-vs-31k win as XLA TPU wrong code (the LM froze at its guess; see
fitting/lm.py). Kept only as the reproduction recipe for that bug;
do NOT use its numbers to tune defaults.

Run on the TPU: python tools/ab_headline_6144.py [reps]
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
)


def fetch(x):
    float(jnp.sum(jax.tree.leaves(x)[0]))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    conf = MetacalConfig(
        dims=BN.DIMS, psf_dims=BN.PSF_DIMS,
        jac=(BN.SCALE, 0.0, 0.0, BN.SCALE),
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
    )
    cases = [
        ("A 10240/10240", 10240, 10240),
        ("B 12288/6144 ", 12288, 6144),
        ("C 18432/6144 ", 18432, 6144),
    ]
    print("reps=%d" % reps, flush=True)
    for name, B, chunk in cases:
        args = jax.block_until_ready(
            BN.make_sim_batch(jax.random.PRNGKey(314), B)
        )
        fn = make_metacal_pipeline_fn(
            conf, measure="exp-lm", max_chunk=chunk
        )
        fetch(fn(*args))
        t = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(fn(*args))
            t += time.perf_counter() - t0
        t /= reps
        print("%s: %.3f s  (%6.0f stamps/s)" % (name, t, B / t),
              flush=True)
        del args, fn
        gc.collect()


if __name__ == "__main__":
    main()
