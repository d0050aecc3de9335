"""Headline-config throughput vs batch size, one process, interleaved
reps (same-session comparability; tunnel drift cancels). Informs
bench.py's default B / the pipeline max_chunk.

WARNING (round 5): throughput alone is NOT sufficient to pick a
shape. The B=6144 "sweet spot" this sweep found in round 4 was an XLA
TPU wrong-code artifact - the LM froze at its guess, so the program
was fast because it wasn't fitting (see fitting/lm.py's wrong-code
history). Any candidate shape from this sweep must pass a full
`python bench.py <B>` gate run before it ships.

Run on the TPU: python tools/sweep_headline_chunk.py [reps]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as BN  # noqa: E402
from ngmix_tpu.batch import MetacalConfig, metacal_pipeline  # noqa: E402


def fetch(x):
    float(jnp.sum(jax.tree.leaves(x)[0]))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sizes = (6144, 8192, 10240, 12288)

    conf = MetacalConfig(
        dims=BN.DIMS, psf_dims=BN.PSF_DIMS,
        jac=(BN.SCALE, 0.0, 0.0, BN.SCALE),
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
    )
    fn = jax.jit(lambda *a: metacal_pipeline(*a, conf, measure="exp-lm"))

    # one size resident at a time (holding all sizes' inputs at once
    # can RESOURCE_EXHAUSTED the 16G chip); absolute rates carry ~5%
    # tunnel drift between sizes
    import gc

    print("reps=%d" % reps)
    for B in sizes:
        args = jax.block_until_ready(
            BN.make_sim_batch(jax.random.PRNGKey(314), B)
        )
        fetch(fn(*args))
        t_acc = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(fn(*args))
            t_acc += time.perf_counter() - t0
        t = t_acc / reps
        print("B=%5d: %.3f s  (%6.0f stamps/s)" % (B, t, B / t),
              flush=True)
        del args
        gc.collect()


if __name__ == "__main__":
    main()
