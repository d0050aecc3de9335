"""Same-session A/B of the NGMIX_CASCADE34 idea (CLAUDE.md pending):
prepend a 3B/4 level to the auto straggler-compaction cascade.

The env var is read at TRACE time (batch._auto_cascade), so tracing
variant A with it unset and variant B with it set in one process gives
two compiled programs over identical data; interleaved reps cancel
tunnel drift. Results are bitwise-identical by construction (compaction
never changes per-lane updates), so only the wall clock matters.

Run on the TPU: python tools/ab_cascade.py [B] [reps]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as BN  # noqa: E402
from ngmix_tpu.batch import MetacalConfig, make_metacal_pipeline_fn  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    key = jax.random.PRNGKey(314)
    args = jax.block_until_ready(BN.make_sim_batch(key, B))
    conf = MetacalConfig(
        dims=BN.DIMS, psf_dims=BN.PSF_DIMS,
        jac=(BN.SCALE, 0.0, 0.0, BN.SCALE),
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
    )

    os.environ["NGMIX_CASCADE34"] = "0"
    fn_a = make_metacal_pipeline_fn(conf, measure="exp-lm")

    def run(fn):
        res = fn(*args)
        float(jnp.sum(res["noshear"]["pars"]))

    run(fn_a)  # compile A

    os.environ["NGMIX_CASCADE34"] = "1"
    fn_b = make_metacal_pipeline_fn(conf, measure="exp-lm")
    run(fn_b)  # compile B
    os.environ["NGMIX_CASCADE34"] = "0"

    ta = tb = 0.0
    for i in range(reps):
        t0 = time.perf_counter()
        run(fn_a)
        ta += time.perf_counter() - t0
        t0 = time.perf_counter()
        run(fn_b)
        tb += time.perf_counter() - t0
        print(
            "rep %d: A(default) %.3f s cum | B(3B/4 head) %.3f s cum"
            % (i, ta, tb), flush=True,
        )
    print(
        "A(default): %.3f s/rep (%.0f stamps/s) | "
        "B(+3B/4): %.3f s/rep (%.0f stamps/s) | B/A = %.3f"
        % (ta / reps, B / (ta / reps), tb / reps, B / (tb / reps),
           (tb / reps) / (ta / reps))
    )


if __name__ == "__main__":
    main()
