"""Same-session A/B of chunked-pipeline configs at B=20480 within 16G.

Round 5: inflight=2 with 10240-stamp chunks RESOURCE_EXHAUSTED at
B=20480 (two in-flight programs' working sets + the full sim batch).
This times the candidates that bound the working set:
  A: max_chunk=10240, inflight=1   (serialized validated-shape chunks)
  B: max_chunk=2048,  inflight=2   (small validated-shape chunks)
  C: single B=10240 program        (the round-4 green headline)
and prints per-config stamps/s plus the m gate for whichever ran.

Run on the TPU: python tools/ab_chunk_r5.py [reps]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as BN  # noqa: E402
from ngmix_tpu.batch import (  # noqa: E402
    MetacalConfig,
    make_metacal_pipeline_fn,
    shear_response,
)


def fetch(res):
    float(jnp.sum(res["noshear"]["pars"]))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    conf = MetacalConfig(
        dims=BN.DIMS, psf_dims=BN.PSF_DIMS,
        jac=(BN.SCALE, 0.0, 0.0, BN.SCALE),
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
    )
    B = 20480
    args = jax.block_until_ready(
        BN.make_sim_batch(jax.random.PRNGKey(314), B)
    )
    cfgs = [
        ("A 10240x2 inflight=1", dict(max_chunk=10240, inflight=1), B),
        ("B 2048x10 inflight=2", dict(max_chunk=2048, inflight=2), B),
        ("C single 10240", dict(max_chunk=None), 10240),
    ]
    for label, kw, Bc in cfgs:
        try:
            fn = make_metacal_pipeline_fn(conf, measure="exp-lm", **kw)
            a = args if Bc == B else tuple(x[:Bc] for x in args)
            res = fn(*a)
            fetch(res)  # compile + run
            t0 = time.time()
            for _ in range(reps):
                res = fn(*a)
                fetch(res)
            per = (time.time() - t0) / reps
            sr = shear_response(res)
            m = float(sr["shear"][0]) / BN.SHEAR_TRUE - 1.0
            print(
                f"{label}: {per:.3f} s  ({Bc / per:8.0f} stamps/s)  "
                f"m={m:.3e}", flush=True,
            )
            del res
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
