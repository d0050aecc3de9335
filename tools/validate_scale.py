"""Survey-scale shear-recovery validation on the TPU.

Runs ~100k simulated stamps through the full batched metacal + exp-LM
pipeline and reports the recovered multiplicative bias m with its
uncertainty. Run: python tools/validate_scale.py [batch] [nbatch]

Measured on TPU v5e (2026-08, post MXU-remap + LM compaction): 102400
stamps, R11 = 0.9675, m = 3.93e-4 +/- 9.7e-6 (99.7%) - the reference's
method-intrinsic residual (test_metacal_accuracy asserts
m ~ 3.4e-4 +/- 1e-4) resolved at 10x finer precision. Pure pipeline
throughput ~6600 stamps/s/chip at B=2048; ~3100 stamps/s sustained
including the host-side result fetches through the tunnel.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench as B  # noqa: E402
from ngmix_tpu.batch import MetacalConfig, make_metacal_pipeline_fn  # noqa: E402


def main(Bsz=2048, nbatch=50):
    conf = MetacalConfig(
        dims=B.DIMS, psf_dims=B.PSF_DIMS, jac=(B.SCALE, 0.0, 0.0, B.SCALE),
        fixnoise=True, pad_factor=2, fit_dims=(19, 19),
    )
    fn = make_metacal_pipeline_fn(conf, measure="exp-lm")
    sim_fn = jax.jit(lambda k: B.make_sim_batch(k, Bsz))

    key = jax.random.PRNGKey(777)
    sums = {t: 0.0 for t in ("noshear", "1p", "1m", "2p", "2m")}
    sq = 0.0
    n = {t: 0 for t in sums}
    t_total = 0.0
    for i in range(nbatch):
        key, k = jax.random.split(key)
        args = sim_fn(k)
        t0 = time.time()
        res = fn(*args)
        float(jnp.sum(res["noshear"]["e1"]))  # force execution
        t_total += time.time() - t0
        for t in sums:
            ok = np.asarray(res[t]["flags"]) == 0
            e1 = np.asarray(res[t]["e1"])[ok]
            sums[t] += e1.sum()
            n[t] += ok.sum()
            if t == "noshear":
                sq += (e1**2).sum()

    N = n["noshear"]
    mean = {t: sums[t] / n[t] for t in sums}
    R11 = (mean["1p"] - mean["1m"]) / 0.02
    sh = mean["noshear"] / R11
    se = np.sqrt(sq / N - mean["noshear"] ** 2) / np.sqrt(N) / R11
    m = sh / 0.02 - 1
    print(
        "stamps: %d  pipeline time: %.1fs -> %.0f stamps/s sustained"
        % (N, t_total, N / t_total)
    )
    print("R11=%.4f  m = %.2e +/- %.2e (99.7%%)" % (R11, m, 3 * se / 0.02))


if __name__ == "__main__":
    Bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    nbatch = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    main(Bsz, nbatch)
