"""Survey-scale shear-recovery validation on the TPU.

Runs the full batched metacal + exp-LM pipeline over many simulated
batches and reports the recovered multiplicative bias m with its
uncertainty. Calibration statistics (per-type e1 sums, counts, e1^2)
accumulate ON DEVICE - only O(1) scalars cross the tunnel at the end,
the same pattern the sharded pipeline psums across chips.

Run: python tools/validate_scale.py [batch] [nbatch] [measure]

Measured on TPU v5e (2026-08, post small-linalg cholesky, pad 1.3),
sustained rates INCLUDE the on-device simulation (overlapped through
async dispatch). All estimators land at the reference's
method-intrinsic residual (test_metacal_accuracy asserts
m ~ 3.4e-4 +/- 1e-4), resolved 15-25x finer:

  exp-lm    1,044,480 stamps  28.8k/s  m = 3.95e-4 +/- 3.7e-6 (99.7%)
  admom       522,240 stamps  63.6k/s  m = 4.48e-4 +/- 5.1e-6
  gauss-lm    215,040 stamps  38.2k/s  m = 3.32e-4 +/- 6.8e-6
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as B  # noqa: E402
from ngmix_tpu.batch import (  # noqa: E402
    MetacalConfig,
    metacal_pipeline,
)

TYPES = ("noshear", "1p", "1m", "2p", "2m")


def main(Bsz=2048, nbatch=50, measure="exp-lm"):
    conf = MetacalConfig(
        dims=B.DIMS, psf_dims=B.PSF_DIMS, jac=(B.SCALE, 0.0, 0.0, B.SCALE),
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
    )  # the bench headline config (pad 1.3 validated m-neutral)

    @jax.jit
    def step(key, acc):
        """simulate one batch, run the pipeline, fold the calibration
        sums into the device accumulator"""
        args = B.make_sim_batch(key, Bsz)
        res = metacal_pipeline(*args, conf, measure=measure)
        for i, t in enumerate(TYPES):
            ok = res[t]["flags"] == 0
            e1 = jnp.where(ok, res[t]["e1"], 0.0)
            acc = acc.at[i, 0].add(jnp.sum(e1))
            acc = acc.at[i, 1].add(jnp.sum(ok))
            acc = acc.at[i, 2].add(jnp.sum(e1 * e1))
        return acc

    key = jax.random.PRNGKey(777)
    # f32 on device (x64 is off in the pipeline); XLA's pairwise-tree
    # reductions keep the accumulation error ~eps*log(n) - validated
    # identical (to 1e-8 in m) against an f64 host-side accumulation
    acc = jnp.zeros((len(TYPES), 3))

    # compile
    key, k = jax.random.split(key)
    acc = step(k, acc)
    float(acc[0, 0])
    t0 = time.time()
    for i in range(nbatch - 1):
        key, k = jax.random.split(key)
        acc = step(k, acc)
    a = jax.device_get(acc)  # the ONLY bulk fetch: [5, 3] scalars
    t_total = time.time() - t0

    mean = {t: a[i, 0] / a[i, 1] for i, t in enumerate(TYPES)}
    N = a[0, 1]
    R11 = (mean["1p"] - mean["1m"]) / 0.02
    sh = mean["noshear"] / R11
    var = a[0, 2] / N - mean["noshear"] ** 2
    se = (var / N) ** 0.5 / R11
    m = sh / 0.02 - 1
    n_total = int(sum(a[i, 1] for i in range(len(TYPES))) / len(TYPES))
    print(
        "stamps: %d  steady-state: %.1fs for %d -> %.0f stamps/s sustained"
        % (n_total, t_total, (nbatch - 1) * Bsz, (nbatch - 1) * Bsz / t_total)
    )
    print("R11=%.4f  m = %.2e +/- %.2e (99.7%%)" % (R11, m, 3 * se / 0.02))


if __name__ == "__main__":
    Bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    nbatch = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    measure = sys.argv[3] if len(sys.argv) > 3 else "exp-lm"
    main(Bsz, nbatch, measure)
