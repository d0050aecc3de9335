"""Same-session A/B of LMConf.flux_col: compute the LM flux jacobian
column analytically (the model is exactly linear in flux, so dr/dF is
the unit-flux weighted model) instead of as a 6th forward tangent.

Interleaved reps over identical data cancel tunnel drift. The solve is
the same math to reassociation roundoff (CPU x64: flags/nfev
bit-identical, pars to 1.4e-14 — tests/test_batch_pipeline.py::
test_flux_col_matches_ad_jacobian), but this script also checks m and
pars agreement of the two compiled TPU programs so a wrong-code
surprise at the headline shape cannot hide behind a fast wall clock.

Run on the TPU: python tools/ab_fluxcol.py [B] [reps] [variant]
variant: 'fluxcol' (default) or 'varpro' (variable projection: flux
solved exactly per eval; CPU showed nfev 5.42 -> 5.31 only, so its
gain must come from the cheaper per-iteration eval minus the
full-width epilogue eval).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench as BN  # noqa: E402
from ngmix_tpu.batch import (  # noqa: E402
    MetacalConfig, make_metacal_pipeline_fn, shear_response,
)
from ngmix_tpu.fitting.lm import LMConf  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    variant = sys.argv[3] if len(sys.argv) > 3 else "fluxcol"
    conf_b = (
        LMConf(flux_col=True) if variant == "fluxcol"
        else LMConf(varpro=True)
    )

    key = jax.random.PRNGKey(314)
    args = jax.block_until_ready(BN.make_sim_batch(key, B))
    conf = MetacalConfig(
        dims=BN.DIMS, psf_dims=BN.PSF_DIMS,
        jac=(BN.SCALE, 0.0, 0.0, BN.SCALE),
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
    )
    fn_a = make_metacal_pipeline_fn(conf, measure="exp-lm")
    fn_b = make_metacal_pipeline_fn(conf, measure="exp-lm", lm_conf=conf_b)

    def run(fn):
        res = fn(*args)
        float(jnp.sum(res["noshear"]["pars"]))
        return res

    res_a = run(fn_a)  # compile A
    res_b = run(fn_b)  # compile B

    # correctness first: the two programs must agree per lane
    for t in ("noshear", "1p", "1m"):
        fa = np.asarray(res_a[t]["flags"])
        fb = np.asarray(res_b[t]["flags"])
        pa = np.asarray(res_a[t]["pars"])
        pb = np.asarray(res_b[t]["pars"])
        nbad = int(np.sum(fa != fb))
        ok = (fa == 0) & (fb == 0)
        dp = float(np.max(np.abs(pa[ok] - pb[ok]) / (1 + np.abs(pa[ok]))))
        print(f"{t}: flag mismatches {nbad}, max rel |dpars| {dp:.2e}",
              flush=True)
        assert nbad == 0 and dp < 1e-3, "flux_col program disagrees"
    for res, lbl in ((res_a, "A"), (res_b, "B")):
        sr = shear_response(res)
        m = float(sr["shear"][0]) / 0.02 - 1
        print(f"{lbl}: m = {m:.3e}", flush=True)
        assert abs(m) < 1.5e-3, (lbl, m)

    ta = tb = 0.0
    for i in range(reps):
        t0 = time.perf_counter()
        run(fn_a)
        ta += time.perf_counter() - t0
        t0 = time.perf_counter()
        run(fn_b)
        tb += time.perf_counter() - t0
        print(
            "rep %d: A(AD col) %.3f s cum | B(flux_col) %.3f s cum"
            % (i, ta, tb), flush=True,
        )
    print(
        "A(AD col): %.3f s/rep (%.0f stamps/s) | "
        "B(flux_col): %.3f s/rep (%.0f stamps/s) | B/A = %.3f"
        % (ta / reps, B / (ta / reps), tb / reps, B / (tb / reps),
           (tb / reps) / (ta / reps))
    )


if __name__ == "__main__":
    main()
