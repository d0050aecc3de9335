"""Generate the golden regression file (tests/data/goldens.npz).

The reference cannot execute in this environment (no numba/galsim), so
these goldens anchor OUR validated implementation (oracle-checked in
the unit suites and via metacal shear recovery) against future
regressions, in the spirit of the reference's mdet golden-catalog
harness (mdet_tests/test_mdet_regression.py).

Run:  python tests/make_goldens.py
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))


def compute_goldens():
    import ngmix_tpu as ngmix
    from _sims import get_model_obs

    rng = np.random.RandomState(8675309)
    out = {}

    data = get_model_obs(
        rng=rng, model="exp", T=2.0, g1=0.05, g2=-0.02, flux=100.0,
        noise=0.01, dims=(49, 49),
    )
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])

    # exp LM fit
    res = ngmix.Fitter(model="exp").go(obs, data["pars"] * 1.02)
    out["lm_pars"] = res["pars"]
    out["lm_err"] = res["pars_err"]

    # admom
    ares = ngmix.run_admom(obs, guess=2.0, rng=np.random.RandomState(3))
    out["admom_pars"] = np.asarray(ares["pars"])
    out["admom_T"] = ares["T"]

    # gaussmom
    gres = ngmix.GaussMom(fwhm=1.2).go(obs)
    out["gaussmom"] = np.array(
        [float(gres["e1"]), float(gres["e2"]), float(gres["T"]),
         float(gres["flux"])]
    )

    # EM on a 2-gaussian image
    em_pars1 = np.array([50.0, -0.6, -0.4, 0.6, 0.02, 0.5])
    em_pars2 = np.array([70.0, 0.5, 0.3, 1.2, -0.05, 1.0])
    gm = ngmix.GMix(pars=np.concatenate([em_pars1, em_pars2]))
    jac = ngmix.DiagonalJacobian(row=15.5, col=15.5, scale=0.263)
    im = gm.make_image((32, 32), jacobian=jac, fast_exp=True)
    emobs = ngmix.Observation(im, jacobian=jac)
    emres = ngmix.run_em(obs=emobs, guess=ngmix.GMix(
        pars=np.concatenate([em_pars1 * 1.05, em_pars2 * 0.95])))
    out["em_pars"] = emres.get_gmix().get_full_pars()

    # pgauss pre-psf moments
    pres = ngmix.PGaussMom(fwhm=2.0).go(obs)
    out["pgauss"] = np.array(
        [float(pres["e1"]), float(pres["e2"]), float(pres["T"]),
         float(pres["flux"]), float(pres["flux_err"])]
    )

    # metacal image set statistics
    from ngmix_tpu.metacal import MetacalGaussPSF

    m = MetacalGaussPSF(obs=obs, rng=np.random.RandomState(5))
    odict = m.get_all()
    for t in ("noshear", "1p", "2m"):
        im = odict[t].image
        out["mcal_%s_stats" % t] = np.array(
            [im.sum(), im.max(), im[24, 24], im[20, 28]]
        )
    gres_1p = ngmix.GaussMom(fwhm=1.2).go(odict["1p"])
    out["mcal_1p_e"] = np.array(
        [float(gres_1p["e1"]), float(gres_1p["e2"])]
    )

    return out


def main():
    out = compute_goldens()
    path = os.path.join(os.path.dirname(__file__), "data", "goldens.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **out)
    print("wrote", path)
    for k, v in out.items():
        print(" ", k, np.asarray(v).ravel()[:4])


if __name__ == "__main__":
    main()
