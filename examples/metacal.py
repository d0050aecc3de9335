"""
Metacalibration example (the analog of the reference's
examples/metacal/metacal.py, galsim-free).

Simulates sheared exp-model galaxies with a turbulent-atmosphere psf,
runs the MetacalBootstrapper with gaussian weighted moments, and
recovers the applied shear with the standard response calibration.

Run:  python examples/metacal.py [ntrial]

Expected output (low noise): m consistent with a few 1e-4, c ~ 0.
"""
import sys

import jax

# the per-object host API dispatches many small ops; prefer CPU for
# these single-stamp examples (the batched TPU path is in bench.py
# and ngmix_tpu.batch)
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

import numpy as np

import ngmix_tpu as ngmix


def make_data(rng, noise=1.0e-5, shear=(0.02, 0.0)):
    scale = 0.263
    psf_fwhm = 0.9
    gal_hlr = 0.5

    Tpsf = float(ngmix.moments.fwhm_to_T(psf_fwhm))
    Tgal = float(ngmix.moments.r50_to_T(gal_hlr))

    gal = ngmix.GMixModel([0.0, 0.0, 0.0, 0.0, Tgal, 100.0], "exp")
    gal = gal.get_sheared(*shear)
    psf = ngmix.GMixModel([0.0, 0.0, 0.025, -0.01, Tpsf, 1.0], "turb")

    dims = (49, 49)
    psf_dims = (25, 25)
    off = rng.uniform(low=-0.5, high=0.5, size=2)
    cen = (np.array(dims) - 1.0) / 2.0
    pcen = (np.array(psf_dims) - 1.0) / 2.0
    jac = ngmix.DiagonalJacobian(row=cen[0] + off[0], col=cen[1] + off[1],
                                 scale=scale)
    pjac = ngmix.DiagonalJacobian(row=pcen[0], col=pcen[1], scale=scale)

    img = gal.convolve(psf).make_image(dims, jacobian=jac, fast_exp=False)
    img += rng.normal(scale=noise, size=img.shape)
    pimg = psf.make_image(psf_dims, jacobian=pjac, fast_exp=False)

    obs = ngmix.Observation(
        img,
        weight=np.full(dims, 1.0 / noise**2),
        jacobian=jac,
        psf=ngmix.Observation(pimg, jacobian=pjac),
    )
    return obs


def main(ntrial=100):
    rng = np.random.RandomState(31415)
    shear_true = (0.02, 0.0)

    psf_runner = ngmix.PSFRunner(
        fitter=ngmix.Fitter(model="gauss"),
        guesser=ngmix.guessers.SimplePSFGuesser(rng=rng, guess_from_moms=True),
        ntry=3,
    )
    runner = ngmix.Runner(fitter=ngmix.GaussMom(fwhm=1.2))
    boot = ngmix.MetacalBootstrapper(
        runner=runner, psf_runner=psf_runner, rng=rng, psf="gauss",
        types=["noshear", "1p", "1m"],
    )

    e1 = {k: [] for k in ("noshear", "1p", "1m")}
    s2n = []
    for i in range(ntrial):
        obs = make_data(rng, shear=shear_true)
        resdict, _ = boot.go(obs)
        if any(int(resdict[k]["flags"]) != 0 for k in e1):
            continue
        for k in e1:
            e1[k].append(float(resdict[k]["e1"]))
        s2n.append(float(resdict["noshear"]["s2n"]))

    R11 = (np.mean(e1["1p"]) - np.mean(e1["1m"])) / 0.02
    sh = np.mean(e1["noshear"]) / R11
    sh_err = np.std(e1["noshear"]) / np.sqrt(len(e1["noshear"])) / R11
    m = sh / shear_true[0] - 1
    m_err = 3 * sh_err / shear_true[0]

    print("S/N: %g" % np.mean(s2n))
    print("R11: %g" % R11)
    print("m: %g +/- %g (99.7%% conf)" % (m, m_err))


if __name__ == "__main__":
    ntrial = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    main(ntrial)
