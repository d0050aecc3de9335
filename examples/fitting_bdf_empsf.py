"""Bulge+disk (bdf) fit with an EM-fit psf through the bootstrapper
(the analog of the reference's examples/fitting/fitting_bd_empsf.py,
galsim-free).

The psf is fit with 5-gaussian EM; the object is fit to the bdf model
(bulge+disk with shared shape/size and a fracdev parameter) with a
separable prior, guessed from the psf flux. The full Runner/PSFRunner
bootstrap machinery is used, as one would for a production pass over
many objects.

Run:  python examples/fitting_bdf_empsf.py [ntrial]
"""
import sys

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

import numpy as np

import ngmix_tpu as ngmix

SCALE = 0.263


def get_prior(rng):
    from ngmix_tpu.joint_prior import PriorBDFSep
    from ngmix_tpu.priors import CenPrior, GPriorBA, LogNormal, TwoSidedErf

    return PriorBDFSep(
        cen_prior=CenPrior(0.0, 0.0, SCALE, SCALE, rng=rng),
        g_prior=GPriorBA(sigma=0.3, rng=rng),
        T_prior=TwoSidedErf(-1.0, 0.1, 1.0e3, 1.0, rng=rng),
        fracdev_prior=LogNormal(0.5, 0.1, rng=rng),
        F_prior=TwoSidedErf(-100.0, 0.1, 1.0e9, 1.0, rng=rng),
    )


def make_data(rng, noise=0.01):
    """bdf object: exp disk + dev bulge with fracdev=0.5"""
    true_pars = [0.0, 0.0, 0.05, -0.02, 0.4, 0.5, 100.0]
    gal = ngmix.make_gmix_model(true_pars, "bdf")
    psf = ngmix.GMixModel([0.0, 0.0, 0.025, -0.01, 0.3, 1.0], "turb")

    dims = (49, 49)
    pdims = (25, 25)
    jac = ngmix.DiagonalJacobian(
        row=(dims[0] - 1) / 2 + rng.uniform(-0.5, 0.5),
        col=(dims[1] - 1) / 2 + rng.uniform(-0.5, 0.5), scale=SCALE,
    )
    pjac = ngmix.DiagonalJacobian(
        row=(pdims[0] - 1) / 2, col=(pdims[1] - 1) / 2, scale=SCALE
    )
    img = gal.convolve(psf).make_image(dims, jacobian=jac)
    img = img + rng.normal(scale=noise, size=dims)
    pimg = psf.make_image(pdims, jacobian=pjac)
    pimg = pimg + rng.normal(scale=1e-4, size=pdims)

    psf_obs = ngmix.Observation(pimg, jacobian=pjac)
    obs = ngmix.Observation(
        img, weight=np.full(dims, 1 / noise**2), jacobian=jac, psf=psf_obs
    )
    return obs, np.array(true_pars)


def main(ntrial=10):
    rng = np.random.RandomState(230)

    prior = get_prior(rng)
    fitter = ngmix.Fitter(model="bdf", prior=prior)
    guesser = ngmix.guessers.TPSFFluxAndPriorGuesser(
        rng=rng, T=0.25, prior=prior
    )
    psf_fitter = ngmix.em.EMFitter(maxiter=2000)
    psf_guesser = ngmix.guessers.GMixPSFGuesser(rng=rng, ngauss=5)
    psf_runner = ngmix.runners.PSFRunner(
        fitter=psf_fitter, guesser=psf_guesser, ntry=2
    )
    runner = ngmix.runners.Runner(
        fitter=fitter, guesser=guesser, ntry=2
    )
    boot = ngmix.bootstrap.Bootstrapper(
        runner=runner, psf_runner=psf_runner
    )

    g1s, g2s, fluxes = [], [], []
    for _ in range(ntrial):
        obs, true_pars = make_data(rng)
        res = boot.go(obs)
        if res["flags"] != 0:
            continue
        g1s.append(res["pars"][2])
        g2s.append(res["pars"][3])
        fluxes.append(res["pars"][6])

    print("kept %d/%d" % (len(g1s), ntrial))
    print("S/N: %.1f" % res["s2n"])
    print("true flux: %.1f  meas flux: %.2f +/- %.2f" % (
        true_pars[6], np.mean(fluxes), np.std(fluxes)))
    print("true g1: %.3f  meas g1: %.4f +/- %.4f" % (
        true_pars[2], np.mean(g1s), np.std(g1s)))
    print("true g2: %.3f  meas g2: %.4f +/- %.4f" % (
        true_pars[3], np.mean(g2s), np.std(g2s)))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
