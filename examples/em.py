"""Expectation-maximization fitting examples (the analogs of the
reference's examples/em/em_1gauss.py, em_2gauss.py, em_2gauss_psf.py).

EM fits a gaussian mixture directly to an image: one gaussian, a
two-gaussian mixture, and a two-gaussian mixture with the psf handled
by subtracting its moments from each component.

Run:  python examples/em.py
"""
import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

import numpy as np

import ngmix_tpu as ngmix
from ngmix_tpu.em import run_em

SCALE = 0.263


def make_obs(rng, gmix, noise=1.0e-4, dims=(32, 32), psf_gmix=None):
    jac = ngmix.DiagonalJacobian(
        row=(dims[0] - 1) / 2, col=(dims[1] - 1) / 2, scale=SCALE
    )
    render = gmix if psf_gmix is None else gmix.convolve(psf_gmix)
    img = render.make_image(dims, jacobian=jac)
    img = img + rng.normal(scale=noise, size=dims)
    psf_obs = None
    if psf_gmix is not None:
        pimg = psf_gmix.make_image(dims, jacobian=jac)
        psf_obs = ngmix.Observation(pimg, jacobian=jac)
        psf_obs.set_gmix(psf_gmix)
    return ngmix.Observation(
        img, weight=np.full(dims, 1 / noise**2), jacobian=jac, psf=psf_obs
    )


def perturb(rng, gm, frac=0.1):
    """randomized starting mixture near the truth"""
    data = gm.get_full_pars().reshape(-1, 6).copy()
    data[:, 0] *= 1 + rng.uniform(-frac, frac, data.shape[0])
    data[:, 1:3] += rng.uniform(-0.5 * SCALE, 0.5 * SCALE, (data.shape[0], 2))
    data[:, 3:] *= 1 + rng.uniform(-frac, frac, (data.shape[0], 3))
    return ngmix.GMix(pars=data.reshape(-1))


def em_1gauss(rng):
    gm = ngmix.GMixModel([0.0, 0.0, 0.05, -0.03, 0.6, 100.0], "gauss")
    obs = make_obs(rng, gm)
    res = run_em(obs, perturb(rng, gm))
    gfit = res.get_gmix()
    print("em 1 gauss: flags=%d numiter=%d" % (res["flags"], res["numiter"]))
    g1, g2, T = gfit.get_g1g2T()
    print("  true g1,g2,T = 0.050 -0.030 0.600")
    print("  fit  g1,g2,T = %.3f %.3f %.3f" % (g1, g2, T))


def em_2gauss(rng):
    pars = np.zeros(12)
    pars[0:6] = [60.0, 0.0, 0.0, 0.2, 0.0, 0.2]  # (p, row, col, irr, irc, icc)
    pars[6:12] = [40.0, 0.3, 0.3, 0.5, 0.05, 0.5]
    gm = ngmix.GMix(pars=pars)
    obs = make_obs(rng, gm)
    res = run_em(obs, perturb(rng, gm))
    print("em 2 gauss: flags=%d numiter=%d fdiff=%.2e" % (
        res["flags"], res["numiter"], res["fdiff"]))
    pfit = res.get_gmix().get_full_pars().reshape(2, 6)
    order = np.argsort(-pfit[:, 0])
    print("  fit p = %.1f %.1f (true 60, 40)" % tuple(pfit[order, 0]))


def em_2gauss_psf(rng):
    pars = np.zeros(12)
    pars[0:6] = [60.0, 0.0, 0.0, 0.2, 0.0, 0.2]
    pars[6:12] = [40.0, 0.3, 0.3, 0.5, 0.05, 0.5]
    gm = ngmix.GMix(pars=pars)
    psf = ngmix.GMixModel([0.0, 0.0, 0.0, 0.0, 0.18, 1.0], "gauss")
    obs = make_obs(rng, gm, psf_gmix=psf)
    res = run_em(obs, perturb(rng, gm))
    print("em 2 gauss + psf: flags=%d numiter=%d" % (
        res["flags"], res["numiter"]))
    # the fit is PRE-psf: compare to the true (unconvolved) mixture
    pfit = res.get_gmix().get_full_pars().reshape(2, 6)
    order = np.argsort(-pfit[:, 0])
    print("  pre-psf fit p = %.1f %.1f (true 60, 40)" % tuple(pfit[order, 0]))


def main():
    rng = np.random.RandomState(8)
    em_1gauss(rng)
    em_2gauss(rng)
    em_2gauss_psf(rng)


if __name__ == "__main__":
    main()
