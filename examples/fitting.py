"""
Maximum-likelihood fitting example (analog of the reference's
examples/fitting/fitting.py): exp-model LM fit with psf bootstrap.

Run: python examples/fitting.py
"""
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


def main():
    rng = np.random.RandomState(2)
    scale = 0.263
    noise = 0.01

    gal = ngmix.GMixModel([0.0, 0.0, 0.05, -0.02, 2.0, 100.0], "exp")
    psf = ngmix.GMixModel([0.0, 0.0, 0.025, 0.0, 0.27, 1.0], "turb")

    dims = (49, 49)
    cen = (np.array(dims) - 1.0) / 2.0
    jac = ngmix.DiagonalJacobian(row=cen[0], col=cen[1], scale=scale)
    pjac = ngmix.DiagonalJacobian(row=12, col=12, scale=scale)

    img = gal.convolve(psf).make_image(dims, jacobian=jac, fast_exp=True)
    img += rng.normal(scale=noise, size=img.shape)
    pimg = psf.make_image((25, 25), jacobian=pjac, fast_exp=False)
    obs = ngmix.Observation(
        img, weight=np.full(dims, 1 / noise**2), jacobian=jac,
        psf=ngmix.Observation(pimg, jacobian=pjac),
    )

    # the turb psf is a 3-gaussian profile: fit it with 3
    # coelliptical gaussians so the deconvolution is unbiased
    psf_runner = ngmix.PSFRunner(
        fitter=ngmix.CoellipFitter(ngauss=3),
        guesser=ngmix.guessers.CoellipPSFGuesser(
            rng=rng, ngauss=3, guess_from_moms=True
        ),
        ntry=3,
    )
    runner = ngmix.Runner(
        fitter=ngmix.Fitter(model="exp"),
        guesser=ngmix.guessers.TFluxGuesser(rng=rng, T=1.5, flux=80.0),
        ntry=3,
    )
    boot = ngmix.Bootstrapper(runner=runner, psf_runner=psf_runner)
    res = boot.go(obs)

    print("flags:", res["flags"], " nfev:", res["nfev"])
    print("s2n:", res["s2n"], " chi2per:", res["chi2per"])
    ngmix.print_pars(res["pars"], front="pars: ")
    ngmix.print_pars(res["pars_err"], front="errs: ")
    print("true: [0, 0, 0.05, -0.02, 2.0, 100.0]")


if __name__ == "__main__":
    main()
