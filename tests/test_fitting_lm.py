import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngmix_tpu import Fitter, GMixModel, PSFFluxFitter
from ngmix_tpu.fitting.lm import LMConf, e2i, i2e, i2e_grad, run_lm

from _sims import get_model_obs


def test_bounds_transforms_roundtrip():
    lo = jnp.array([-1.0, 0.5, -jnp.inf, -jnp.inf])
    hi = jnp.array([1.0, jnp.inf, 2.0, jnp.inf])
    x = jnp.array([0.3, 1.7, -0.5, 3.2])
    y = e2i(x, lo, hi)
    xb = i2e(y, lo, hi)
    assert np.allclose(np.asarray(xb), np.asarray(x), atol=1e-12)

    # values always inside bounds for any internal y
    for yv in [-10.0, -1.0, 0.0, 1.0, 10.0]:
        xe = np.asarray(i2e(jnp.full(4, yv), lo, hi))
        assert xe[0] >= -1.0 and xe[0] <= 1.0
        assert xe[1] >= 0.5
        assert xe[2] <= 2.0

    # gradient matches AD
    g = np.asarray(i2e_grad(y, lo, hi))
    gad = np.diag(np.asarray(jax.jacfwd(lambda yy: i2e(yy, lo, hi))(y)))
    assert np.allclose(g, gad, atol=1e-12)


def test_lm_linear_problem():
    """LM solves a linear least squares exactly"""
    rng = np.random.RandomState(44)
    A = jnp.asarray(rng.normal(size=(20, 3)))
    x_true = jnp.asarray([1.0, -2.0, 0.5])
    sigma = 0.01
    y = A @ x_true + jnp.asarray(rng.normal(size=20)) * sigma

    def resid(pars, data):
        return (data["A"] @ pars - data["y"]) / sigma

    data = {"A": A, "y": y}
    out = run_lm(
        resid, data, jnp.zeros(3), jnp.full(3, -jnp.inf), jnp.full(3, jnp.inf),
        LMConf(),
    )
    assert int(out["flags"]) == 0
    # exact normal-equations solution
    xhat = np.linalg.lstsq(np.asarray(A), np.asarray(y), rcond=None)[0]
    assert np.allclose(np.asarray(out["pars"]), xhat, atol=1e-8)
    # errors ~ sigma * sqrt(diag((A^T A)^-1)), scaled by chi2/dof ~ 1
    cov = sigma**2 * np.linalg.inv(np.asarray(A).T @ np.asarray(A))
    assert np.allclose(
        np.asarray(out["pars_err"]), np.sqrt(np.diag(cov)), rtol=0.5
    )


def test_lm_rosenbrock_bounded():
    """bounded nonlinear problem: solution pinned at a bound"""

    def resid(pars, data):
        a, b = pars
        return jnp.array([10.0 * (b - a * a), 1.0 - a])

    lo = jnp.array([-jnp.inf, -jnp.inf])
    hi = jnp.array([jnp.inf, 0.5])  # cap b at 0.5, so best a ~ sqrt(0.5)
    out = run_lm(resid, {}, jnp.array([-1.0, 0.0]), lo, hi, LMConf(maxfev=500))
    pars = np.asarray(out["pars"])
    assert pars[1] <= 0.5 + 1e-10
    assert np.allclose(pars[1], 0.5, atol=1e-4)


def test_lm_wide_bounds_f32():
    """two-sided bounds spanning many decades must stay solvable in
    f32: the reference's sin transform quantizes a parameter ~1e-7 of
    the way across its span into ~10%-of-value steps (flux ~1e2 inside
    [1e-3, 1e9]), stranding fits at lambda_max. The logistic transform
    keeps near-constant relative resolution; this locks that in."""
    rng = np.random.RandomState(46)
    A = jnp.asarray(rng.normal(size=(40, 2)), jnp.float32)
    x_true = jnp.asarray([120.0, 0.4], jnp.float32)
    sigma = 0.05
    y = A @ x_true + jnp.asarray(rng.normal(size=40), jnp.float32) * sigma

    def resid(pars, data):
        return (data["A"] @ pars - data["y"]) / sigma

    lo = jnp.asarray([1.0e-3, 1.0e-3], jnp.float32)
    hi = jnp.asarray([1.0e9, 20.0], jnp.float32)
    out = run_lm(
        resid, {"A": A, "y": y},
        jnp.asarray([80.0, 1.0], jnp.float32), lo, hi, LMConf(),
    )
    assert int(out["flags"]) == 0
    xhat = np.linalg.lstsq(
        np.asarray(A, np.float64), np.asarray(y, np.float64), rcond=None
    )[0]
    assert np.allclose(np.asarray(out["pars"]), xhat, rtol=1e-3)
    # and it converges in a sane number of evaluations, not a crawl
    assert int(out["nfev"]) < 100


def test_lm_on_bound_covariance():
    """a two-sided parameter whose unconstrained optimum lies OUTSIDE
    the box converges onto the bound with flags == 0 and a finite,
    sane covariance. The internal-space JtJ there scales by the
    saturated transform gradient squared (~1e-24 of the external
    curvature) and its f32 cholesky inverse is nan; the epilogue must
    invert the external-space JtJ instead (f32 precision, like the
    production pipelines)."""
    rng = np.random.RandomState(47)
    A = jnp.asarray(rng.normal(size=(30, 2)), jnp.float32)
    x_true = jnp.asarray([-0.4, 0.7], jnp.float32)  # x0 below the box
    sigma = 0.05
    y = A @ x_true + jnp.asarray(rng.normal(size=30), jnp.float32) * sigma

    def resid(pars, data):
        return (data["A"] @ pars - data["y"]) / sigma

    lo = jnp.asarray([0.0, -5.0], jnp.float32)
    hi = jnp.asarray([1.0, 5.0], jnp.float32)
    out = run_lm(
        resid, {"A": A, "y": y},
        jnp.asarray([0.5, 0.0], jnp.float32), lo, hi, LMConf(),
    )
    assert int(out["flags"]) == 0
    pars = np.asarray(out["pars"])
    assert pars[0] < 1e-6  # pinned on the lower bound
    # second parameter re-optimized given the constraint
    x1_constrained = float(
        np.linalg.lstsq(
            np.asarray(A[:, 1:], np.float64),
            np.asarray(y, np.float64),
            rcond=None,
        )[0][0]
    )
    assert abs(pars[1] - x1_constrained) < 0.05
    err = np.asarray(out["pars_err"])
    assert np.all(np.isfinite(err)) and np.all(err > 0) and np.all(err < 1)

    # one-sided form (x0 >= 0, sqrt transform): same stranding failure
    # mode pre-fix (steps alias across y=0 and x1 froze at the
    # unconstrained 0.677); must reach the same constrained optimum
    lo1 = jnp.asarray([0.0, -jnp.inf], jnp.float32)
    hi1 = jnp.asarray([jnp.inf, jnp.inf], jnp.float32)
    out1 = run_lm(
        resid, {"A": A, "y": y},
        jnp.asarray([0.5, 0.0], jnp.float32), lo1, hi1, LMConf(),
    )
    assert int(out1["flags"]) == 0
    pars1 = np.asarray(out1["pars"])
    assert pars1[0] < 1e-6
    assert abs(pars1[1] - x1_constrained) < 1e-4


def test_fitter_gauss_psf_gauss():
    """exp-model LM fit with a psf recovers injected parameters"""
    rng = np.random.RandomState(45)
    data = get_model_obs(
        rng=rng, model="gauss", T=1.2, g1=0.1, g2=-0.05, flux=100.0,
        noise=0.1,
    )
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])

    guess = data["pars"] * rng.uniform(low=0.9, high=1.1, size=6)
    fitter = Fitter(model="gauss")
    res = fitter.go(obs, guess)
    assert res["flags"] == 0
    assert res["s2n"] > 50
    assert np.allclose(res["pars"][2], 0.1, atol=0.02)
    assert np.allclose(res["pars"][3], -0.05, atol=0.02)
    assert np.allclose(res["pars"][4], 1.2, rtol=0.1)
    assert np.allclose(res["pars"][5], 100.0, rtol=0.05)
    assert res["nfev"] > 2
    assert "chi2per" in res and 0.7 < res["chi2per"] < 1.3

    gm = res.get_gmix()
    assert np.allclose(gm.get_flux(), res["pars"][5])
    im = res.make_image()
    assert im.shape == obs.image.shape


def test_fitter_fit_pars_bounds():
    """fit_pars["bounds"] (extension over the reference's prior-only
    bounds channel) is honored by Fitter.go: a flux lower bound ABOVE
    the true flux pins the fit on the bound (active-set step) with the
    free parameters at the conditional optimum; unknown fit_pars keys
    raise instead of being silently dropped."""
    rng = np.random.RandomState(48)
    data = get_model_obs(
        rng=rng, model="gauss", T=1.2, g1=0.1, g2=-0.05, flux=100.0,
        noise=0.1,
    )
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])
    guess = data["pars"] * rng.uniform(low=0.9, high=1.1, size=6)

    bounds = [
        (-2, 2), (-2, 2), (-0.99, 0.99), (-0.99, 0.99),
        (0.01, 50.0), (120.0, 1.0e9),
    ]
    res = Fitter(model="gauss", fit_pars={"bounds": bounds}).go(obs, guess)
    assert res["flags"] == 0
    assert abs(res["pars"][5] - 120.0) < 5e-3  # pinned at the bound
    assert np.allclose(res["pars"][2], 0.1, atol=0.03)  # shape still fit
    assert np.all(np.isfinite(res["pars_err"]))

    Fitter(model="gauss", fit_pars={"epsfcn": 1e-8})  # compat no-op
    with pytest.raises(ValueError, match="unsupported fit_pars"):
        Fitter(model="gauss", fit_pars={"factor": 100.0})
    with pytest.raises(ValueError, match="bounds has"):
        Fitter(model="gauss", fit_pars={"bounds": bounds[:3]}).go(obs, guess)


@pytest.mark.parametrize("model", ["exp", "dev"])
def test_fitter_exp_dev(model):
    rng = np.random.RandomState(46)
    data = get_model_obs(
        rng=rng, model=model, T=2.0, g1=0.05, g2=0.0, flux=100.0,
        noise=0.01, dims=(49, 49),
    )
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])
    guess = data["pars"] * rng.uniform(low=0.95, high=1.05, size=6)
    res = Fitter(model=model).go(obs, guess)
    assert res["flags"] == 0
    assert np.allclose(res["pars"][4], 2.0, rtol=0.05)
    assert np.allclose(res["pars"][5], 100.0, rtol=0.02)


def test_fitter_noiseless_exact():
    """noiseless fit converges to the true parameters tightly"""
    rng = np.random.RandomState(47)
    data = get_model_obs(
        rng=rng, model="gauss", T=1.5, g1=0.08, g2=0.03, flux=50.0,
        noise=1e-6,
    )
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])
    guess = data["pars"] * rng.uniform(low=0.9, high=1.1, size=6)
    res = Fitter(model="gauss", fit_pars={"maxfev": 4000, "ftol": 1e-10, "xtol": 1e-10}).go(obs, guess)
    assert res["flags"] == 0
    assert np.allclose(res["pars"][:2], 0.0, atol=1e-5)
    assert np.allclose(res["pars"][2], 0.08, atol=1e-5)
    assert np.allclose(res["pars"][3], 0.03, atol=1e-5)
    assert np.allclose(res["pars"][4], 1.5, rtol=1e-5)
    assert np.allclose(res["pars"][5], 50.0, rtol=1e-5)


def test_fitter_multi_epoch():
    from ngmix_tpu import ObsList

    rng = np.random.RandomState(48)
    obslist = ObsList()
    for _ in range(3):
        data = get_model_obs(
            rng=rng, model="gauss", T=1.2, g1=0.1, g2=-0.05, flux=100.0,
            noise=0.1,
        )
        obs = data["obs"]
        obs.psf.set_gmix(data["psf_gmix"])
        obslist.append(obs)

    guess = data["pars"] * rng.uniform(low=0.9, high=1.1, size=6)
    res = Fitter(model="gauss").go(obslist, guess)
    assert res["flags"] == 0
    # 3 epochs -> ~sqrt(3) more s2n than single epoch
    res1 = Fitter(model="gauss").go(obslist[0], guess)
    assert res["s2n"] > 1.5 * res1["s2n"]


def test_fitter_multi_band():
    from ngmix_tpu import MultiBandObsList, ObsList

    rng = np.random.RandomState(49)
    mb = MultiBandObsList()
    fluxes = [100.0, 150.0]
    for flux in fluxes:
        data = get_model_obs(
            rng=rng, model="gauss", T=1.2, g1=0.1, g2=-0.05, flux=flux,
            noise=0.05,
        )
        obs = data["obs"]
        obs.psf.set_gmix(data["psf_gmix"])
        ol = ObsList()
        ol.append(obs)
        mb.append(ol)

    guess = np.array([0.0, 0.0, 0.05, 0.0, 1.1, 90.0, 160.0])
    res = Fitter(model="gauss").go(mb, guess)
    assert res["flags"] == 0
    assert res["pars"].size == 7
    assert np.allclose(res["pars"][5], 100.0, rtol=0.05)
    assert np.allclose(res["pars"][6], 150.0, rtol=0.05)
    assert res["flux"].shape == (2,)


def test_fitter_error_calibration():
    """pars_err tracks the empirical scatter"""
    rng = np.random.RandomState(50)
    g1s, g1errs = [], []
    for _ in range(100):
        data = get_model_obs(
            rng=rng, model="gauss", T=1.2, g1=0.1, g2=0.0, flux=100.0,
            noise=0.5,
        )
        obs = data["obs"]
        obs.psf.set_gmix(data["psf_gmix"])
        guess = data["pars"] * rng.uniform(low=0.95, high=1.05, size=6)
        res = Fitter(model="gauss").go(obs, guess)
        if res["flags"] != 0:
            continue
        g1s.append(res["pars"][2])
        g1errs.append(res["pars_err"][2])
    assert len(g1s) > 80
    assert np.allclose(np.std(g1s), np.mean(g1errs), rtol=0.3)


def test_psf_flux_fitter():
    rng = np.random.RandomState(51)
    data = get_model_obs(
        rng=rng, model="gauss", T=0.0001, g1=0.0, g2=0.0, flux=100.0,
        noise=0.01,
    )
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])
    res = PSFFluxFitter().go(obs)
    assert res["flags"] == 0
    # nearly point source: psf flux ~ total flux
    assert np.allclose(res["flux"], 100.0, rtol=0.02)
    assert res["flux_err"] > 0


def test_fitter_bad_guess_raises():
    from ngmix_tpu.gexceptions import GMixRangeError

    rng = np.random.RandomState(52)
    data = get_model_obs(rng=rng, model="gauss", noise=0.1)
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])
    with pytest.raises(GMixRangeError):
        Fitter(model="gauss").go(obs, [0.0, 0.0, 0.9, 0.9, 1.0, 1.0])


def test_ad_jacobian_vs_finite_difference():
    """jacfwd of the fdiff residual matches central differences
    (the analog of the reference's test_fitting_lm_jacobian)"""
    import jax
    import jax.numpy as jnp

    from ngmix_tpu.fitting.fit_model import FitModel

    rng = np.random.RandomState(99)
    data = get_model_obs(
        rng=rng, model="exp", T=2.0, g1=0.05, g2=-0.02, flux=100.0,
        noise=0.01, dims=(33, 33),
    )
    obs = data["obs"]
    obs.psf.set_gmix(data["psf_gmix"])
    fm = FitModel(obs=obs, model="exp", guess=data["pars"])

    pars = jnp.asarray(data["pars"] * 1.01)
    jac_ad = np.asarray(jax.jacfwd(fm._fdiff_fn)(pars, fm.data))

    # central differences
    steps = np.array([1e-6, 1e-6, 1e-7, 1e-7, 1e-6, 1e-5])
    jac_fd = np.zeros_like(jac_ad)
    p0 = np.asarray(pars)
    for i in range(6):
        pp = p0.copy()
        pm = p0.copy()
        pp[i] += steps[i]
        pm[i] -= steps[i]
        fp = np.asarray(fm._fdiff_fn(jnp.asarray(pp), fm.data))
        fmn = np.asarray(fm._fdiff_fn(jnp.asarray(pm), fm.data))
        jac_fd[:, i] = (fp - fmn) / (2 * steps[i])

    scale = np.abs(jac_ad).max(axis=0)
    for i in range(6):
        assert np.allclose(
            jac_ad[:, i], jac_fd[:, i], atol=3e-5 * scale[i], rtol=1e-4
        ), "par %d" % i


def test_normal_batched_prior_bounds_match_run_lm():
    """the batched normal-equation driver with prior_fn + bounds solves
    the same objective as run_lm with prior rows at the residual head"""
    from ngmix_tpu.fitting.lm import run_lm_normal_batched

    rng = np.random.RandomState(7)
    B, npars, nrows = 4, 3, 20
    A = jnp.asarray(rng.normal(size=(nrows, npars)))
    x_true = jnp.asarray([0.8, -0.4, 0.3])
    sigma = 0.05
    ys = jnp.asarray(
        np.asarray(A @ x_true)[None, :]
        + rng.normal(size=(B, nrows)) * sigma
    )
    mu = jnp.asarray([0.5, -0.5, 0.5])
    sig_p = jnp.asarray([0.3, 0.3, 0.3])
    lo = jnp.asarray([-1.0, -1.0, -jnp.inf])
    hi = jnp.asarray([1.0, jnp.inf, 1.0])
    guess = jnp.zeros((B, npars)) + 0.1
    conf = LMConf()

    def prior_rows(pars):
        return (pars - mu) / sig_p

    # reference path: prior rows at the head of the residual vector
    def resid(pars, data):
        pix = (A @ pars - data) / sigma
        return jnp.concatenate([prior_rows(pars), pix])

    singles = [
        run_lm(resid, ys[i], guess[i], lo, hi, conf, n_prior_pars=npars)
        for i in range(B)
    ]

    # batched path: pixel rows through normal_fn, prior via prior_fn
    def normal_fn(pars, data):
        def one(p, y):
            r = (A @ p - y) / sigma
            J = A / sigma
            return jnp.sum(r * r), J.T @ r, J.T @ J

        return jax.vmap(one)(pars, data)

    out = run_lm_normal_batched(
        normal_fn, ys, guess, lo, hi, conf, nres=nrows,
        prior_fn=prior_rows,
    )

    for i in range(B):
        assert int(out["flags"][i]) == 0
        assert int(singles[i]["flags"]) == 0
        assert np.allclose(
            np.asarray(out["pars"][i]), np.asarray(singles[i]["pars"]),
            atol=1e-9,
        ), i
        # identical chi2/dof scale: dof excludes prior rows in both
        assert np.allclose(
            np.asarray(out["s_sq"][i]),
            np.asarray(
                jnp.sum(((A @ out["pars"][i] - ys[i]) / sigma) ** 2)
                / (nrows - npars)
            ),
            rtol=1e-8,
        )
        assert np.allclose(
            np.asarray(out["pars_err"][i]),
            np.asarray(singles[i]["pars_err"]), rtol=1e-6,
        )
        # the prior pulled the solution toward mu and bounds hold
        assert np.all(np.asarray(out["pars"][i]) >= np.asarray(lo) - 1e-12)
        assert np.all(np.asarray(out["pars"][i]) <= np.asarray(hi) + 1e-12)


def test_lm_dof_counts_only_unmasked_rows():
    """masked (zero) residual rows must not dilute the chi2/dof scale"""
    rng = np.random.RandomState(11)
    npars, nlive, nmask = 2, 30, 20
    A = jnp.asarray(rng.normal(size=(nlive, npars)))
    x_true = jnp.asarray([1.0, -0.5])
    sigma = 0.1
    y = A @ x_true + jnp.asarray(rng.normal(size=nlive)) * sigma

    def resid(pars, data):
        live = (A @ pars - data) / sigma
        return jnp.concatenate([live, jnp.zeros(nmask)])

    conf = LMConf()
    inf = jnp.full(npars, jnp.inf)
    out_naive = run_lm(resid, y, jnp.zeros(npars), -inf, inf, conf)
    out_eff = run_lm(
        resid, y, jnp.zeros(npars), -inf, inf, conf, n_eff=nlive
    )
    # same solution, correctly-scaled errors
    assert np.allclose(
        np.asarray(out_eff["pars"]), np.asarray(out_naive["pars"])
    )
    ratio = float(out_naive["s_sq"] / out_eff["s_sq"])
    expected = (nlive - npars) / (nlive + nmask - npars)
    assert np.allclose(ratio, expected, rtol=1e-10)


def test_lm_singular_jacobian_flagged():
    """a residual independent of one parameter makes JtJ singular: the
    cholesky covariance comes back nan and the SINGULAR flag is set
    (the LU path used to return finite garbage for indefinite JtJ)"""
    from ngmix_tpu.fitting.lm import run_lm_normal_batched
    from ngmix_tpu import flags as nf

    rng = np.random.RandomState(9)
    nrows, npars = 12, 3
    A = np.zeros((nrows, npars))
    A[:, :2] = rng.normal(size=(nrows, 2))  # column 2 unused
    A = jnp.asarray(A)
    y = jnp.asarray(rng.normal(size=nrows))

    def resid(pars, data):
        return A @ pars - data

    out = run_lm(
        resid, y, jnp.zeros(npars), jnp.full(npars, -jnp.inf),
        jnp.full(npars, jnp.inf), LMConf(),
    )
    assert int(out["flags"]) & nf.LM_SINGULAR_MATRIX
    # batched driver: one singular lane, one healthy lane
    B = 2
    Ab = jnp.asarray(
        np.stack([np.asarray(A), rng.normal(size=(nrows, npars))])
    )
    yb = jnp.asarray(rng.normal(size=(B, nrows)))

    def normal_fn(pars, data):
        Ad, yd = data
        r = jnp.einsum("bri,bi->br", Ad, pars) - yd
        J = Ad
        return (
            jnp.sum(r * r, axis=-1),
            jnp.einsum("bri,br->bi", J, r),
            jnp.einsum("bri,brj->bij", J, J),
        )

    outb = run_lm_normal_batched(
        normal_fn, (Ab, yb), jnp.zeros((B, npars)),
        jnp.full(npars, -jnp.inf), jnp.full(npars, jnp.inf), LMConf(),
        nres=nrows,
    )
    fl = np.asarray(outb["flags"])
    assert fl[0] & nf.LM_SINGULAR_MATRIX
    assert fl[1] == 0
    assert np.all(np.isfinite(np.asarray(outb["pars_cov"][1])))


def test_pinned_dims_pins_saturated_outward_dim():
    """the active-set mask pins a dim only when all three conditions
    hold: saturated against a finite bound, gradient pointing further
    outward, and linear improvement potential below the ftol stopping
    resolution (fitting/lm.py _pinned_dims)"""
    from ngmix_tpu.fitting.lm import _pinned_dims, e2i, i2e_grad

    lo = jnp.asarray([-1.0, -1.0])
    hi = jnp.asarray([1.0, 1.0])
    ftol = 1.0e-5
    x = jnp.asarray([[1.0 - 1.0e-6, 0.0]])  # dim0 saturated at hi
    y = e2i(x, lo, hi)
    g = i2e_grad(y, lo, hi)
    # external gradient +2 on dim0: descent pushes toward hi (outward);
    # available improvement 2*|grad_ext|*d_out = 4e-6 < ftol*cost
    Jtr = jnp.asarray([[-2.0, 0.0]]) * g
    cost = jnp.asarray([1.0])
    pinned = _pinned_dims(y, Jtr, cost, ftol, lo, hi)
    assert bool(pinned[0, 0]) and not bool(pinned[0, 1])

    # same geometry, gradient flipped INWARD: must not pin (this is
    # exactly the release path - the mask is recomputed per iteration)
    pinned_in = _pinned_dims(y, -Jtr, cost, ftol, lo, hi)
    assert not bool(pinned_in[0, 0])

    # improvement potential above the ftol resolution: stays free even
    # though saturated and outward (the dim still matters)
    pinned_big = _pinned_dims(y, Jtr, jnp.asarray([1.0e-3]), ftol, lo, hi)
    assert not bool(pinned_big[0, 0])


def test_pinned_dims_proximity_gate_interior_high_cost():
    """an interior dim with transiently tiny gradient at huge cost must
    NOT pin: without the |y| >= ln(1e4) proximity gate the
    available < ftol*cost test alone would freeze it (documented
    failure mode in _pinned_dims's docstring)"""
    from ngmix_tpu.fitting.lm import _pinned_dims, e2i, i2e_grad

    lo = jnp.asarray([-0.99, -0.99])
    hi = jnp.asarray([0.99, 0.99])
    x = jnp.asarray([[0.0, 0.0]])  # dead center
    y = e2i(x, lo, hi)
    g = i2e_grad(y, lo, hi)
    Jtr = jnp.asarray([[1.0e-9, 1.0e-9]]) * g  # transiently flat
    cost = jnp.asarray([1.0e5])  # early-fit cost scale
    pinned = _pinned_dims(y, Jtr, cost, 1.0e-5, lo, hi)
    assert not bool(pinned.any())


def test_lm_pin_then_release_end_to_end():
    """a dim that saturates (and pins) early in the fit must release
    and move to its interior optimum once the other dim converges and
    the gradient flips inward: r = [10*(b-5), a+b-5.5], a in [-1,1],
    started hard against hi with b far away. A permanently-frozen `a`
    would strand at (1, ~5) with cost ~0.25; the recomputed-per-
    iteration mask lets it finish at the true optimum (0.5, 5)."""

    def resid(pars, data):
        a, b = pars
        # third row is identically zero: it only buys a nonzero dof so
        # the chi^2/dof covariance path doesn't flag ZERO_DOF
        return jnp.array([10.0 * (b - 5.0), a + b - 5.5, 0.0 * a])

    lo = jnp.array([-1.0, -jnp.inf])
    hi = jnp.array([1.0, jnp.inf])
    out = run_lm(
        resid, {}, jnp.array([1.0 - 1.0e-6, 2.0]), lo, hi,
        LMConf(maxfev=500),
    )
    assert int(out["flags"]) == 0
    pars = np.asarray(out["pars"])
    assert np.allclose(pars, [0.5, 5.0], atol=1e-4), pars
    assert float(out["cost"]) < 1e-8


def test_normal_epilogue_incomplete_tripwire():
    """a solver state with lanes neither converged nor at maxfev is
    semantically impossible from a correctly-compiled driver loop -
    the epilogue must flag such lanes SOLVER_INCOMPLETE (a wrong-code
    tripwire; see run_lm_normal_batched's wrong-code history note)"""
    from ngmix_tpu.fitting.lm import LMConf, _normal_epilogue
    from ngmix_tpu.flags import SOLVER_INCOMPLETE

    B, npars = 4, 2
    eye = jnp.broadcast_to(jnp.eye(npars), (B, npars, npars))
    out = {
        "y": jnp.zeros((B, npars)),
        "cost": jnp.ones((B,)),
        "cost_pix": jnp.ones((B,)),
        "JtJ": eye,
        "nfev": jnp.asarray([2, 2, 4000, 7], jnp.int32),
        "done": jnp.asarray([False, True, False, True]),
        "ier_small_step": jnp.zeros((B,), bool),
        "ier_small_cost": jnp.asarray([False, True, False, True]),
    }
    lo = jnp.full((npars,), -jnp.inf)
    hi = jnp.full((npars,), jnp.inf)
    res = _normal_epilogue(out, lo, hi, LMConf(), nres=jnp.full((B,), 50), k_space=False)
    flags = np.asarray(res["flags"])
    # lane 0: frozen mid-solve -> tripwire; lane 2: at maxfev -> MAXITER
    # path, not the tripwire; lanes 1/3: clean
    assert flags[0] & SOLVER_INCOMPLETE
    assert not (flags[1] & SOLVER_INCOMPLETE)
    assert not (flags[2] & SOLVER_INCOMPLETE)
    assert flags[2] != 0  # maxed lane is still flagged (MAXITER)
    assert not (flags[3] & SOLVER_INCOMPLETE)
