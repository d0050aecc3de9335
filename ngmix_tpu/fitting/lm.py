"""Levenberg-Marquardt least squares with box bounds, in pure JAX.

TPU re-design of the reference's scipy/MINPACK path
(ngmix/fitting/leastsqbound.py:33-552): the reference inverts control
into Fortran lmdif/lmder with Python callbacks per iteration; here the
whole solve is a lax.while_loop that jits and vmaps over stamps.

- bounds use smooth internal<->external transforms in the role of the
  reference's MINUIT forms (leastsqbound.py:183-263): the sqrt forms
  for one-sided bounds, but a LOGISTIC map for two-sided boxes (the
  sin form is f32-fatal on wide spans — see the block comment below),
  plus an active-set pin of saturated dims that both transform
  families need to converge on-bound fits (_pinned_dims).
- derivatives come from jax.jacfwd of the residual function - the
  exact derivative of the apodized objective (the role of the
  reference's analytic derivs_nb.py:41-127 kernel).
- stopping mirrors lmdif: ftol on actual/predicted cost reduction,
  xtol on relative step size, maxfev on evaluations. Agreement with
  MINPACK is statistical, not bitwise.
- the returned covariance is scaled by chi2/dof over the non-prior
  rows with the same flag semantics as run_leastsq
  (leastsqbound.py:92-126).
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..defaults import CDEF, PDEF
from ..ops.small_linalg import chol_inverse, chol_is_spd, chol_solve
from ..util import match_vma as _match_vma
from ..flags import (
    EIG_NOTFINITE,
    LM_FUNC_NOTFINITE,
    LM_NEG_COV_DIAG,
    LM_NEG_COV_EIG,
    LM_SINGULAR_MATRIX,
    MAXITER,
    SOLVER_INCOMPLETE,
    ZERO_DOF,
)


class LMConf(NamedTuple):
    """static LM configuration"""

    maxfev: int = 4000
    ftol: float = 1.0e-5
    xtol: float = 1.0e-5
    lambda0: float = 1.0e-3
    lambda_up: float = 10.0
    lambda_down: float = 10.0
    lambda_min: float = 1.0e-12
    lambda_max: float = 1.0e12
    # AD-normal-fn builders only (batch._make_ad_normal_fn): compute
    # the flux jacobian column analytically (the model is exactly
    # linear in its flux parameter, so dr/dF is the unit-flux weighted
    # model - one fewer forward-mode tangent pass per LM iteration).
    # Same math as the AD column to roundoff; off by default pending
    # an on-chip A/B at the headline shape.
    flux_col: bool = False
    # batch._exp_lm_measure only: variable projection (Golub-Pereyra)
    # - solve the flux EXACTLY per evaluation and iterate only the
    # shape pars (one fewer tangent pass AND the flux dimension drops
    # out of the curvature). Same objective, different trajectory:
    # stopping fires at the same tolerances on the same reduced cost,
    # and the final pars/covariance come from a full-width evaluation
    # at (q*, F(q*)). Requires unbounded flux and no prior; off by
    # default pending an on-chip A/B.
    varpro: bool = False


# ----------------------------------------------------------------------
# Bounds transforms (same role as the reference's MINUIT-style forms,
# leastsqbound.py:183-263). One-sided bounds keep the reference's
# smooth sqrt forms. Two-sided bounds use a LOGISTIC map instead of
# the reference's sin transform: x = lo + (hi-lo)*sigmoid(y).
#
# Why the deviation: the sin form lo + (hi-lo)/2*(sin(y)+1) is
# catastrophically cancellation-prone in f32 whenever the parameter
# sits close to one bound relative to the span. Production flux
# bounds like [1e-3, 1e9] with flux ~1e2 give sin(y)+1 ~ 2e-7, which
# carries only ~1 significant f32 digit: the representable external
# flux values are ~10 units apart, so no LM step can resolve an
# improvement and lanes strand at lambda_max (measured: 21% of a
# bounded bdf validation batch flagged, m biased to +2e-2). The
# logistic keeps near-constant RELATIVE resolution across the whole
# span (~2e-4 flux quantum on the same case) and is globally monotone
# (the sin form is periodic, aliasing the internal coordinate).
# MINPACK never sees this because the reference runs it in f64.

# two-sided internal coordinates live in [-_Y_CLIP, _Y_CLIP]: e2i maps
# on-bound inputs to +-_Y_CLIP (1e-12 of the span from the bound) and
# the solvers clip accepted steps to the same range, so the logistic
# gradient span*sigmoid(y)*sigmoid(-y) >= ~1e-12*span never underflows
# mid-trajectory (an unclipped flat-direction step can land y at -80,
# where the f32 gradient is exactly 0 and the lane wedges).
_Y_CLIP = 27.631021  # ln(1e12)


def clip_internal(y, lo, hi):
    """clip two-sided dims of an internal vector to the e2i range;
    identity for one-sided/unbounded dims (their sqrt forms use the
    whole line). External values change by < 1e-12 of the span -
    invisible at f32 resolution."""
    both = jnp.isfinite(lo) & jnp.isfinite(hi)
    return jnp.where(both, jnp.clip(y, -_Y_CLIP, _Y_CLIP), y)


def i2e(y, lo, hi):
    """internal (unconstrained) -> external (constrained)"""
    has_lo = jnp.isfinite(lo)
    has_hi = jnp.isfinite(hi)
    s = jnp.sqrt(y * y + 1.0)
    lo_s = jnp.where(has_lo, lo, 0.0)
    hi_s = jnp.where(has_hi, hi, 0.0)
    both = lo_s + (hi_s - lo_s) * jax.nn.sigmoid(y)
    lower = lo_s - 1.0 + s
    upper = hi_s + 1.0 - s
    out = jnp.where(
        has_lo & has_hi,
        both,
        jnp.where(has_lo, lower, jnp.where(has_hi, upper, y)),
    )
    return out


def e2i(x, lo, hi):
    """external (constrained) -> internal (unconstrained)"""
    has_lo = jnp.isfinite(lo)
    has_hi = jnp.isfinite(hi)
    lo_s = jnp.where(has_lo, lo, 0.0)
    hi_s = jnp.where(has_hi, hi, 1.0)
    span = jnp.where(has_lo & has_hi, hi_s - lo_s, 1.0)
    # clip each side's distance so on-bound inputs map to a finite
    # internal coordinate (|y| <= log(1e12) ~ 27.6)
    t = jnp.clip(x - lo_s, 1.0e-12 * span, None)
    u = jnp.clip(hi_s - x, 1.0e-12 * span, None)
    both = jnp.log(t) - jnp.log(u)
    lower = jnp.sqrt(
        jnp.clip((x - lo_s + 1.0) ** 2 - 1.0, 0.0, None)
    )
    upper = jnp.sqrt(
        jnp.clip((hi_s - x + 1.0) ** 2 - 1.0, 0.0, None)
    )
    return jnp.where(
        has_lo & has_hi,
        both,
        jnp.where(has_lo, lower, jnp.where(has_hi, upper, x)),
    )


def i2e_grad(y, lo, hi):
    """d external / d internal"""
    has_lo = jnp.isfinite(lo)
    has_hi = jnp.isfinite(hi)
    s = jnp.sqrt(y * y + 1.0)
    lo_s = jnp.where(has_lo, lo, 0.0)
    hi_s = jnp.where(has_hi, hi, 0.0)
    # sigmoid(y)*(1-sigmoid(y)), computed as sigmoid(y)*sigmoid(-y)
    # so neither factor rounds to an exact 0/1 until |y| ~ 100
    both = (hi_s - lo_s) * jax.nn.sigmoid(y) * jax.nn.sigmoid(-y)
    lower = y / s
    upper = -y / s
    return jnp.where(
        has_lo & has_hi,
        both,
        jnp.where(has_lo, lower, jnp.where(has_hi, upper, jnp.ones_like(y))),
    )


def _solve_damped(JtJ, Jtr, lam):
    """solve (JtJ + lam*diag(JtJ)) dx = -Jtr; Marquardt scaling"""
    npars = JtJ.shape[-1]
    diag = jnp.diagonal(JtJ)
    diag = jnp.where(diag > 0, diag, 1.0)
    A = JtJ + (lam * diag)[..., None] * jnp.eye(npars, dtype=JtJ.dtype)
    # unrolled cholesky solve (ops.small_linalg: XLA's blocked solve is
    # 3.5x slower at these sizes); singular matrices produce nan which
    # the caller treats as a rejected step
    return chol_solve(A, -Jtr)


def _pinned_dims(y, Jtr, cost, ftol, lo, hi):
    """active-set mask: dims effectively ON a bound whose cost
    gradient points further outward.

    A smooth bounds transform converges badly once a parameter
    saturates: the Gauss-Newton solve's Schur complement cancels the
    transform gradient, so the step keeps targeting the UNCONSTRAINED
    joint optimum; with the on-bound dim unable to actually move, the
    free dims either creep toward the constrained optimum at O(100)
    evaluations or (when the unconstrained joint optimum shares their
    value) strand there while ftol fires - a wrong answer at default
    tolerances. Both transform families exhibit it (the sqrt one-sided
    forms alias y -> -y on top), and MINPACK's leastsqbound shares the
    failure. Freezing the saturated dim (zero row/col in the solve)
    makes the free dims target the CONDITIONAL optimum directly; the
    traced problems then converge to the true constrained solution in
    a handful of steps.

    The rule is scale-free and transform-agnostic. Per dim:
    - outward side: the external gradient grad_ext = Jtr / g pushes
      toward lo iff Jtr*g > 0 (cost = r.r, gradient = 2 Jtr, descent
      = -Jtr), toward hi iff Jtr*g < 0; only sides with a FINITE
      bound qualify.
    - available improvement: the linear model bounds the cost change
      of moving all the way to that bound by 2 |grad_ext| d_out
      = 2 |Jtr| d_out / |g| with d_out the external distance to the
      bound. Pin iff that is below the ftol stopping resolution
      (< ftol * cost): the dim can no longer matter, and letting it
      keep steering the solve only corrupts the free dims. A wide-box
      dim far from its optimum (flux ~1e2 above lo = 1e-3: d_out
      tiny relative to span but |grad_ext| huge) stays free.

    A dim must ALSO be genuinely near the bound to pin (a proximity
    gate in the internal coordinate): early in a fit the current cost
    is huge, so ftol*cost alone would pin interior dims whose gradient
    is transiently small but whose curvature coupling still matters
    (verified: a dim at the center of [-0.99, 0.99] with cost 1e5
    pins without the gate), and the resulting mask flapping resets
    the damping every iteration. Two-sided dims are near once the
    logistic is saturated past 1e-4 of the span (|y| >= ln(1e4));
    one-sided sqrt forms have a built-in external unit, so near means
    within ~1e-4 external units (y^2/2 <= 1e-4).

    The mask is recomputed each iteration from the current gradient,
    so a pinned dim whose improvement potential grows back past the
    threshold is released automatically. Interior trajectories are
    unaffected (never near a bound until converged against it).
    """
    g = i2e_grad(y, lo, hi)
    x = i2e(y, lo, hi)
    both = jnp.isfinite(lo) & jnp.isfinite(hi)
    near = jnp.where(
        both,
        jnp.abs(y) >= 9.2103404,      # ln(1e4): within 1e-4 of the span
        jnp.abs(y) <= 1.4142e-2,      # sqrt(2e-4): within 1e-4 ext units
    )
    toward_lo = (Jtr * g > 0) & jnp.isfinite(lo)
    toward_hi = (Jtr * g < 0) & jnp.isfinite(hi)
    d_out = jnp.where(
        toward_lo, x - lo, jnp.where(toward_hi, hi - x, jnp.inf)
    )
    g_safe = jnp.maximum(jnp.abs(g), jnp.finfo(g.dtype).tiny)
    available = 2.0 * jnp.abs(Jtr) * d_out / g_safe
    return (
        near
        & (toward_lo | toward_hi)
        & (available < (ftol * cost)[..., None])
    )


def _mask_normal(JtJ, Jtr, pinned):
    """zero the pinned rows/cols of the normal equations (unit diag so
    the cholesky stays SPD); the solve then returns dy = 0 for pinned
    dims and the conditional step for the free ones"""
    free = (~pinned).astype(JtJ.dtype)
    JtJ_m = JtJ * free[..., :, None] * free[..., None, :]
    npars = Jtr.shape[-1]
    eye = jnp.eye(npars, dtype=JtJ.dtype)
    JtJ_m = JtJ_m + jnp.where(pinned[..., None], eye, 0.0)
    return JtJ_m, Jtr * free


def run_lm(resid_fn, data, guess, lo, hi, conf: LMConf, n_prior_pars=0,
           k_space=False, n_eff=None):
    """minimize sum(resid_fn(x, data)^2) over x with box bounds.

    Parameters
    ----------
    resid_fn : callable (pars [npars], data) -> residuals [nres]
        pure function; jacobian taken with jacfwd
    data : pytree of arrays for one stamp
    guess : [npars] initial external parameters
    lo, hi : [npars] bounds (+-inf for unbounded)
    conf : LMConf (static)
    n_prior_pars : rows at the start of the residual that belong to
        priors (excluded from the chi^2/dof covariance scale)
    k_space : halve the dof (complex residuals; leastsqbound.py:96-98)
    n_eff : effective residual row count (incl. prior rows) for the
        chi^2/dof scale. The residual vector here keeps masked pixels
        as zero rows (ierr=0) where the reference's compacted pixel
        lists drop them; pass the unmasked count (traced scalar is
        fine) so dof matches. Default: the static row count.

    Returns
    -------
    dict with pars, pars_err, pars_cov, pars_cov0, flags, nfev, ier
    (vmappable over a leading batch dim of data/guess)
    """
    guess = jnp.asarray(guess)
    npars = guess.shape[-1]
    dtype = guess.dtype
    lo = jnp.broadcast_to(jnp.asarray(lo, dtype), guess.shape)
    hi = jnp.broadcast_to(jnp.asarray(hi, dtype), guess.shape)

    def resid_int(y):
        return resid_fn(i2e(y, lo, hi), data)

    def resid_and_jac(y):
        """residual + exact jacobian via jacfwd (measured identical to
        linearize + seed basis on TPU - the tangent passes dominate and
        XLA CSEs the second primal; jacfwd also survives jax 0.9's
        varying-across-mesh typing under shard_map, where linearize's
        constant eye seeds do not)"""
        r = resid_int(y)
        J = jax.jacfwd(resid_int)(y)
        return r, J

    y0 = e2i(guess, lo, hi)
    r0, J0 = resid_and_jac(y0)
    cost0 = jnp.sum(r0 * r0)

    state = {
        "y": y0,
        "r": r0,
        "cost": cost0,
        "J": J0,
        "lam": jnp.asarray(conf.lambda0, dtype),
        "nfev": jnp.int32(1),
        "done": jnp.asarray(False),
        "accepted": jnp.asarray(True),
        "ier_small_step": jnp.asarray(False),
        "ier_small_cost": jnp.asarray(False),
        "pinned": jnp.zeros((npars,), bool),
    }
    # carries initialized from constants must match the body's
    # varying-across-mesh types under shard_map (no-op otherwise)
    state = jax.tree.map(lambda v: _match_vma(v, r0), state)

    def cond(s):
        return (~s["done"]) & (s["nfev"] < conf.maxfev)

    def body(s):
        J = s["J"]
        JtJ = J.T @ J
        Jtr = J.T @ s["r"]

        pinned = _pinned_dims(s["y"], Jtr, s["cost"], conf.ftol, lo, hi)
        # a pin transition changes the solve's geometry: the escalated
        # lambda reflects the OLD system's rejections (crushing the
        # first conditional step to below the ftol resolution, which
        # would end the fit at the unconstrained-stranded point), and
        # convergence this iteration is meaningless - reset the
        # damping and keep iterating
        pin_changed = jnp.any(pinned != s["pinned"])
        lam_eff = jnp.where(pin_changed, conf.lambda0, s["lam"])
        JtJ_m, Jtr_m = _mask_normal(JtJ, Jtr, pinned)
        dy = _solve_damped(JtJ_m, Jtr_m, lam_eff)
        step_ok = jnp.all(jnp.isfinite(dy))
        dy = jnp.where(step_ok, dy, 0.0)

        y_try = clip_internal(s["y"] + dy, lo, hi)
        dy = y_try - s["y"]
        r_try, J_try = resid_and_jac(y_try)
        cost_try = jnp.sum(r_try * r_try)
        cost_try = jnp.where(jnp.isfinite(cost_try), cost_try, jnp.inf)

        accept = step_ok & (cost_try < s["cost"])

        # predicted reduction from the quadratic model
        pred = -jnp.dot(dy, 2.0 * Jtr) - jnp.dot(dy, JtJ @ dy)
        pred = jnp.maximum(pred, 1.0e-300)
        actual = s["cost"] - cost_try

        # convergence: relative cost reduction below ftol on an
        # accepted step, or relative step below xtol
        small_cost = accept & (
            (actual <= conf.ftol * s["cost"])
            & (pred <= conf.ftol * s["cost"])
        )
        # xtol criterion over the FREE dims only: a pinned dim's
        # saturated coordinate (|y| = ln(1e12) ~ 27.6) would inflate
        # ynorm ~17x vs the sin transform's |y| <= pi/2 and loosen the
        # accepted-step threshold for every other dim
        free_f = (~pinned).astype(dy.dtype)
        ynorm = jnp.sqrt(jnp.sum((s["y"] * free_f) ** 2))
        small_step = accept & (
            jnp.sqrt(jnp.sum(dy * dy)) <= conf.xtol * (ynorm + conf.xtol)
        )
        # lambda exhausted without an acceptable step: local minimum
        stuck = (~accept) & (lam_eff >= conf.lambda_max)

        new_lam = jnp.where(
            accept,
            jnp.maximum(lam_eff / conf.lambda_down, conf.lambda_min),
            jnp.minimum(lam_eff * conf.lambda_up, conf.lambda_max * 10.0),
        )

        y_new = jnp.where(accept, y_try, s["y"])
        r_new = jnp.where(accept, r_try, s["r"])
        cost_new = jnp.where(accept, cost_try, s["cost"])
        J_new = jnp.where(accept, J_try, s["J"])

        return {
            "y": y_new,
            "r": r_new,
            "cost": cost_new,
            "J": J_new,
            "lam": new_lam,
            "nfev": s["nfev"] + 1,
            "done": (small_cost | small_step | stuck) & ~pin_changed,
            "accepted": accept,
            "ier_small_step": small_step,
            "ier_small_cost": small_cost,
            "pinned": pinned,
        }

    out = jax.lax.while_loop(cond, body, state)

    y = out["y"]
    pars = i2e(y, lo, hi)
    r = out["r"]

    # external-coordinate covariance (same quantity as the reference's
    # G cov_int G, leastsqbound.py:516-527) computed by UNDOING the
    # bounds chain rule on the jacobian (J_ext = J_int / g, an exact
    # per-column scalar division) and inverting the external JtJ.
    # Equal to G inv(JtJ_int) G in exact arithmetic, but conditioned
    # like the unconstrained problem: near a bound g saturates
    # (~1e-12 of the span) and the internal JtJ's row/col scale by
    # g^2, which makes chol_inverse(JtJ_int) nan in f32 even when the
    # fit itself converged cleanly (measured: on-bound fracdev lanes
    # all flagged LM_SINGULAR_MATRIX). A g that is exactly 0 (a
    # one-sided parameter sitting exactly ON its bound, y=0) has a
    # zero internal column - the external curvature is unrecoverable
    # and the lane flags singular, as the reference's does.
    grad = i2e_grad(y, lo, hi)
    g_safe = jnp.where(grad == 0.0, jnp.finfo(dtype).tiny, grad)
    J_ext = out["J"] / g_safe[None, :]
    pcov0 = chol_inverse(J_ext.T @ J_ext)

    singular = ~jnp.all(jnp.isfinite(pcov0))

    # chi2/dof scaling over the non-prior rows
    nres = r.shape[-1] if n_eff is None else jnp.asarray(n_eff)
    if k_space:
        dof = (nres - n_prior_pars) // 2 - npars
    else:
        dof = nres - n_prior_pars - npars
    dof = jnp.asarray(dof)
    zero_dof = dof == 0
    dof_safe = jnp.maximum(dof, 1)
    s_sq = jnp.sum(r[n_prior_pars:] ** 2) / dof_safe
    pcov = pcov0 * s_sq

    # covariance sanity (ref: leastsqbound.py:165-179). Positive
    # definiteness via unrolled cholesky pivots (Sylvester) instead of
    # eigvalsh - identical for finite symmetric matrices up to the
    # measure-zero PSD-singular edge, and ~30x cheaper on TPU.
    matsel = jnp.where(singular, jnp.eye(npars, dtype=dtype), pcov)
    mat_finite = jnp.all(jnp.isfinite(matsel))
    neg_eig = mat_finite & ~chol_is_spd(matsel)
    neg_diag = jnp.any(jnp.diagonal(pcov) < 0)
    eig_notfinite = ~mat_finite

    func_notfinite = ~jnp.all(jnp.isfinite(r))
    maxed = out["nfev"] >= conf.maxfev

    flags = jnp.int32(0)
    izero = jnp.int32(0)
    flags = flags | jnp.where(func_notfinite, LM_FUNC_NOTFINITE, izero)
    flags = flags | jnp.where(singular & ~func_notfinite, LM_SINGULAR_MATRIX, izero)
    flags = flags | jnp.where(zero_dof, ZERO_DOF, izero)
    cov_bad = singular | zero_dof
    flags = flags | jnp.where(
        ~cov_bad & neg_eig & ~eig_notfinite, LM_NEG_COV_EIG, izero
    )
    flags = flags | jnp.where(
        ~cov_bad & neg_diag & ~eig_notfinite, LM_NEG_COV_DIAG, izero
    )
    flags = flags | jnp.where(~cov_bad & eig_notfinite, EIG_NOTFINITE, izero)
    flags = flags | jnp.where(
        maxed & ~out["done"] & (flags == 0), MAXITER, izero
    )

    bad = flags != 0
    cov_ok = ~(cov_bad | neg_eig | neg_diag | eig_notfinite)
    perr = jnp.where(
        cov_ok,
        jnp.sqrt(jnp.abs(jnp.diagonal(pcov))),
        jnp.full(npars, CDEF, dtype),
    )
    pars_out = jnp.where(func_notfinite, jnp.full(npars, PDEF, dtype), pars)
    pcov_out = jnp.where(cov_ok, pcov, jnp.full((npars, npars), CDEF, dtype))

    ier = jnp.where(
        out["ier_small_cost"], 1, jnp.where(out["ier_small_step"], 2, 5)
    )
    del bad
    return {
        "pars": pars_out,
        "pars_err": perr,
        "pars_cov": pcov_out,
        "pars_cov0": pcov0,
        "flags": flags,
        "nfev": out["nfev"],
        "ier": ier,
        "cost": out["cost"],
        "s_sq": s_sq,
    }


@partial(jax.jit, static_argnames=("resid_fn", "conf", "n_prior_pars", "k_space"))
def run_lm_jit(resid_fn, data, guess, lo, hi, conf: LMConf, n_prior_pars=0,
               k_space=False, n_eff=None):
    return run_lm(resid_fn, data, guess, lo, hi, conf,
                  n_prior_pars=n_prior_pars, k_space=k_space, n_eff=n_eff)


@partial(jax.jit, static_argnames=("resid_fn", "conf", "n_prior_pars", "k_space"))
def run_lm_batch(resid_fn, data, guess, lo, hi, conf: LMConf, n_prior_pars=0,
                 k_space=False, n_eff=None):
    """vmapped LM over a batch: data/guess carry a leading [B] dim;
    n_eff (if given) is a per-stamp [B] effective row count"""
    if n_eff is None:
        return jax.vmap(
            lambda d, g: run_lm(resid_fn, d, g, lo, hi, conf,
                                n_prior_pars=n_prior_pars, k_space=k_space)
        )(data, guess)
    return jax.vmap(
        lambda d, g, ne: run_lm(resid_fn, d, g, lo, hi, conf,
                                n_prior_pars=n_prior_pars, k_space=k_space,
                                n_eff=ne)
    )(data, guess, jnp.asarray(n_eff))


def get_def_stuff(npars):
    """default pars/cov/err for failed fits (ref: leastsqbound.py:158-163)"""
    pars = np.zeros(npars) + PDEF
    cov = np.zeros((npars, npars)) + CDEF
    err = np.zeros(npars) + CDEF
    return pars, cov, err


def run_lm_normal_batched(normal_fn, data, guess, lo, hi, conf: LMConf,
                          nres, k_space=False, compact_capacity=None,
                          prior_fn=None, gather_fn=None):
    """Batched LM driven by normal-equation reductions.

    Same algorithm and flag semantics as run_lm, but the objective is
    supplied as ``normal_fn(x_ext [B, npars], data) -> (cost [B],
    Jtr [B, npars], JtJ [B, npars, npars])`` in EXTERNAL coordinates -
    either the fused Pallas reduction kernel (ops.pallas_lm) or vmapped
    AD reductions. ``data`` is a pytree with leading dim [B] (pixels
    etc.) that the driver may gather. The bounds chain rule
    (J_int = J_ext diag(g)) is applied here.

    ``nres`` is the pixel residual row count - an int, or a [B] array
    of per-stamp unmasked counts so the chi^2/dof covariance scale
    matches the reference's compacted pixel lists (prior rows never
    enter it).

    ``gather_fn`` (optional) customizes how the straggler-compaction
    levels gather ``data`` down to the surviving lanes:
    ``gather_fn(data, idx) -> data`` with ``idx`` the [K] lane index.
    The default indexes every leaf's leading axis; pass a custom one
    when the data layout keeps the lane axis elsewhere (e.g. the mb
    objective's epoch-leading [E, B, P] pixel planes, which tile
    efficiently on TPU where a lane-leading [B, E, P] pads the E
    sublanes 8/E-fold).

    ``prior_fn`` (optional) maps ONE external parameter vector
    [npars] -> prior pseudo-residual rows [n_prior_rows] (e.g. a joint
    prior's fill_fdiff_device). Rows contribute rank-1 terms to
    cost/Jtr/JtJ via jacfwd - the batched equivalent of the reference's
    prior rows at the head of the residual vector
    (ngmix/fitting/results.py:439-485).

    compact_capacity: straggler compaction. A plain batched while_loop
    pays the full [B] evaluation cost until the LAST lane converges
    (nfev p50 ~ 5 but max ~ 23 on survey batches). With a capacity K
    (or a descending tuple of capacities), each phase iterates its
    batch only until the number of unconverged lanes fits in the next
    capacity, then gathers those lanes (and their data rows) into the
    smaller loop - identical per-lane updates and stopping criteria,
    so results are bitwise-equal, at ~K/B the cost per tail iteration.
    A geometric cascade (B/4, B/16, B/64) tracks the shrinking active
    set so the straggler tail never runs at full-batch cost.
    """
    guess = jnp.asarray(guess)
    B, npars = guess.shape
    dtype = guess.dtype
    lo = jnp.asarray(lo, dtype)
    hi = jnp.asarray(hi, dtype)

    # WRONG-CODE HISTORY (do not re-tune batch shapes without reading
    # this): at the B=6144 metacal-pipeline chunk shape (30720 stacked
    # lanes fused with the k-space stage) the XLA TPU compiler
    # miscompiled this solver THREE different ways across round 5's
    # attempts (tools/diag_6144.py / diag_lm.py): (1) as shipped in
    # round 4, the fused initial eval_normal returned Jtr0 ~ 0, so
    # iteration 1 took a zero step whose correctly-computed in-loop
    # cost marginally beat the corrupted cost0, fired small_step, and
    # froze 6123/6144 lanes bitwise AT the moments guess with nfev=2
    # and flags=0 (BENCH_r04 m=-2.8e-3, hetero m=-2.7e-2, R11=0.24);
    # (2) carrying the cascade count through the loop state compiled
    # to the bit-identical wrong program; (3) an optimization_barrier
    # on (guess, data) fixed the solve (pars matched CPU to 4e-4,
    # R11=0.9996) but the compiled program then corrupted the DERIVED
    # e1/e2 result columns on every lane (m=+3.2). The isolated solver
    # at the same 30720-lane shape is correct, as is every validated
    # shape (2048-chunk, 10240 single program). Conclusion: the 6144
    # chunk shape is wrong-code territory on current XLA-TPU; the
    # defaults pin validated shapes and bench.py gates |m| at the
    # shipped shape, so this code stays IDENTICAL to the m-green
    # round-4 program.
    if prior_fn is not None:
        prior_rows_batch = jax.vmap(prior_fn)
        prior_jac_batch = jax.vmap(jax.jacfwd(prior_fn))

    def eval_normal(y, d):
        x = i2e(y, lo, hi)
        cost_pix, Jtr, JtJ = normal_fn(x, d)
        cost = cost_pix
        if prior_fn is not None:
            rows = prior_rows_batch(x)  # [B, n_prior_rows]
            Jp = prior_jac_batch(x)  # [B, n_prior_rows, npars]
            cost = cost + jnp.sum(rows * rows, axis=-1)
            # explicit broadcast-reduce rather than einsum: the
            # batched-GEMM lowering of tiny (n_rows x npars)
            # contractions strands the MXU (see batch._normal_reductions)
            Jtr = Jtr + jnp.sum(Jp * rows[..., None], axis=-2)
            JtJ = JtJ + jnp.sum(
                Jp[..., :, None] * Jp[..., None, :], axis=-3
            )
        g = i2e_grad(y, lo, hi)
        return (cost, cost_pix, Jtr * g,
                JtJ * g[..., :, None] * g[..., None, :])

    y0 = e2i(guess, lo, hi)
    cost0, cost_pix0, Jtr0, JtJ0 = eval_normal(y0, data)

    n0 = guess.shape[0]
    state = {
        "y": y0,
        "cost": cost0,
        "cost_pix": cost_pix0,
        "Jtr": Jtr0,
        "JtJ": JtJ0,
        "lam": jnp.full((n0,), conf.lambda0, dtype),
        "nfev": jnp.full((n0,), 1, jnp.int32),
        "done": jnp.zeros((n0,), bool),
        "ier_small_step": jnp.zeros((n0,), bool),
        "ier_small_cost": jnp.zeros((n0,), bool),
        "pinned": jnp.zeros((n0, npars), bool),
    }
    # carries initialized from constants must match the body's
    # varying-across-mesh types under shard_map (no-op otherwise)
    state = jax.tree.map(lambda v: _match_vma(v, cost0), state)

    def active_of(s):
        return (~s["done"]) & (s["nfev"] < conf.maxfev)

    def make_body(d):
        def body(s):
            active = active_of(s)
            pinned = _pinned_dims(
                s["y"], s["Jtr"], s["cost"], conf.ftol, lo, hi
            )
            # pin transitions invalidate the escalated damping and any
            # convergence verdict this iteration (see run_lm's body)
            pin_changed = jnp.any(pinned != s["pinned"], axis=-1)
            lam_eff = jnp.where(pin_changed, conf.lambda0, s["lam"])
            JtJ_m, Jtr_m = _mask_normal(s["JtJ"], s["Jtr"], pinned)
            dy = jax.vmap(_solve_damped)(JtJ_m, Jtr_m, lam_eff)
            step_ok = jnp.all(jnp.isfinite(dy), axis=-1)
            dy = jnp.where(step_ok[:, None], dy, 0.0)

            y_try = clip_internal(s["y"] + dy, lo, hi)
            dy = y_try - s["y"]
            cost_try, cost_pix_try, Jtr_try, JtJ_try = eval_normal(y_try, d)
            cost_try = jnp.where(jnp.isfinite(cost_try), cost_try, jnp.inf)

            accept = step_ok & (cost_try < s["cost"])

            pred = (
                -jnp.einsum("bi,bi->b", dy, 2.0 * s["Jtr"])
                - jnp.einsum("bi,bij,bj->b", dy, s["JtJ"], dy)
            )
            pred = jnp.maximum(pred, 1.0e-300)
            actual = s["cost"] - cost_try

            small_cost = accept & (
                (actual <= conf.ftol * s["cost"])
                & (pred <= conf.ftol * s["cost"])
            )
            # free-dim ynorm: see run_lm's body
            free_f = (~pinned).astype(dy.dtype)
            ynorm = jnp.sqrt(jnp.sum((s["y"] * free_f) ** 2, axis=-1))
            small_step = accept & (
                jnp.sqrt(jnp.sum(dy * dy, axis=-1))
                <= conf.xtol * (ynorm + conf.xtol)
            )
            stuck = (~accept) & (lam_eff >= conf.lambda_max)

            new_lam = jnp.where(
                accept,
                jnp.maximum(lam_eff / conf.lambda_down, conf.lambda_min),
                jnp.minimum(
                    lam_eff * conf.lambda_up, conf.lambda_max * 10.0
                ),
            )

            upd = active & accept

            def sel(mask, a, b):
                return jnp.where(
                    mask.reshape(mask.shape + (1,) * (a.ndim - 1)), a, b
                )

            return {
                "y": sel(upd, y_try, s["y"]),
                "cost": jnp.where(upd, cost_try, s["cost"]),
                "cost_pix": jnp.where(upd, cost_pix_try, s["cost_pix"]),
                "Jtr": sel(upd, Jtr_try, s["Jtr"]),
                "JtJ": sel(upd, JtJ_try, s["JtJ"]),
                "lam": jnp.where(active, new_lam, s["lam"]),
                "nfev": s["nfev"] + active.astype(jnp.int32),
                "done": s["done"]
                | (active & (small_cost | small_step | stuck)
                   & ~pin_changed),
                "ier_small_step": jnp.where(
                    active, small_step, s["ier_small_step"]
                ),
                "ier_small_cost": jnp.where(
                    active, small_cost, s["ier_small_cost"]
                ),
                "pinned": jnp.where(
                    active[:, None], pinned, s["pinned"]
                ),
            }

        return body

    if compact_capacity is None:
        caps = []
    elif isinstance(compact_capacity, int):
        caps = [compact_capacity]
    else:
        caps = list(compact_capacity)
    caps = sorted({int(k) for k in caps if 0 < int(k) < B}, reverse=True)

    cur_state, cur_data = state, data
    outer = []  # (state-before-gather, gathered index) per level
    for K in caps:
        # run this level only until the stragglers fit in K lanes
        cur_state = jax.lax.while_loop(
            lambda s, K=K: jnp.any(active_of(s))
            & (jnp.sum(active_of(s)) > K),
            make_body(cur_data),
            cur_state,
        )
        # gather the (at most K) active lanes; inactive pad rows are
        # frozen by the active mask inside the body. Stable partition
        # (active lanes first, original order - same as a stable
        # argsort of ~active) via cumsum + scatter, which beats a full
        # sort at survey batch sizes.
        active = active_of(cur_state)
        nb = active.shape[0]
        n_act = jnp.cumsum(active)
        rank = jnp.where(
            active, n_act - 1, n_act[-1] + jnp.cumsum(~active) - 1
        )
        perm = jnp.zeros((nb,), jnp.int32).at[rank].set(
            jnp.arange(nb, dtype=jnp.int32)
        )
        idx = perm[:K]  # active lanes first
        outer.append((cur_state, idx))
        if gather_fn is None:
            cur_data = jax.tree.map(lambda x: x[idx], cur_data)
        else:
            cur_data = gather_fn(cur_data, idx)
        cur_state = jax.tree.map(lambda x: x[idx], cur_state)

    cur_state = jax.lax.while_loop(
        lambda s: jnp.any(active_of(s)), make_body(cur_data), cur_state
    )
    # scatter each level's tail results back out; lanes left behind at
    # a gather were inactive there, so their frozen values are final
    for prev_state, idx in reversed(outer):
        cur_state = jax.tree.map(
            lambda full, part: full.at[idx].set(part),
            prev_state, cur_state,
        )
    return _normal_epilogue(cur_state, lo, hi, conf, nres, k_space)


def _normal_epilogue(out, lo, hi, conf, nres, k_space):
    """pars/covariance/flags from a finished normal-equation solver
    state (shared by the LM while_loop and the fixed-iteration GN
    refiner): chi^2/dof-scaled covariance via unrolled cholesky, flag
    semantics matching run_leastsq (see PARITY.md deviations)."""
    B, npars = out["y"].shape
    dtype = out["y"].dtype
    y = out["y"]
    pars = i2e(y, lo, hi)

    # external-space covariance: undo the bounds chain rule on the
    # stored internal JtJ (JtJ_ext = JtJ_int / g_i g_j, exact scalar
    # divisions) and invert THAT - equal to G inv(JtJ_int) G in exact
    # arithmetic but conditioned like the unconstrained problem. The
    # internal JtJ's on-bound rows scale by g^2 ~ (1e-12 span)^2,
    # which is numerically singular in f32 even for cleanly converged
    # fits (see run_lm's epilogue comment).
    grad = i2e_grad(y, lo, hi)
    eye = jnp.eye(npars, dtype=dtype)
    g_safe = jnp.where(grad == 0.0, jnp.finfo(dtype).tiny, grad)
    JtJ_ext = out["JtJ"] / (g_safe[..., :, None] * g_safe[..., None, :])
    pcov0 = chol_inverse(JtJ_ext)

    singular = ~jnp.all(
        jnp.isfinite(pcov0.reshape(B, -1)), axis=-1
    )

    nres = jnp.asarray(nres)
    if k_space:
        dof = nres // 2 - npars
    else:
        dof = nres - npars
    zero_dof = jnp.broadcast_to(dof == 0, (B,))
    dof_safe = jnp.maximum(dof, 1)
    s_sq = out["cost_pix"] / dof_safe
    pcov = pcov0 * s_sq[:, None, None]

    # positive definiteness via unrolled cholesky pivots (Sylvester)
    # instead of eigvalsh: identical for finite symmetric matrices up
    # to the measure-zero PSD-singular edge, and the batched eigvalsh
    # alone cost ~70 ms at B=10240 on v5e (most of the LM epilogue)
    matsel = jnp.where(singular[:, None, None], eye, pcov)
    mat_finite = jnp.all(jnp.isfinite(matsel.reshape(B, -1)), axis=-1)
    neg_eig = mat_finite & ~chol_is_spd(matsel)
    neg_diag = jnp.any(
        jnp.diagonal(pcov, axis1=-2, axis2=-1) < 0, axis=-1
    )
    eig_notfinite = ~mat_finite

    func_notfinite = ~jnp.isfinite(out["cost"])
    maxed = out["nfev"] >= conf.maxfev

    flags = jnp.zeros((B,), jnp.int32)
    izero = jnp.int32(0)
    # wrong-code tripwire: the solver loops until every lane is done
    # or at maxfev, so a lane that is neither means the compiled loop
    # itself exited early (see flags.SOLVER_INCOMPLETE). Cheap
    # insurance only - the round-4 miscompile set `done` legitimately
    # from corrupted inputs and would NOT trip this; the mechanical
    # defense against that class is bench.py's |m| gate at the shipped
    # program shapes.
    flags = flags | jnp.where(
        ~out["done"] & ~maxed, SOLVER_INCOMPLETE, izero
    )
    flags = flags | jnp.where(func_notfinite, LM_FUNC_NOTFINITE, izero)
    flags = flags | jnp.where(
        singular & ~func_notfinite, LM_SINGULAR_MATRIX, izero
    )
    flags = flags | jnp.where(zero_dof, ZERO_DOF, izero)
    cov_bad = singular | zero_dof
    flags = flags | jnp.where(
        ~cov_bad & neg_eig & ~eig_notfinite, LM_NEG_COV_EIG, izero
    )
    flags = flags | jnp.where(
        ~cov_bad & neg_diag & ~eig_notfinite, LM_NEG_COV_DIAG, izero
    )
    flags = flags | jnp.where(~cov_bad & eig_notfinite, EIG_NOTFINITE, izero)
    flags = flags | jnp.where(
        maxed & ~out["done"] & (flags == 0), MAXITER, izero
    )

    cov_ok = ~(cov_bad | neg_eig | neg_diag | eig_notfinite)
    perr = jnp.where(
        cov_ok[:, None],
        jnp.sqrt(jnp.abs(jnp.diagonal(pcov, axis1=-2, axis2=-1))),
        jnp.full((B, npars), CDEF, dtype),
    )
    pars_out = jnp.where(
        func_notfinite[:, None], jnp.full((B, npars), PDEF, dtype), pars
    )
    pcov_out = jnp.where(
        cov_ok[:, None, None], pcov,
        jnp.full((B, npars, npars), CDEF, dtype),
    )

    ier = jnp.where(
        out["ier_small_cost"], 1, jnp.where(out["ier_small_step"], 2, 5)
    )
    return {
        "pars": pars_out,
        "pars_err": perr,
        "pars_cov": pcov_out,
        "pars_cov0": pcov0,
        "flags": flags,
        "nfev": out["nfev"],
        "ier": ier,
        "cost": out["cost"],
        "s_sq": s_sq,
    }


def run_gn_refine_batched(normal_fn, data, guess, lo, hi, conf: LMConf,
                          nres, niter=3, lam=1.0e-6, k_space=False,
                          prior_fn=None):
    """Fixed-iteration damped Gauss-Newton refinement from a
    near-optimal start.

    For the sheared metacal types the fit target differs from the
    (already solved) noshear fit by an O(step) perturbation, so a few
    unconditional damped-GN steps from the noshear optimum converge
    quadratically - no accept/reject machinery, no while_loop, no
    straggler tail. LM warm-starting was measured to LOSE here
    (trial steps at an optimum get rejected, which both counts as an
    eval and escalates lambda - see CLAUDE.md); unconditional GN has
    neither failure mode. ``niter`` steps unroll at trace time; one
    extra normal evaluation at the final point feeds the shared
    chi^2/dof covariance epilogue. Steps that go non-finite are
    dropped (the lane keeps its current point and the epilogue's
    covariance/flag checks report the failure).
    """
    guess = jnp.asarray(guess)
    dtype = guess.dtype
    lo = jnp.asarray(lo, dtype)
    hi = jnp.asarray(hi, dtype)

    if prior_fn is not None:
        prior_rows_batch = jax.vmap(prior_fn)
        prior_jac_batch = jax.vmap(jax.jacfwd(prior_fn))

    def eval_normal(y):
        x = i2e(y, lo, hi)
        cost_pix, Jtr, JtJ = normal_fn(x, data)
        cost = cost_pix
        if prior_fn is not None:
            rows = prior_rows_batch(x)
            Jp = prior_jac_batch(x)
            cost = cost + jnp.sum(rows * rows, axis=-1)
            Jtr = Jtr + jnp.sum(Jp * rows[..., None], axis=-2)
            JtJ = JtJ + jnp.sum(
                Jp[..., :, None] * Jp[..., None, :], axis=-3
            )
        g = i2e_grad(y, lo, hi)
        return (cost, cost_pix, Jtr * g,
                JtJ * g[..., :, None] * g[..., None, :])

    y = e2i(guess, lo, hi)
    lam_v = jnp.asarray(lam, dtype)
    for _ in range(niter):
        cost, _, Jtr, JtJ = eval_normal(y)
        # same saturated-bound handling as the LM body: pin dims that
        # are on a bound with an outward, unresolvable gradient (else
        # the unconditional GN step targets the UNCONSTRAINED optimum
        # and drags the free dims off the conditional one), and clip
        # the internal coordinates so the logistic never underflows
        pinned = _pinned_dims(y, Jtr, cost, conf.ftol, lo, hi)
        JtJ_m, Jtr_m = _mask_normal(JtJ, Jtr, pinned)
        dy = jax.vmap(lambda A, b: _solve_damped(A, b, lam_v))(
            JtJ_m, Jtr_m
        )
        ok = jnp.all(jnp.isfinite(dy), axis=-1)
        y = clip_internal(y + jnp.where(ok[:, None], dy, 0.0), lo, hi)

    cost, cost_pix, _, JtJ = eval_normal(y)
    B = y.shape[0]
    state = {
        "y": y,
        "cost": cost,
        "cost_pix": cost_pix,
        "JtJ": JtJ,
        "nfev": jnp.full((B,), niter + 1, jnp.int32),
        "done": jnp.ones((B,), bool),
        "ier_small_step": jnp.ones((B,), bool),
        "ier_small_cost": jnp.zeros((B,), bool),
    }
    return _normal_epilogue(state, lo, hi, conf, nres, k_space)
