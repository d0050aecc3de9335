"""Survey-scale shear-recovery validation on the TPU.

Runs batched metacal + a chosen measure over many simulated batches
and reports the recovered multiplicative bias m with its uncertainty.
Calibration statistics (per-type e sums, counts, e^2) accumulate ON
DEVICE - only O(1) scalars cross the tunnel at the end, the same
pattern the sharded pipeline psums across chips.

The default sim is HETEROGENEOUS (bench.make_sim_batch_hetero):
per-stamp size/flux/intrinsic shape in cancelling +-g pairs and
per-stamp psf variation; --homog reverts to the single-object bench
sim. --wcs sheared renders and measures under a non-diagonal WCS.
Gate: |m| < 1e-3 (the reference's method-intrinsic residual is
~3.4e-4, ngmix/tests/test_metacal_accuracy.py:65-77).

Run one config:   python tools/validate_scale.py --measure exp-lm
Full surface:     python tools/validate_scale.py --sweep
                  (the round-3 estimator-surface table; ~20 min TPU)

Historical numbers (2026-08, homogeneous sim, 0.2-1M stamps):
  exp-lm m = 3.95e-4 +/- 3.7e-6; admom 4.48e-4; gauss-lm 3.32e-4.
See README.md for the round-3 heterogeneous-sim sweep table.
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench as B  # noqa: E402
from ngmix_tpu.batch import (  # noqa: E402
    GALSHEAR_TYPES,
    PSFSHEAR_TYPES,
    MetacalConfig,
    metacal_pipeline,
    metacal_pipeline_mb,
)

SHEARED_JAC = (
    B.SCALE * 1.02, B.SCALE * 0.01, B.SCALE * 0.015, B.SCALE * 0.98
)


def run_config(measure="exp-lm", psf_mode="gauss", het=True, wcs="diag",
               types=5, select=False, mb=False, Bsz=2048, nbatch=50,
               seed=777, quiet=False, gint_max=0.3, lm_bounds=None,
               gal_model="exp", nband=1, noise=None, sel="T"):
    """accumulate calibration sums over nbatch sim+measure steps and
    return a result dict (m, se_m, R11, n, rate, extras).

    With the paired heterogeneous sim the noshear uncertainty comes
    from the PAIR-MEAN variance (the +-g_int pairs cancel shape noise
    in the estimator, so the naive per-object variance overstates se_m
    by ~the shape-noise/measurement-noise ratio). Selection breaks the
    pairing (a pair member can fail the cut its partner passes), so
    --select keeps the unpaired variance and should run with a small
    gint_max and a large n to resolve m.
    """
    jac = SHEARED_JAC if wcs == "sheared" else (B.SCALE, 0, 0, B.SCALE)
    all_types = GALSHEAR_TYPES + (
        PSFSHEAR_TYPES if types == 9 else ()
    )
    conf = MetacalConfig(
        dims=B.DIMS, psf_dims=B.PSF_DIMS, jac=jac,
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
        psf_mode=psf_mode, types=all_types,
    )

    # mb runs E = max(2, nband) epochs covering `nband` bands
    # round-robin; nband >= 2 draws per-stamp per-band SED factors
    nepoch = max(2, nband)

    nkw = {} if noise is None else {"noise": noise}

    def sim(key):
        if mb:
            return B.make_sim_batch_hetero(
                key, Bsz, jac=jac, nepoch=nepoch, gint_max=gint_max,
                gal_model=gal_model, nband=nband, **nkw,
            )
        if het:
            return B.make_sim_batch_hetero(
                key, Bsz, jac=jac, gint_max=gint_max,
                gal_model=gal_model, **nkw,
            )
        return B.make_sim_batch(key, Bsz)

    def measure_step(args):
        if mb:
            band = jnp.arange(nepoch, dtype=jnp.int32) % nband
            return metacal_pipeline_mb(
                *args, band, nband, conf, measure=measure,
                lm_bounds=lm_bounds,
            )
        return metacal_pipeline(
            *args, conf, measure=measure, lm_bounds=lm_bounds
        )

    def sel_fn(r):
        if sel == "s2n":
            # the production-style cut: at realistic noise the s2n
            # threshold binds on a sizeable fraction of the population
            # and is shear-correlated through the weighted flux
            return r["s2n"] > 10.0
        # a T cut that BINDS on the heterogeneous population (T is
        # drawn from [0.3, 1.1]) and is shear-correlated, so
        # R_sel != 0 and the correction is genuinely exercised
        return r["T"] > 0.55

    nacc = len(all_types)
    paired = het or mb

    @jax.jit
    def step(key, acc, acc_sel, acc_psf, acc_pair):
        res = measure_step(sim(key))
        for i, t in enumerate(all_types):
            ok = res[t]["flags"] == 0
            e1 = jnp.where(ok, res[t]["e1"], 0.0)
            e2 = jnp.where(ok, res[t]["e2"], 0.0)
            if t in PSFSHEAR_TYPES:
                j = PSFSHEAR_TYPES.index(t)
                acc_psf = acc_psf.at[j, 0].add(jnp.sum(e1))
                acc_psf = acc_psf.at[j, 1].add(jnp.sum(e2))
                acc_psf = acc_psf.at[j, 2].add(jnp.sum(ok))
            else:
                acc = acc.at[i, 0].add(jnp.sum(e1))
                acc = acc.at[i, 1].add(jnp.sum(ok))
                acc = acc.at[i, 2].add(jnp.sum(e1 * e1))
            if paired and t == "noshear":
                # +-g_int pair means: the estimator's actual noise
                half = Bsz // 2
                pok = ok[:half] & ok[half:]
                ep = jnp.where(
                    pok, 0.5 * (e1[:half] + e1[half:]), 0.0
                )
                acc_pair = acc_pair.at[0].add(jnp.sum(ep))
                acc_pair = acc_pair.at[1].add(jnp.sum(ep * ep))
                acc_pair = acc_pair.at[2].add(jnp.sum(pok))
        if select:
            # Sheldon & Huff selection response: values from val_t
            # under the selection derived from sel_t
            ns = "noshear"
            combos = [(ns, ns)] + [(t, ns) for t in GALSHEAR_TYPES[1:]] \
                + [(ns, t) for t in GALSHEAR_TYPES[1:]]
            for j, (vt, st) in enumerate(combos):
                ok = (
                    (res[vt]["flags"] == 0)
                    & (res[st]["flags"] == 0)
                    & sel_fn(res[st])
                )
                e1 = jnp.where(ok, res[vt]["e1"], 0.0)
                acc_sel = acc_sel.at[j, 0].add(jnp.sum(e1))
                acc_sel = acc_sel.at[j, 1].add(jnp.sum(ok))
                acc_sel = acc_sel.at[j, 2].add(jnp.sum(e1 * e1))
        return acc, acc_sel, acc_psf, acc_pair

    key = jax.random.PRNGKey(seed)
    acc = jnp.zeros((nacc, 3))
    acc_sel = jnp.zeros((9, 3))
    acc_psf = jnp.zeros((4, 3))
    acc_pair = jnp.zeros((3,))

    key, k = jax.random.split(key)
    state = step(k, acc, acc_sel, acc_psf, acc_pair)  # compile
    float(state[0][0, 0])
    t0 = time.time()
    for _ in range(nbatch - 1):
        key, k = jax.random.split(key)
        state = step(k, *state)
    acc, acc_sel, acc_psf, acc_pair = state
    a = jax.device_get(acc)
    asel = jax.device_get(acc_sel)
    apsf = jax.device_get(acc_psf)
    apair = jax.device_get(acc_pair)
    t_total = time.time() - t0
    rate = (nbatch - 1) * Bsz / t_total

    out = {}
    if select:
        ns = "noshear"
        combos = [(ns, ns)] + [(t, ns) for t in GALSHEAR_TYPES[1:]] \
            + [(ns, t) for t in GALSHEAR_TYPES[1:]]
        mean = {c: asel[j, 0] / max(asel[j, 1], 1)
                for j, c in enumerate(combos)}
        N = asel[0, 1]
        R11 = (mean[("1p", ns)] - mean[("1m", ns)]) / 0.02
        Rsel = (mean[(ns, "1p")] - mean[(ns, "1m")]) / 0.02
        e_ns = mean[(ns, ns)]
        sh = e_ns / (R11 + Rsel)
        var = asel[0, 2] / N - e_ns**2
        se = (var / N) ** 0.5 / abs(R11 + Rsel)
        out["R_sel11"] = float(Rsel)
    else:
        idx = {t: i for i, t in enumerate(all_types)}
        mean = {t: a[idx[t], 0] / max(a[idx[t], 1], 1)
                for t in GALSHEAR_TYPES}
        N = a[idx["noshear"], 1]
        R11 = (mean["1p"] - mean["1m"]) / 0.02
        sh = mean["noshear"] / R11
        if paired and apair[2] > 1:
            npair = apair[2]
            mpair = apair[0] / npair
            var = apair[1] / npair - mpair**2
            se = (var / npair) ** 0.5 / abs(R11)
        else:
            var = a[idx["noshear"], 2] / N - mean["noshear"] ** 2
            se = (var / N) ** 0.5 / abs(R11)
    if types == 9:
        pmean = {
            t: (apsf[j, 0] / max(apsf[j, 2], 1),
                apsf[j, 1] / max(apsf[j, 2], 1))
            for j, t in enumerate(PSFSHEAR_TYPES)
        }
        out["R_psf11"] = float(
            (pmean["1p_psf"][0] - pmean["1m_psf"][0]) / 0.02
        )
        out["R_psf22"] = float(
            (pmean["2p_psf"][1] - pmean["2m_psf"][1]) / 0.02
        )

    out.update({
        "m": float(sh / 0.02 - 1), "se_m": float(3 * se / 0.02),
        "R11": float(R11), "n": int(N), "rate": rate,
        "n_stamps": (nbatch) * Bsz,
    })
    if not quiet:
        print(
            "n=%d (%.0f/s sustained)  R11=%.4f  m = %.2e +/- %.2e (99.7%%)"
            % (out["n"], rate, out["R11"], out["m"], out["se_m"])
        )
        for k2 in ("R_sel11", "R_psf11", "R_psf22"):
            if k2 in out:
                print("  %s = %.4f" % (k2, out[k2]))
    return out



def run_config_pm(measure="exp-lm", wcs="diag", select=False,
                  Bsz=2048, nbatch=100, seed=911, quiet=False,
                  gint_max=0.3, noise=0.55, lm_bounds=None,
                  select_cut=10.0):
    """realistic-noise m validation via +-g noise cancellation.

    At survey noise (s2n ~ 10-20; noise=0.55 puts the hetero
    population's s2n at p16/p50/p84 = 11/15/20) the per-lane shape
    error is sigma_e ~ 2/s2n, so even 10^5 pairs only resolve m to
    ~4e-2 - the |m| < 1e-3 gate is unreachable by averaging alone.
    The standard remedy (the reference's mdet regression tests and
    Sheldon & Huff 2017 sims) is shear cancellation: simulate the SAME
    population twice with g1 = +-0.02 and IDENTICAL noise realizations
    (same PRNG key; the shear enters only the truth gmix), then
      m = (<e+>_ns - <e->_ns) / (S * (R11+ + R11-)) - 1,
    where the noise-induced measurement error cancels to first order
    in the difference. With a selection, each run's Sheldon & Huff
    estimator (R11 + Rsel) enters the same difference. se_m comes from
    the batch-to-batch scatter of the per-batch difference (99.7%).

    This is the regime where fixnoise earns its keep: the sheared
    types' correlated noise would otherwise bias R11 itself.
    """
    S = 0.02
    jac = SHEARED_JAC if wcs == "sheared" else (B.SCALE, 0, 0, B.SCALE)
    conf = MetacalConfig(
        dims=B.DIMS, psf_dims=B.PSF_DIMS, jac=jac,
        fixnoise=True, pad_factor=1.3, fit_dims=(19, 19),
    )

    def measure_step(key, sgn):
        args = B.make_sim_batch_hetero(
            key, Bsz, jac=jac, gint_max=gint_max, noise=noise,
            shear=(sgn * S, 0.0),
        )
        return metacal_pipeline(
            *args, conf, measure=measure, lm_bounds=lm_bounds
        )

    def sel_fn(r):
        return r["s2n"] > select_cut

    # combos (value-type, selection-type): (t, ns) rows give the
    # response of the SELECTED sample R11; (ns, t) rows give the
    # Sheldon & Huff selection response Rsel (arXiv:1702.02601 eq
    # 10-11, first order in the selection's shear dependence); (t, t)
    # rows give the shear-CONSISTENT selection response (each sheared
    # type selected by its own measurements), which absorbs the
    # selection response into R11 exactly - the estimator the
    # reference's own oracle uses (ngmix/tests/
    # test_metacal_accuracy.py:56-58 selects w_1p/w_1m per type).
    # With a hard cut the two differ at second order: both are
    # reported when select is on.
    ns = "noshear"
    combos = [(ns, ns)] + [(t, ns) for t in GALSHEAR_TYPES[1:]] \
        + [(ns, t) for t in GALSHEAR_TYPES[1:]]
    if select:
        combos += [(t, t) for t in GALSHEAR_TYPES[1:]]

    @jax.jit
    def step(key, ib, acc, dif):
        # acc [2, ncombo, 2]: per run (+,-), per (value-type, sel-type)
        # combo, (sum e1, n); dif [nbatch]: per-batch mean difference
        means = []
        for r, sgn in enumerate((1.0, -1.0)):
            res = measure_step(key, sgn)
            for j, (vt, st) in enumerate(combos):
                ok = (res[vt]["flags"] == 0) & (res[st]["flags"] == 0)
                if select:
                    ok = ok & sel_fn(res[st])
                e1 = jnp.where(ok, res[vt]["e1"], 0.0)
                acc = acc.at[r, j, 0].add(jnp.sum(e1))
                acc = acc.at[r, j, 1].add(jnp.sum(ok))
                if j == 0:
                    means.append(
                        jnp.sum(e1) / jnp.maximum(jnp.sum(ok), 1)
                    )
        dif = dif.at[ib].set(means[0] - means[1])
        return acc, dif

    key = jax.random.PRNGKey(seed)
    acc = jnp.zeros((2, len(combos), 2))
    dif = jnp.zeros((nbatch,))
    key, k = jax.random.split(key)
    acc, dif = step(k, 0, acc, dif)  # compile
    float(acc[0, 0, 0])
    t0 = time.time()
    for ib in range(1, nbatch):
        key, k = jax.random.split(key)
        acc, dif = step(k, ib, acc, dif)
    a = jax.device_get(acc)
    d = jax.device_get(dif)
    t_total = time.time() - t0
    rate = (nbatch - 1) * Bsz * 2 / t_total

    mean = [
        {c: a[r, j, 0] / max(a[r, j, 1], 1) for j, c in enumerate(combos)}
        for r in range(2)
    ]
    Rtot = []
    for r in range(2):
        R11 = (mean[r][("1p", ns)] - mean[r][("1m", ns)]) / S
        Rsel = (
            (mean[r][(ns, "1p")] - mean[r][(ns, "1m")]) / S
            if select else 0.0
        )
        Rtot.append(R11 + Rsel)
    diff = mean[0][(ns, ns)] - mean[1][(ns, ns)]
    m = diff / (S * (Rtot[0] + Rtot[1])) - 1.0
    se_dif = float(jnp.std(jnp.asarray(d))) / max(nbatch, 1) ** 0.5
    se_m = 3.0 * se_dif / (S * (Rtot[0] + Rtot[1]))
    out = {
        "m": float(m), "se_m": float(se_m),
        "R11": float(0.5 * (Rtot[0] + Rtot[1])), "n": int(a[0, 0, 1]),
        "rate": rate, "n_stamps": nbatch * Bsz * 2, "noise": noise,
    }
    if select:
        Rcons = [
            (mean[r][("1p", "1p")] - mean[r][("1m", "1m")]) / S
            for r in range(2)
        ]
        out["m_cons"] = float(diff / (S * (Rcons[0] + Rcons[1])) - 1.0)
        out["se_m_cons"] = float(
            3.0 * se_dif / (S * (Rcons[0] + Rcons[1]))
        )
        out["R11_cons"] = float(0.5 * (Rcons[0] + Rcons[1]))
        if not quiet:
            print(
                "pm consistent-sel: Rcons=%.4f  m = %.2e +/- %.2e "
                "(99.7%%)" % (
                    out["R11_cons"], out["m_cons"], out["se_m_cons"],
                )
            )
    if not quiet:
        print(
            "pm n=%d (%.0f/s sustained)  Rtot=%.4f  m = %.2e +/- %.2e "
            "(99.7%%)" % (out["n"], rate, out["R11"], out["m"],
                          out["se_m"])
        )
    return out


SWEEP = [
    # label, kwargs — the round-3 estimator-surface table
    ("exp-lm het", dict(measure="exp-lm")),
    ("gauss-lm het", dict(measure="gauss-lm")),
    ("dev-lm het", dict(measure="dev-lm")),
    # composite bulge+disk on matched bdf truth (per-stamp fracdev in
    # [0.1, 0.9]) with production-style bounds (fracdev in [0, 1],
    # flux in [1e-3, 1e9]). The wide flux box is the regression
    # trigger for the f32 bounds-transform quantization the logistic
    # transform fixed (fitting/lm.py:i2e; was 21% flagged, m=+2e-2).
    ("bdf-lm het (bdf truth)", dict(
        measure="bdf-lm", gal_model="bdf",
        lm_bounds=(
            [-2.0, -2.0, -0.99, -0.99, 1.0e-3, 0.0, 1.0e-3],
            [2.0, 2.0, 0.99, 0.99, 20.0, 1.0, 1.0e9],
        ),
    )),
    # on-bound stress: bounded bdf on PURE-EXP truth puts every lane's
    # fracdev optimum exactly ON the lower bound. Requires the
    # active-set pinning in fitting/lm.py (_pinned_dims): without it
    # the saturated transform stranded 46% of lanes (m = -0.11).
    ("bdf-lm het (exp truth, on-bound)", dict(
        measure="bdf-lm",
        lm_bounds=(
            [-2.0, -2.0, -0.99, -0.99, 1.0e-3, 0.0, 1.0e-3],
            [2.0, 2.0, 0.99, 0.99, 20.0, 1.0, 1.0e9],
        ),
    )),
    ("admom het", dict(measure="admom")),
    ("gaussmom het", dict(measure="gaussmom")),
    # pre-psf measures: the partial-mode path (prepsfmom_batch
    # partial_modes) never materializes the pad-4 grids, lifting the
    # HBM ceiling that used to cap these at B=512 (19.4G needed /
    # 15.75G at B=2048 on the old full-FFT path)
    ("pgauss het", dict(measure="pgauss", Bsz=2048, nbatch=50)),
    ("ksigma het", dict(measure="ksigma", Bsz=2048, nbatch=50)),
    ("exp-lm sheared-WCS", dict(measure="exp-lm", wcs="sheared")),
    ("gaussmom sheared-WCS", dict(measure="gaussmom", wcs="sheared")),
    ("exp-lm azgauss", dict(measure="exp-lm", psf_mode="azgauss")),
    ("exp-lm fitgauss", dict(measure="exp-lm", psf_mode="fitgauss")),
    ("exp-lm dilate 9-type", dict(measure="exp-lm", psf_mode="dilate",
                                  types=9)),
    # selection breaks the +-g pairing, so the select config runs with
    # small intrinsic shapes and many more stamps to resolve m at the
    # gate level from the unpaired variance
    ("exp-lm select(T>0.55)", dict(measure="exp-lm", select=True,
                                   gint_max=0.05, Bsz=4096,
                                   nbatch=1000)),
    ("exp-lm mb E=2", dict(measure="exp-lm", mb=True)),
    # joint multi-band fits: E=2 epochs in 2 bands with per-stamp SED
    # factors (the reference's oracle methodology through MultiBand
    # obs, ngmix/metacal/bootstrap.py:63-119 +
    # fitting/results.py:1013-1047)
    ("exp-lm mb nband=2", dict(measure="exp-lm", mb=True, nband=2)),
    ("bdf-lm mb nband=2 (bdf truth)", dict(
        measure="bdf-lm", gal_model="bdf", mb=True, nband=2,
        lm_bounds=(
            [-2.0, -2.0, -0.99, -0.99, 1.0e-3, 0.0, 1.0e-3, 1.0e-3],
            [2.0, 2.0, 0.99, 0.99, 20.0, 1.0, 1.0e9, 1.0e9],
        ),
    )),
    # shipped-shape discipline: the headline bench program shape
    # (max_chunk default 10240) must always be in the validated set -
    # round 4's regression shipped at a shape no sweep row ever ran
    ("exp-lm het SHIPPED-SHAPE Bsz=10240", dict(
        measure="exp-lm", Bsz=10240, nbatch=12,
    )),
    # realistic survey noise (s2n p16/p50/p84 = 11/15/20): the regime
    # where fixnoise does real work. m via +-g shear cancellation with
    # shared noise realizations (run_config_pm): the residual per-lane
    # sigma(e+ - e-) ~ 0.012 (99.6% of the raw noise cancels), so
    # 500 x 2048 stamps/run resolves m to ~1e-3 at 99.7%.
    ("exp-lm het s2n~15 (pm)", dict(
        _pm=True, measure="exp-lm", noise=0.55, Bsz=2048, nbatch=500,
    )),
    ("pgauss het s2n~15 (pm)", dict(
        _pm=True, measure="pgauss", noise=0.55, Bsz=2048, nbatch=500,
    )),
    # production-style selection (s2n > 10 binds on ~p16 of the
    # population) through the Sheldon & Huff selection response
    ("exp-lm select(s2n>10) s2n~15 (pm)", dict(
        _pm=True, measure="exp-lm", noise=0.55, select=True,
        Bsz=2048, nbatch=500,
    )),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--measure", default="exp-lm")
    p.add_argument("--psf-mode", default="gauss")
    p.add_argument("--homog", action="store_true")
    p.add_argument("--wcs", default="diag", choices=["diag", "sheared"])
    p.add_argument("--types", type=int, default=5, choices=[5, 9])
    p.add_argument("--select", action="store_true")
    p.add_argument("--select-cut", type=float, default=10.0,
                   help="pm-mode s2n selection threshold (a cut that "
                        "never binds, e.g. 2.0, is the estimator "
                        "null-control)")
    p.add_argument("--mb", action="store_true")
    p.add_argument("--nband", type=int, default=1)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--nbatch", type=int, default=50)
    p.add_argument("--pm", action="store_true",
                   help="use the +-g shared-noise cancellation "
                        "estimator (run_config_pm)")
    p.add_argument("--noise", type=float, default=None,
                   help="per-pixel sim noise (default: the high-s2n "
                        "1e-4; pm mode defaults to 0.55)")
    p.add_argument("--sweep", action="store_true")
    p.add_argument("--sweep-row", default=None,
                   help="run a single sweep entry by its label")
    a = p.parse_args()

    def prepare_row(kw):
        """one preparation path for --sweep and --sweep-row, so a
        single row always runs at the same scale as the full sweep"""
        kw = dict(kw)
        kw.setdefault("Bsz", a.batch)
        kw.setdefault("nbatch", a.nbatch)
        if kw.get("mb"):
            kw["Bsz"] = min(kw["Bsz"], 1024)  # E>=2 multiplies stamps
        return kw

    if a.sweep_row is not None:
        labels = {label: kw for label, kw in SWEEP}
        if a.sweep_row not in labels:
            raise SystemExit(
                "unknown sweep row %r; known: %s"
                % (a.sweep_row, sorted(labels)))
        print("== %s" % a.sweep_row, flush=True)
        kw = prepare_row(labels[a.sweep_row])
        fn = run_config_pm if kw.pop("_pm", False) else run_config
        r = fn(**kw)
        print({k: v for k, v in r.items()})
        return

    if a.sweep:
        rows = []
        for label, kw in SWEEP:
            kw = prepare_row(kw)
            print("== %s" % label, flush=True)
            t0 = time.time()
            fn = run_config_pm if kw.pop("_pm", False) else run_config
            try:
                r = fn(**kw)
            except Exception as e:  # keep sweeping
                print("  FAILED: %r" % e)
                rows.append((label, None))
                continue
            r["wall"] = time.time() - t0
            rows.append((label, r))
        print("\n| config | n | m | 3 sigma | R11 | gate |")
        print("|---|---|---|---|---|---|")
        for label, r in rows:
            if r is None:
                print("| %s | - | FAILED | - | - | NO |" % label)
                continue
            # gate: |m| below 1e-3, or statistically consistent with it
            gate = (
                "ok" if abs(r["m"]) < max(1e-3, r["se_m"])
                else "**FAIL**"
            )
            print(
                "| %s | %d | %.2e | %.1e | %.3f | %s |"
                % (label, r["n"], r["m"], r["se_m"], r["R11"], gate)
            )
        return

    if a.pm:
        run_config_pm(
            measure=a.measure, wcs=a.wcs, select=a.select,
            Bsz=a.batch, nbatch=a.nbatch,
            noise=0.55 if a.noise is None else a.noise,
            select_cut=a.select_cut,
        )
        return
    run_config(
        measure=a.measure, psf_mode=a.psf_mode, het=not a.homog,
        wcs=a.wcs, types=a.types, select=a.select, mb=a.mb,
        nband=a.nband, Bsz=a.batch, nbatch=a.nbatch, noise=a.noise,
    )


if __name__ == "__main__":
    main()
