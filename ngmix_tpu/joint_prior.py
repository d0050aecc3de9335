"""Joint (per-model) parameter-vector priors.

Behavior parity with ngmix/joint_prior.py: PriorSimpleSep, PriorBDSep,
PriorBDFSep, PriorGalsimSimpleSep, PriorSpergelSep, PriorCoellipSame.
Each exposes the reference host API (fill_fdiff, get_lnprob_scalar,
sample, bounds) plus the jnp-traced ``fill_fdiff_device`` /
``get_lnprob_scalar_device`` consumed by the LM objective
(fitting/fit_model.py).
"""
import jax.numpy as jnp
import numpy as np

from .gmix.tables import get_coellip_npars


def _sqrt_m2ln(lnp_rows):
    """map ln(p) rows -> sqrt(max(-2 ln p, 0)) pseudo-residuals.

    AD-safe at chi2 = 0 (flat prior regions): the sqrt branch is
    where-guarded so jacfwd gives a 0 derivative there instead of
    inf * 0 = nan.
    """
    chi2 = jnp.clip(-2.0 * jnp.stack(lnp_rows), 0.0, None)
    pos = chi2 > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, chi2, 1.0)), 0.0)


class PriorSimpleSep(object):
    """separable priors on [cen1, cen2, g1, g2, T, F...]
    (ref: joint_prior.py:5-236)"""

    def __init__(self, cen_prior, g_prior, T_prior, F_prior):
        self.cen_prior = cen_prior
        self.g_prior = g_prior
        self.T_prior = T_prior

        if isinstance(F_prior, (list, tuple)):
            self.nband = len(F_prior)
            F_prior = list(F_prior)
        else:
            self.nband = 1
            F_prior = [F_prior]
        self.F_priors = F_prior

        self.set_bounds()

    def set_bounds(self):
        bounds = [(None, None)] * 4
        allp = [self.T_prior] + self.F_priors
        some = False
        for p in allp:
            if p.has_bounds():
                some = True
                bounds.append((p.bounds[0], p.bounds[1]))
            else:
                bounds.append((None, None))
        self.bounds = bounds if some else None

    def get_widths(self, nrand=10000):
        """estimate the width in each dimension"""
        if not hasattr(self, "_sigma_estimates"):
            samples = self.sample(nrand)
            sigmas = samples.std(axis=0)
            sigmas[2] = 2.0
            sigmas[3] = 2.0
            self._sigma_estimates = sigmas
        return self._sigma_estimates

    # --- fdiff ---------------------------------------------------------
    def _fdiff_rows_device(self, pars):
        lnp1, lnp2 = self.cen_prior.get_lnprob_device_sep(pars[0], pars[1])
        rows = [
            lnp1,
            lnp2,
            self.g_prior.get_lnprob_device2d(pars[2], pars[3]),
            self.T_prior.get_lnprob_device(pars[4]),
        ]
        for i in range(self.nband):
            rows.append(self.F_priors[i].get_lnprob_device(pars[5 + i]))
        return _sqrt_m2ln(rows)

    def fill_fdiff_device(self, pars):
        return self._fdiff_rows_device(jnp.asarray(pars))

    def fill_fdiff(self, pars, fdiff):
        rows = np.asarray(self.fill_fdiff_device(jnp.asarray(pars)))
        fdiff[: rows.size] = rows
        return rows.size

    @property
    def n_prior_pars(self):
        return 4 + self.nband

    # --- lnprob --------------------------------------------------------
    def get_lnprob_scalar_device(self, pars):
        lnp = self.cen_prior.get_lnprob_device(pars[0], pars[1])
        lnp += self.g_prior.get_lnprob_device2d(pars[2], pars[3])
        lnp += self.T_prior.get_lnprob_device(pars[4])
        for i in range(self.nband):
            lnp += self.F_priors[i].get_lnprob_device(pars[5 + i])
        return lnp

    def get_lnprob_scalar(self, pars):
        lnp = self.cen_prior.get_lnprob_scalar(pars[0], pars[1])
        lnp += self.g_prior.get_lnprob_scalar2d(pars[2], pars[3])
        lnp += self.T_prior.get_lnprob_scalar(pars[4])
        for i, F_prior in enumerate(self.F_priors):
            lnp += F_prior.get_lnprob_scalar(pars[5 + i])
        return lnp

    def get_prob_scalar(self, pars):
        return np.exp(self.get_lnprob_scalar(pars))

    def get_lnprob_array(self, pars):
        lnp = self.cen_prior.get_lnprob_array(pars[:, 0], pars[:, 1])
        lnp = lnp + self.g_prior.get_lnprob_array2d(pars[:, 2], pars[:, 3])
        lnp = lnp + self.T_prior.get_lnprob_array(pars[:, 4])
        for i in range(self.nband):
            lnp = lnp + self.F_priors[i].get_lnprob_array(pars[:, 5 + i])
        return lnp

    def get_prob_array(self, pars):
        return np.exp(self.get_lnprob_array(pars))

    # --- sampling ------------------------------------------------------
    def sample(self, nrand=None):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        samples = np.zeros((n, 5 + self.nband))
        cen1, cen2 = self.cen_prior.sample(n)
        g1, g2 = self.g_prior.sample2d(n)
        T = self.T_prior.sample(n)
        samples[:, 0] = cen1
        samples[:, 1] = cen2
        samples[:, 2] = g1
        samples[:, 3] = g2
        samples[:, 4] = T
        for i in range(self.nband):
            samples[:, 5 + i] = self.F_priors[i].sample(n)
        return samples[0, :] if is_scalar else samples

    def __repr__(self):
        reps = [str(self.cen_prior), str(self.g_prior), str(self.T_prior)]
        reps += [str(p) for p in self.F_priors]
        return "\n".join(reps)


class PriorGalsimSimpleSep(PriorSimpleSep):
    """same as PriorSimpleSep with r50 in the size slot
    (ref: joint_prior.py:239-264)"""

    def __init__(self, cen_prior, g_prior, r50_prior, F_prior):
        super().__init__(cen_prior, g_prior, r50_prior, F_prior)
        self.r50_prior = r50_prior


class PriorBDSep(PriorSimpleSep):
    """bulge+disk [c1,c2,g1,g2,T,logTratio,fracdev,F...]
    (ref: joint_prior.py:267-481)"""

    def __init__(self, cen_prior, g_prior, T_prior, logTratio_prior,
                 fracdev_prior, F_prior):
        self.cen_prior = cen_prior
        self.g_prior = g_prior
        self.T_prior = T_prior
        self.logTratio_prior = logTratio_prior
        self.fracdev_prior = fracdev_prior
        if isinstance(F_prior, (list, tuple)):
            self.nband = len(F_prior)
            F_prior = list(F_prior)
        else:
            self.nband = 1
            F_prior = [F_prior]
        self.F_priors = F_prior
        self.set_bounds()

    def set_bounds(self):
        bounds = [(None, None)] * 4
        allp = [
            self.T_prior, self.logTratio_prior, self.fracdev_prior
        ] + self.F_priors
        some = False
        for p in allp:
            if p.has_bounds():
                some = True
                bounds.append((p.bounds[0], p.bounds[1]))
            else:
                bounds.append((None, None))
        self.bounds = bounds if some else None

    @property
    def n_prior_pars(self):
        return 6 + self.nband

    def fill_fdiff_device(self, pars):
        """bd priors use signed get_fdiff rows
        (ref: joint_prior.py:364-400)"""
        f1, f2 = self.cen_prior.get_fdiff_device(pars[0], pars[1])
        rows = [
            f1,
            f2,
            self.g_prior.get_fdiff_device(pars[2], pars[3]),
            self.T_prior.get_fdiff_device(pars[4]),
            self.logTratio_prior.get_fdiff_device(pars[5]),
            self.fracdev_prior.get_fdiff_device(pars[6]),
        ]
        for i in range(self.nband):
            rows.append(self.F_priors[i].get_fdiff_device(pars[7 + i]))
        return jnp.stack(rows)

    def get_lnprob_scalar_device(self, pars):
        lnp = self.cen_prior.get_lnprob_device(pars[0], pars[1])
        lnp += self.g_prior.get_lnprob_device2d(pars[2], pars[3])
        lnp += self.T_prior.get_lnprob_device(pars[4])
        lnp += self.logTratio_prior.get_lnprob_device(pars[5])
        lnp += self.fracdev_prior.get_lnprob_device(pars[6])
        for i in range(self.nband):
            lnp += self.F_priors[i].get_lnprob_device(pars[7 + i])
        return lnp

    def get_lnprob_scalar(self, pars):
        lnp = self.cen_prior.get_lnprob_scalar(pars[0], pars[1])
        lnp += self.g_prior.get_lnprob_scalar2d(pars[2], pars[3])
        lnp += self.T_prior.get_lnprob_scalar(pars[4])
        lnp += self.logTratio_prior.get_lnprob_scalar(pars[5])
        lnp += self.fracdev_prior.get_lnprob_scalar(pars[6])
        for i, F_prior in enumerate(self.F_priors):
            lnp += F_prior.get_lnprob_scalar(pars[7 + i])
        return lnp

    def get_lnprob_array(self, pars):
        lnp = self.cen_prior.get_lnprob_array(pars[:, 0], pars[:, 1])
        lnp = lnp + self.g_prior.get_lnprob_array2d(pars[:, 2], pars[:, 3])
        lnp = lnp + self.T_prior.get_lnprob_array(pars[:, 4])
        lnp = lnp + self.logTratio_prior.get_lnprob_array(pars[:, 5])
        lnp = lnp + self.fracdev_prior.get_lnprob_array(pars[:, 6])
        for i in range(self.nband):
            lnp = lnp + self.F_priors[i].get_lnprob_array(pars[:, 7 + i])
        return lnp

    def sample(self, nrand=None):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        samples = np.zeros((n, 7 + self.nband))
        cen1, cen2 = self.cen_prior.sample(n)
        g1, g2 = self.g_prior.sample2d(n)
        samples[:, 0] = cen1
        samples[:, 1] = cen2
        samples[:, 2] = g1
        samples[:, 3] = g2
        samples[:, 4] = self.T_prior.sample(n)
        samples[:, 5] = self.logTratio_prior.sample(n)
        samples[:, 6] = self.fracdev_prior.sample(n)
        for i in range(self.nband):
            samples[:, 7 + i] = self.F_priors[i].sample(n)
        return samples[0, :] if is_scalar else samples


class PriorBDFSep(PriorSimpleSep):
    """bdf [c1,c2,g1,g2,T,fracdev,F...] (ref: joint_prior.py:484-674)"""

    def __init__(self, cen_prior, g_prior, T_prior, fracdev_prior, F_prior):
        self.cen_prior = cen_prior
        self.g_prior = g_prior
        self.T_prior = T_prior
        self.fracdev_prior = fracdev_prior
        if isinstance(F_prior, (list, tuple)):
            self.nband = len(F_prior)
            F_prior = list(F_prior)
        else:
            self.nband = 1
            F_prior = [F_prior]
        self.F_priors = F_prior
        self.set_bounds()

    def set_bounds(self):
        bounds = [(None, None)] * 4
        allp = [self.T_prior, self.fracdev_prior] + self.F_priors
        some = False
        for p in allp:
            if p.has_bounds():
                some = True
                bounds.append((p.bounds[0], p.bounds[1]))
            else:
                bounds.append((None, None))
        self.bounds = bounds if some else None

    @property
    def n_prior_pars(self):
        return 5 + self.nband

    def fill_fdiff_device(self, pars):
        f1, f2 = self.cen_prior.get_fdiff_device(pars[0], pars[1])
        rows = [
            f1,
            f2,
            self.g_prior.get_fdiff_device(pars[2], pars[3]),
            self.T_prior.get_fdiff_device(pars[4]),
            self.fracdev_prior.get_fdiff_device(pars[5]),
        ]
        for i in range(self.nband):
            rows.append(self.F_priors[i].get_fdiff_device(pars[6 + i]))
        return jnp.stack(rows)

    def get_lnprob_scalar_device(self, pars):
        lnp = self.cen_prior.get_lnprob_device(pars[0], pars[1])
        lnp += self.g_prior.get_lnprob_device2d(pars[2], pars[3])
        lnp += self.T_prior.get_lnprob_device(pars[4])
        lnp += self.fracdev_prior.get_lnprob_device(pars[5])
        for i in range(self.nband):
            lnp += self.F_priors[i].get_lnprob_device(pars[6 + i])
        return lnp

    def get_lnprob_scalar(self, pars):
        lnp = self.cen_prior.get_lnprob_scalar(pars[0], pars[1])
        lnp += self.g_prior.get_lnprob_scalar2d(pars[2], pars[3])
        lnp += self.T_prior.get_lnprob_scalar(pars[4])
        lnp += self.fracdev_prior.get_lnprob_scalar(pars[5])
        for i, F_prior in enumerate(self.F_priors):
            lnp += F_prior.get_lnprob_scalar(pars[6 + i])
        return lnp

    def get_lnprob_array(self, pars):
        lnp = self.cen_prior.get_lnprob_array(pars[:, 0], pars[:, 1])
        lnp = lnp + self.g_prior.get_lnprob_array2d(pars[:, 2], pars[:, 3])
        lnp = lnp + self.T_prior.get_lnprob_array(pars[:, 4])
        lnp = lnp + self.fracdev_prior.get_lnprob_array(pars[:, 5])
        for i in range(self.nband):
            lnp = lnp + self.F_priors[i].get_lnprob_array(pars[:, 6 + i])
        return lnp

    def sample(self, nrand=None):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        samples = np.zeros((n, 6 + self.nband))
        cen1, cen2 = self.cen_prior.sample(n)
        g1, g2 = self.g_prior.sample2d(n)
        samples[:, 0] = cen1
        samples[:, 1] = cen2
        samples[:, 2] = g1
        samples[:, 3] = g2
        samples[:, 4] = self.T_prior.sample(n)
        samples[:, 5] = self.fracdev_prior.sample(n)
        for i in range(self.nband):
            samples[:, 6 + i] = self.F_priors[i].sample(n)
        return samples[0, :] if is_scalar else samples


class PriorSpergelSep(PriorBDFSep):
    """spergel [c1,c2,g1,g2,r50,nu,F...] (ref: joint_prior.py:677-871)"""

    def __init__(self, cen_prior, g_prior, r50_prior, nu_prior, F_prior):
        super().__init__(
            cen_prior, g_prior, r50_prior, nu_prior, F_prior
        )
        self.r50_prior = r50_prior
        self.nu_prior = nu_prior


class PriorCoellipSame(PriorSimpleSep):
    """coelliptical gaussians with shared T/F priors
    (ref: joint_prior.py:874-1031)"""

    def __init__(self, ngauss, cen_prior, g_prior, T_prior, F_prior):
        self.ngauss = ngauss
        self.npars = get_coellip_npars(ngauss)
        super().__init__(cen_prior, g_prior, T_prior, F_prior)
        if self.nband != 1:
            raise ValueError("coellip only supports one band")

    def set_bounds(self):
        ngauss = self.ngauss
        bounds = [(None, None)] * 4
        some = False
        for p in [self.T_prior] + self.F_priors:
            if p.has_bounds():
                some = True
                pb = (p.bounds[0], p.bounds[1])
            else:
                pb = (None, None)
            bounds += [pb] * ngauss
        self.bounds = bounds if some else None

    @property
    def n_prior_pars(self):
        return 3 + 2 * self.ngauss

    def fill_fdiff_device(self, pars):
        ngauss = self.ngauss
        lnp1, lnp2 = self.cen_prior.get_lnprob_device_sep(pars[0], pars[1])
        rows = [lnp1, lnp2, self.g_prior.get_lnprob_device2d(pars[2], pars[3])]
        for i in range(ngauss):
            rows.append(self.T_prior.get_lnprob_device(pars[4 + i]))
        for i in range(ngauss):
            rows.append(
                self.F_priors[0].get_lnprob_device(pars[4 + ngauss + i])
            )
        return _sqrt_m2ln(rows)

    def get_lnprob_scalar(self, pars):
        if len(pars) != self.npars:
            raise ValueError(
                "pars size %d expected %d" % (len(pars), self.npars)
            )
        ngauss = self.ngauss
        lnp = self.cen_prior.get_lnprob_scalar(pars[0], pars[1])
        lnp += self.g_prior.get_lnprob_scalar2d(pars[2], pars[3])
        for i in range(ngauss):
            lnp += self.T_prior.get_lnprob_scalar(pars[4 + i])
        for i in range(ngauss):
            lnp += self.F_priors[0].get_lnprob_scalar(pars[4 + ngauss + i])
        return lnp

    def get_lnprob_scalar_device(self, pars):
        ngauss = self.ngauss
        lnp = self.cen_prior.get_lnprob_device(pars[0], pars[1])
        lnp += self.g_prior.get_lnprob_device2d(pars[2], pars[3])
        for i in range(ngauss):
            lnp += self.T_prior.get_lnprob_device(pars[4 + i])
        for i in range(ngauss):
            lnp += self.F_priors[0].get_lnprob_device(pars[4 + ngauss + i])
        return lnp

    def sample(self, nrand=None):
        is_scalar = nrand is None
        n = 1 if is_scalar else nrand
        ngauss = self.ngauss
        samples = np.zeros((n, self.npars))
        cen1, cen2 = self.cen_prior.sample(n)
        g1, g2 = self.g_prior.sample2d(n)
        samples[:, 0] = cen1
        samples[:, 1] = cen2
        samples[:, 2] = g1
        samples[:, 3] = g2
        samples[:, 4] = self.T_prior.sample(n)
        for i in range(ngauss):
            samples[:, 4 + i] += self.T_prior.sample(n)
        for i in range(ngauss):
            samples[:, 4 + ngauss + i] = self.F_priors[0].sample(n)
        return samples[0, :] if is_scalar else samples
