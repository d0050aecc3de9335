"""N-dimensional gaussian mixtures for empirical priors (GMixND).

TPU re-design of ngmix/gmix_ndim/gmix_ndim.py:14-435 +
gmix_ndim_nb.py: the scalar log-sum-exp loops become batched jnp
einsums, so prob/lnprob evaluate over whole catalogs (and trace into
jitted priors). Fitting uses sklearn when available; persistence uses
fitsio when available with an npz fallback.
"""
import jax.numpy as jnp
import numpy as np

__all__ = ["GMixND"]


class GMixND(object):
    """gaussian mixture in arbitrary dimensions"""

    def __init__(self, weights=None, means=None, covars=None, file=None,
                 rng=None):
        if rng is None:
            rng = np.random.RandomState()
        self.rng = rng

        if file is not None:
            self.load_mixture(file)
        else:
            if weights is not None and means is not None and covars is not None:
                self.set_mixture(weights, means, covars)
            elif weights is not None or means is not None or covars is not None:
                raise RuntimeError("send all or none of weights, means, covars")

    def set_mixture(self, weights, means, covars):
        weights = np.array(weights, dtype="f8", copy=True)
        means = np.array(means, dtype="f8", copy=True)
        covars = np.array(covars, dtype="f8", copy=True)

        if len(means.shape) == 1:
            means = means.reshape((means.size, 1))
        if len(covars.shape) == 1:
            covars = covars.reshape((covars.size, 1, 1))

        self.weights = weights
        self.means = means
        self.covars = covars
        self.ngauss = weights.size
        self.ndim = means.shape[1]
        self._calc_icovars_and_norms()

    def _calc_icovars_and_norms(self):
        twopi = 2.0 * np.pi
        norms = np.zeros(self.ngauss)
        icovars = np.zeros((self.ngauss, self.ndim, self.ndim))
        for i in range(self.ngauss):
            cov = self.covars[i]
            icovars[i] = np.linalg.inv(cov)
            det = np.linalg.det(cov)
            norms[i] = 1.0 / np.sqrt(twopi**self.ndim * det)
        self.norms = norms
        self.pnorms = norms * self.weights
        self.log_pnorms = np.log(self.pnorms)
        self.icovars = icovars

    # --- evaluation (batched, jnp) ------------------------------------
    def _lnprob_device(self, pars, component=None):
        """pars [..., ndim] -> lnprob [...] via log-sum-exp einsum"""
        pars = jnp.asarray(pars)
        means = jnp.asarray(self.means)
        icov = jnp.asarray(self.icovars)
        logpn = jnp.asarray(self.log_pnorms)

        xdiff = pars[..., None, :] - means  # [..., ngauss, ndim]
        chi2 = jnp.einsum("...gi,gij,...gj->...g", xdiff, icov, xdiff)
        lnp = -0.5 * chi2 + logpn  # [..., ngauss]
        if component is not None:
            return lnp[..., component]
        m = jnp.max(lnp, axis=-1)
        return jnp.log(
            jnp.sum(jnp.exp(lnp - m[..., None]), axis=-1)
        ) + m

    get_lnprob_device = _lnprob_device

    def get_lnprob_scalar(self, pars_in, component=None):
        pars = np.array(pars_in, dtype="f8", ndmin=1)
        return float(self._lnprob_device(pars, component=component))

    def get_prob_scalar(self, pars_in, component=None):
        return float(np.exp(self.get_lnprob_scalar(pars_in, component)))

    def get_lnprob_array(self, pars, component=None):
        pars = np.array(pars, dtype="f8", ndmin=1)
        if len(pars.shape) == 1:
            pars = pars[:, np.newaxis]
        return np.asarray(self._lnprob_device(pars, component=component))

    def get_prob_array(self, pars, component=None):
        return np.exp(self.get_lnprob_array(pars, component=component))

    # --- fitting / sampling --------------------------------------------
    @property
    def converged(self):
        return self._gmm.converged_

    def fit(self, data, ngauss, n_iter=5000, min_covar=1.0e-6, **keys):
        """fit with sklearn GaussianMixture (offline training path)"""
        from sklearn.mixture import GaussianMixture

        data = np.asarray(data)
        if len(data.shape) == 1:
            data = data[:, np.newaxis]

        gmm = GaussianMixture(
            n_components=ngauss,
            max_iter=n_iter,
            reg_covar=min_covar,
            covariance_type="full",
            random_state=self.rng,
        )
        gmm.fit(data)
        if not gmm.converged_:
            print("DID NOT CONVERGE")
        self._gmm = gmm
        self.set_mixture(gmm.weights_, gmm.means_, gmm.covariances_)

    def sample(self, n=None):
        """sample the mixture: pick components by weight, then draw
        from the component gaussians"""
        is_one = n is None
        nuse = 1 if is_one else n
        rng = self.rng
        comps = rng.choice(self.ngauss, size=nuse, p=self.weights / self.weights.sum())
        samples = np.zeros((nuse, self.ndim))
        for i, c in enumerate(comps):
            samples[i] = rng.multivariate_normal(
                self.means[c], self.covars[c]
            )
        if self.ndim == 1:
            samples = samples[:, 0]
        return samples[0] if is_one else samples

    # --- persistence ----------------------------------------------------
    def save_mixture(self, fname):
        """FITS via fitsio when available, npz otherwise"""
        try:
            import fitsio

            with fitsio.FITS(fname, "rw", clobber=True) as fits:
                fits.write(self.weights, extname="weights")
                fits.write(self.means, extname="means")
                fits.write(self.covars, extname="covars")
        except ImportError:
            np.savez(
                fname, weights=self.weights, means=self.means,
                covars=self.covars,
            )

    def load_mixture(self, fname):
        try:
            import fitsio

            with fitsio.FITS(fname) as fits:
                weights = fits["weights"].read()
                means = fits["means"].read()
                covars = fits["covars"].read()
        except ImportError:
            data = np.load(
                fname if str(fname).endswith(".npz") else str(fname) + ".npz"
            )
            weights = data["weights"]
            means = data["means"]
            covars = data["covars"]
        self.set_mixture(weights, means, covars)
