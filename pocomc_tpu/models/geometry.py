"""Proposal geometry: weighted Gaussian moments + Student-t EM fit.

Mirrors reference /root/reference/pocomc/geometry.py:26-59: `fit` learns
(a) weighted normal mean/cov and (b) a Student-t (mu, Sigma, nu) on
systematically-resampled points when weights are given; nu is clamped to
1e6 when the EM returns a non-finite value.

The fit itself is a single jitted device program (`fit_geometry_jax`);
`Geometry` is a thin host container for the resulting arrays, which the
MCMC kernels consume directly as jit arguments (pre-factorized: Cholesky
and inverse are computed here once per SMC iteration instead of inside the
kernel loop as the reference does at mcmc.py:67-68).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .student import fit_mvstud
from ..ops.resampling import systematic_resample_jax


def _weighted_moments(theta, weights):
    """Weighted mean and covariance with np.cov(aweights=w, ddof=1) norm."""
    w = weights / jnp.sum(weights)
    mean = jnp.sum(w[:, None] * theta, axis=0)
    diffs = theta - mean
    v1 = 1.0  # sum of normalized weights
    v2 = jnp.sum(w * w)
    cov = (w[:, None] * diffs).T @ diffs / (v1 - v2 / v1)
    return mean, cov


def _unweighted_moments(theta):
    mean = jnp.mean(theta, axis=0)
    diffs = theta - mean
    n = theta.shape[0]
    cov = diffs.T @ diffs / (n - 1)
    return mean, cov


def _lw_lambda(x, mean, cov):
    """Ledoit-Wolf (2004) shrinkage intensity toward the scaled identity,
    computed from the same points the covariance was estimated from.

    Rationale (measured, RESULTS.md round 3 "geometry shrinkage"): the
    t-pCN Metropolis ratio compares the true tempered target against the
    fitted t-geometry, so COVARIANCE ESTIMATION NOISE is pure proposal
    misfit — with n samples in d dimensions the Wishart fluctuation
    alone contributes ~sqrt(d^2/n)/2 nats of log-density scatter (0.8
    nats at the gauss50 working point d=50, n=2048), which collapses the
    misfit-adaptive sigma cap and with it the sweep's decorrelation
    rate. LW shrinkage removes the noise floor while its intensity
    self-scales to ~0 when n >> d^2 or when the measured dispersion is
    real structure (the b^2/d^2 ratio), so well-resolved fits are left
    untouched."""
    d = cov.shape[0]
    n = x.shape[0]
    mu = jnp.trace(cov) / d
    xc = x - mean
    # d2 = ||cov - mu I||_F^2 / d  (dispersion: structure + noise)
    d2 = (jnp.sum(cov * cov) - d * mu ** 2) / d
    # b2 = (1/n^2) sum_k ||x_k x_k^T - cov||_F^2 / d  (noise estimate)
    q = jnp.sum(xc * xc, axis=1)                    # x_k^T x_k
    xsx = jnp.einsum("ki,ij,kj->k", xc, cov, xc)    # x_k^T cov x_k
    # float denominator: n**2*d as a Python int overflows the int32
    # canonicalization once the history exceeds ~sqrt(2^31/d) rows
    b2 = (jnp.sum(q ** 2) - 2.0 * jnp.sum(xsx)
          + n * jnp.sum(cov * cov)) / (float(n) ** 2 * d)
    b2 = jnp.minimum(b2, d2)
    return jnp.where(d2 > 0, b2 / jnp.maximum(d2, 1e-30), 0.0)


def _lw_shrink(cov, lam):
    d = cov.shape[0]
    mu = jnp.trace(cov) / d
    return (1.0 - lam) * cov + lam * mu * jnp.eye(d, dtype=cov.dtype)


def _fit_geometry_impl(theta, weights, key):
    """Full geometry fit as ONE traced program (called under jit)."""
    if weights is None:
        normal_mean, normal_cov = _unweighted_moments(theta)
        t_mean, t_cov, t_nu = fit_mvstud(theta)
        pts = theta
    else:
        normal_mean, normal_cov = _weighted_moments(theta, weights)
        idx = systematic_resample_jax(key, theta.shape[0], weights)
        pts = theta[idx]
        t_mean, t_cov, t_nu = fit_mvstud(pts)
    t_nu = jnp.where(jnp.isfinite(t_nu), t_nu, 1e6)
    # Lower clamp at the Cauchy (nu=1): the EM can legitimately drive
    # nu -> 1e-3 on a degenerate population (duplicate spike + a few
    # blown-up outliers — measured: cosmo30 seed 1, RESULTS.md round 5
    # "cosmo30 seed-1 collapse"), and a sub-Cauchy proposal makes the
    # t-pCN correction terms near-singular (log1p(q/nu) with q/nu
    # overflowing f32 -> inf -> NaN accept ratios -> frozen kernel).
    # nu=1 is the heaviest-tailed proposal the kernel ever needs; the
    # clamp changes nothing on healthy fits (observed nu >= ~200).
    t_nu = jnp.maximum(t_nu, 1.0)
    # Ledoit-Wolf shrinkage of both proposal covariances (see _lw_lambda).
    # The t intensity is computed on the EM-WEIGHTED residuals: the EM
    # scale is Sigma = (1/n) sum_k w_k xc_k xc_k^T with
    # w = (nu+d)/(nu+delta), so y = sqrt(w) * xc has sample second moment
    # exactly Sigma and the LW fourth-moment noise estimate is consistent
    # with the estimator being shrunk. Feeding the RAW points would
    # kurtosis-inflate the noise term b2 on genuinely heavy-tailed fits
    # (nu ~ 3-6, where E[xx^T] = nu/(nu-2) * Sigma != Sigma), saturating
    # lam_t and collapsing an anisotropic t scale toward identity on
    # exactly the targets the t geometry exists for. nu -> 1e6 gives
    # w -> 1 (the plain Gaussian intensity). The weights are recomputed
    # post-hoc at the FINAL (mu, Sigma, nu) rather than returned by
    # fit_mvstud (whose (mu, Sigma, nu) return is reference parity,
    # SURVEY §2.7): at the EM fixed point the two coincide, and the
    # extra d x d cholesky + one triangular solve is negligible next to
    # the EM's own per-iteration cost.
    d = pts.shape[1]
    xc_t = pts - t_mean
    eps_t = 1e-12 * jnp.trace(t_cov) / d
    chol_t = jnp.linalg.cholesky(
        t_cov + eps_t * jnp.eye(d, dtype=t_cov.dtype))
    yt = jax.scipy.linalg.solve_triangular(chol_t, xc_t.T, lower=True)
    delta_t = jnp.sum(yt * yt, axis=0)
    w_em = (t_nu + d) / (t_nu + delta_t)
    lam_t = _lw_lambda(jnp.sqrt(w_em)[:, None] * xc_t, 0.0, t_cov)
    t_cov = _lw_shrink(t_cov, lam_t)
    lam_n = _lw_lambda(pts, normal_mean, normal_cov)
    normal_cov = _lw_shrink(normal_cov, lam_n)
    # Pre-factorize for the kernels (t_cov is SPD by construction).
    eps = 1e-12 * jnp.trace(t_cov) / t_cov.shape[0]
    t_cov_reg = t_cov + eps * jnp.eye(t_cov.shape[0], dtype=t_cov.dtype)
    n_eps = 1e-12 * jnp.trace(normal_cov) / normal_cov.shape[0]
    normal_cov_reg = normal_cov + n_eps * jnp.eye(normal_cov.shape[0], dtype=normal_cov.dtype)
    return dict(
        normal_mean=normal_mean,
        normal_cov=normal_cov,
        normal_chol=jnp.linalg.cholesky(normal_cov_reg),
        t_mean=t_mean,
        t_cov=t_cov,
        t_nu=t_nu,
        t_chol=jnp.linalg.cholesky(t_cov_reg),
        t_inv_cov=jnp.linalg.inv(t_cov_reg),
    )


_fit_geometry_weighted = jax.jit(lambda theta, weights, key:
                                 _fit_geometry_impl(theta, weights, key))
_fit_geometry_unweighted = jax.jit(lambda theta:
                                   _fit_geometry_impl(theta, None, None))


def fit_geometry_jax(theta, weights=None, key=None):
    """Full geometry fit on device, one jitted call. Returns dict of arrays."""
    theta = jnp.asarray(theta)
    if weights is None:
        return _fit_geometry_unweighted(theta)
    if key is None:
        key = jax.random.key(0)
    return _fit_geometry_weighted(theta, jnp.asarray(weights), key)


class Geometry:
    """Host container for proposal-geometry arrays (see module docstring)."""

    def __init__(self):
        self.normal_mean = None
        self.normal_cov = None
        self.normal_chol = None
        self.t_mean = None
        self.t_cov = None
        self.t_nu = None
        self.t_chol = None
        self.t_inv_cov = None

    def fit(self, theta, weights=None, key=None):
        out = fit_geometry_jax(theta, weights=weights, key=key)
        for k, v in out.items():
            setattr(self, k, v)
        return self
