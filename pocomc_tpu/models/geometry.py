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


def _fit_geometry_impl(theta, weights, key):
    """Full geometry fit as ONE traced program (called under jit)."""
    if weights is None:
        normal_mean, normal_cov = _unweighted_moments(theta)
        t_mean, t_cov, t_nu = fit_mvstud(theta)
    else:
        normal_mean, normal_cov = _weighted_moments(theta, weights)
        idx = systematic_resample_jax(key, theta.shape[0], weights)
        t_mean, t_cov, t_nu = fit_mvstud(theta[idx])
    t_nu = jnp.where(jnp.isfinite(t_nu), t_nu, 1e6)
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
