"""Multivariate Student-t EM fit, jittable.

Re-design of reference /root/reference/pocomc/student.py:5-85 for XLA:
  - the EM loop becomes `lax.while_loop` with a max-iteration bound,
  - the scipy.optimize.bisect root-solve for the degrees-of-freedom nu
    (student.py:41-51) becomes a fixed-count bisection in log(nu) space
    (monotone bracketing over nu in [1e-8, 1e15] — far wider than any
    statistically meaningful nu, and fixed-shape for the compiler),
  - the per-sample Mahalanobis terms use a Cholesky solve batched over the
    whole sample set instead of a host loop.

Semantics preserved: init mu = median, Sigma = cov*(n-1)/n + diag(var)/n,
nu = 20; E-step weights w_i = (nu + d)/(nu + delta_i); nu from the digamma
fixed-point equation; nu -> +inf (Gaussian limit) when the equation has no
root, in which case mu/Sigma keep their current values (the reference
returns early at student.py:69-70).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma

_NU_LOG_LO = -6.9   # log(1e-3)
_NU_LOG_HI = 10.3   # log(~3e4); above this f32 cannot resolve the equation
_BISECT_ITERS = 60


def _log_minus_digamma(x):
    """h(x) = log(x) - digamma(x) > 0, cancellation-free.

    Direct subtraction for small x; asymptotic series h(x) = 1/(2x) +
    1/(12 x^2) - 1/(120 x^4) + ... for large x, where the direct form
    loses all significant digits in float32.
    """
    direct = jnp.log(x) - digamma(x)
    inv = 1.0 / jnp.maximum(x, 1e-30)
    series = 0.5 * inv + inv * inv / 12.0 - inv**4 / 120.0
    return jnp.where(x < 32.0, direct, series)


def _nu_equation(log_nu, d, delta, n):
    """EM fixed-point equation for nu (reference student.py:42-45),
    rewritten cancellation-free:

      f(nu) = h(nu/2) - h((nu+d)/2) + mean(log1p(e) - e),
      e_i   = (d - delta_i) / (nu + delta_i),   w_i = 1 + e_i,

    algebraically identical to -psi(nu/2) + log(nu/2) + mean(log w)
    - mean(w) + 1 + psi((nu+d)/2) - log((nu+d)/2) but numerically stable
    for large nu, where the naive form is pure rounding noise.
    """
    nu = jnp.exp(log_nu)
    e = (d - delta) / (nu + delta)
    tail = jnp.sum(jnp.log1p(e) - e) / n
    return _log_minus_digamma(nu / 2.0) - _log_minus_digamma((nu + d) / 2.0) + tail


def _solve_nu(d, delta, n):
    """Fixed-count bisection for nu in log space. Returns +inf if no root."""
    f_hi = _nu_equation(jnp.asarray(_NU_LOG_HI, delta.dtype), d, delta, n)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        f_mid = _nu_equation(mid, d, delta, n)
        # f is decreasing at the root from + to - as nu grows
        lo = jnp.where(f_mid > 0, mid, lo)
        hi = jnp.where(f_mid > 0, hi, mid)
        return lo, hi

    lo0 = jnp.asarray(_NU_LOG_LO, delta.dtype)
    hi0 = jnp.asarray(_NU_LOG_HI, delta.dtype)
    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo0, hi0))
    nu = jnp.exp(0.5 * (lo + hi))
    return jnp.where(f_hi >= 0, jnp.inf, nu)


@partial(jax.jit, static_argnames=("max_iter",))
def fit_mvstud(data, tolerance=1e-6, max_iter=100):
    """EM fit of a multivariate Student-t.

    Parameters
    ----------
    data : (n, d) array of samples.

    Returns
    -------
    mu : (d,), Sigma : (d, d), nu : scalar (possibly +inf).
    """
    data = jnp.asarray(data)
    n, d = data.shape
    nf = jnp.asarray(n, data.dtype)

    mu0 = jnp.median(data, axis=0)
    diffs0 = data - jnp.mean(data, axis=0)
    cov0 = diffs0.T @ diffs0 / n  # == np.cov * (n-1)/n
    sigma0 = cov0 + jnp.diag(jnp.var(data, axis=0)) / n
    nu0 = jnp.asarray(20.0, data.dtype)

    def mahalanobis(mu, sigma):
        diffs = data - mu  # (n, d)
        chol = jnp.linalg.cholesky(sigma)
        y = jax.scipy.linalg.solve_triangular(chol, diffs.T, lower=True)  # (d, n)
        return jnp.sum(y * y, axis=0)  # (n,)

    def cond(state):
        mu, sigma, nu, last_nu, i, done = state
        return (~done) & (jnp.abs(last_nu - nu) > tolerance) & (i < max_iter)

    def body(state):
        mu, sigma, nu, last_nu, i, done = state
        delta = mahalanobis(mu, sigma)
        nu_new = _solve_nu(jnp.asarray(d, data.dtype), delta, nf)
        is_inf = ~jnp.isfinite(nu_new)

        w = (nu_new + d) / (nu_new + delta)  # (n,)
        sigma_new = (w[:, None] * (data - mu)).T @ (data - mu) / n
        mu_new = jnp.sum(w[:, None] * data, axis=0) / jnp.sum(w)

        # On nu -> inf the reference returns the PREVIOUS mu/Sigma.
        mu_out = jnp.where(is_inf, mu, mu_new)
        sigma_out = jnp.where(is_inf, sigma, sigma_new)
        nu_out = jnp.where(is_inf, jnp.inf, nu_new)
        return mu_out, sigma_out, nu_out, nu, i + 1, done | is_inf

    init = (mu0, sigma0, nu0, jnp.asarray(0.0, data.dtype), 0, jnp.asarray(False))
    mu, sigma, nu, _, _, _ = jax.lax.while_loop(cond, body, init)
    return mu, sigma, nu
