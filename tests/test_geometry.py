"""Geometry fit: weighted moments, Student-t EM integration, and the
Ledoit-Wolf shrinkage of the proposal covariances (RESULTS.md round 3
"geometry shrinkage"). Reference parity anchor:
/root/reference/pocomc/geometry.py:26-59 (fit contract)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pocomc_tpu.models.geometry import (
    Geometry, fit_geometry_jax, _lw_lambda, _lw_shrink)


def test_fit_large_history_no_int_overflow():
    # n^2 * d as a Python int must not be canonicalized to int32:
    # n=32768, d=4 -> n^2*d = 4.3e9 > 2^31 (regression: OverflowError
    # at geometry.py _lw_lambda on big training histories).
    rng = np.random.default_rng(0)
    theta = rng.normal(size=(32768, 4)).astype(np.float32)
    out = fit_geometry_jax(theta)
    assert np.all(np.isfinite(np.asarray(out["t_chol"])))


def test_lw_lambda_noise_dominated_vs_structured():
    rng = np.random.default_rng(1)
    d = 50
    # Pure-noise regime: true cov = I, n ~ 40d -> dispersion is mostly
    # Wishart noise, lambda should be large.
    x = rng.normal(size=(2048, d)).astype(np.float32)
    mean = x.mean(0)
    cov = np.cov(x, rowvar=False).astype(np.float32)
    lam_noise = float(_lw_lambda(jnp.asarray(x), jnp.asarray(mean),
                                 jnp.asarray(cov)))
    # Structured regime: strongly anisotropic cov, huge n -> noise share
    # vanishes, lambda should be small.
    scales = np.linspace(1.0, 10.0, d)
    x2 = (rng.normal(size=(60000, d)) * scales).astype(np.float32)
    mean2 = x2.mean(0)
    cov2 = np.cov(x2, rowvar=False).astype(np.float32)
    lam_struct = float(_lw_lambda(jnp.asarray(x2), jnp.asarray(mean2),
                                  jnp.asarray(cov2)))
    assert 0.0 <= lam_struct <= 1.0 and 0.0 <= lam_noise <= 1.0
    assert lam_noise > 0.3
    assert lam_struct < 0.05
    assert lam_noise > 5 * lam_struct


def test_lw_shrink_preserves_trace_and_interpolates():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(8, 8))
    cov = jnp.asarray(a @ a.T + np.eye(8), dtype=jnp.float32)
    for lam in (0.0, 0.3, 1.0):
        s = _lw_shrink(cov, jnp.float32(lam))
        np.testing.assert_allclose(np.trace(np.asarray(s)),
                                   np.trace(np.asarray(cov)), rtol=1e-5)
    full = _lw_shrink(cov, jnp.float32(1.0))
    np.testing.assert_allclose(
        np.asarray(full),
        np.eye(8) * float(jnp.trace(cov)) / 8.0, rtol=1e-5, atol=1e-5)


def test_lw_heavy_tail_preserves_t_anisotropy():
    """The t-branch LW intensity must be computed on the EM-weighted
    residuals, not the raw points: raw t_4 samples kurtosis-inflate the
    fourth-moment noise estimate and would shrink a genuinely
    anisotropic t scale toward identity (review round 3). With the
    weighted-residual intensity the fitted scale keeps the true
    anisotropy."""
    rng = np.random.default_rng(7)
    d, n, nu_true = 8, 4096, 4.0
    scales = np.linspace(1.0, 6.0, d)
    g_z = rng.normal(size=(n, d)) * scales
    chi = rng.chisquare(nu_true, size=(n, 1)) / nu_true
    x = (g_z / np.sqrt(chi)).astype(np.float32)   # t_4, scale diag(scales^2)
    out = fit_geometry_jax(x)
    nu = float(out["t_nu"])
    assert 2.5 < nu < 7.0  # EM recovered the heavy tail
    diag = np.sqrt(np.diag(np.asarray(out["t_cov"], dtype=np.float64)))
    ratio = diag[-1] / diag[0]
    # true per-dim scale ratio is 6; the raw-point intensity (lam 0.09 vs
    # the weighted 0.003) crushes it to 3.8 — measured, this seed
    assert ratio > 4.0


def test_geometry_fit_contract_weighted():
    # fit() populates every kernel-facing array; t_chol solves t_cov.
    rng = np.random.default_rng(3)
    theta = rng.normal(size=(512, 6)).astype(np.float32)
    w = rng.uniform(0.1, 1.0, size=512).astype(np.float32)
    g = Geometry().fit(theta, weights=w, key=jax.random.key(0))
    for name in ("normal_mean", "normal_cov", "normal_chol", "t_mean",
                 "t_cov", "t_nu", "t_chol", "t_inv_cov"):
        v = np.asarray(getattr(g, name))
        assert np.all(np.isfinite(v)), name
    chol = np.asarray(g.t_chol)
    np.testing.assert_allclose(chol @ chol.T, np.asarray(g.t_cov),
                               rtol=1e-3, atol=1e-4)
