"""Student-t EM and geometry tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pocomc_tpu.models.student import fit_mvstud
from pocomc_tpu.models.geometry import Geometry, fit_geometry_jax


def test_gaussian_data_gives_large_nu():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(2000, 3))
    mu, sigma, nu = fit_mvstud(jnp.asarray(data, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(mu), np.zeros(3), atol=0.15)
    np.testing.assert_allclose(np.asarray(sigma), np.eye(3), atol=0.2)
    assert float(nu) > 10.0 or not np.isfinite(float(nu))


def test_heavy_tail_recovers_low_nu():
    rng = np.random.default_rng(1)
    nu_true = 3.0
    d = 2
    g = rng.chisquare(nu_true, size=4000) / nu_true
    data = rng.normal(size=(4000, d)) / np.sqrt(g)[:, None]
    mu, sigma, nu = fit_mvstud(jnp.asarray(data, dtype=jnp.float32))
    assert 1.5 < float(nu) < 6.0
    np.testing.assert_allclose(np.asarray(mu), np.zeros(d), atol=0.15)
    np.testing.assert_allclose(np.asarray(sigma), np.eye(d), atol=0.35)


def test_geometry_weighted_moments():
    rng = np.random.default_rng(2)
    theta = rng.normal(3.0, 2.0, size=(1000, 2))
    w = np.ones(1000)
    geo = Geometry().fit(jnp.asarray(theta, dtype=jnp.float32),
                         weights=jnp.asarray(w, dtype=jnp.float32),
                         key=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(geo.normal_mean), [3.0, 3.0], atol=0.3)
    np.testing.assert_allclose(np.asarray(geo.normal_cov),
                               4.0 * np.eye(2), atol=0.8)
    assert np.isfinite(float(geo.t_nu))
    assert np.asarray(geo.t_chol).shape == (2, 2)
    # cholesky consistency
    c = np.asarray(geo.t_chol)
    np.testing.assert_allclose(c @ c.T, np.asarray(geo.t_cov), rtol=1e-3, atol=1e-3)


def test_geometry_nu_clamped_finite():
    rng = np.random.default_rng(3)
    theta = rng.normal(size=(500, 2))  # Gaussian -> nu may hit inf
    geo = Geometry().fit(jnp.asarray(theta, dtype=jnp.float32))
    assert np.isfinite(float(geo.t_nu))
    assert float(geo.t_nu) <= 1e6 + 1
