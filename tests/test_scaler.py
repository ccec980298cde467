"""Reparameterize round-trip and Jacobian tests (mirrors the invariants of
reference tests/test_scaler.py:56-140 and adds ladj finite-difference and
boundary-condition checks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pocomc_tpu.scaler import Reparameterize


def make_data(kind, n=64, d=4, seed=0):
    rng = np.random.default_rng(seed)
    if kind == "none":
        bounds = np.tile([-np.inf, np.inf], (d, 1))
        x = rng.normal(0, 3, size=(n, d))
    elif kind == "left":
        bounds = np.tile([1.5, np.inf], (d, 1))
        x = 1.5 + rng.gamma(2.0, 1.0, size=(n, d))
    elif kind == "right":
        bounds = np.tile([-np.inf, 2.5], (d, 1))
        x = 2.5 - rng.gamma(2.0, 1.0, size=(n, d))
    elif kind == "both":
        bounds = np.tile([-1.0, 3.0], (d, 1))
        x = rng.uniform(-0.9, 2.9, size=(n, d))
    else:  # mixed
        bounds = np.array([[-np.inf, np.inf], [0.0, np.inf],
                           [-np.inf, 1.0], [0.0, 1.0]])
        x = np.stack([rng.normal(size=n),
                      rng.gamma(2.0, 1.0, size=n),
                      1.0 - rng.gamma(2.0, 1.0, size=n),
                      rng.uniform(0.05, 0.95, size=n)], axis=1)
    return bounds, x


@pytest.mark.parametrize("kind", ["none", "left", "right", "both", "mixed"])
@pytest.mark.parametrize("transform", ["probit", "logit"])
def test_roundtrip(kind, transform):
    bounds, x = make_data(kind)
    scaler = Reparameterize(4, bounds=bounds, transform=transform)
    scaler.fit(x)
    u = scaler.forward(jnp.asarray(x))
    x_r, ladj = scaler.inverse(u)
    # f32 device math: log/exp round-trips carry ~1e-3 relative error
    np.testing.assert_allclose(np.asarray(x_r), x, rtol=5e-3, atol=5e-3)
    assert np.all(np.isfinite(np.asarray(ladj)))


def test_unfitted_identity_unbounded():
    bounds, x = make_data("none")
    scaler = Reparameterize(4, bounds=bounds)
    u = np.asarray(scaler.forward(jnp.asarray(x)))
    np.testing.assert_allclose(u, x, rtol=1e-5)


def test_ladj_finite_difference():
    """log|det dx/du| from inverse() must match a numerical Jacobian."""
    bounds, x = make_data("mixed", n=8)
    scaler = Reparameterize(4, bounds=bounds)
    scaler.fit(x)
    u0 = np.asarray(scaler.forward(jnp.asarray(x)))[:3]
    _, ladj = scaler.inverse(jnp.asarray(u0))
    eps = 1e-4
    for i in range(3):
        J = np.zeros((4, 4))
        for j in range(4):
            up = u0[i].copy(); up[j] += eps
            um = u0[i].copy(); um[j] -= eps
            xp, _ = scaler.inverse(jnp.asarray(up[None]))
            xm, _ = scaler.inverse(jnp.asarray(um[None]))
            J[:, j] = (np.asarray(xp)[0] - np.asarray(xm)[0]) / (2 * eps)
        num_ladj = np.linalg.slogdet(J)[1]
        assert np.asarray(ladj)[i] == pytest.approx(num_ladj, rel=1e-2, abs=1e-2)


def test_out_of_bounds_raises():
    bounds, x = make_data("both")
    scaler = Reparameterize(4, bounds=bounds)
    bad = x.copy()
    bad[0, 0] = 5.0
    with pytest.raises(ValueError):
        scaler.fit(bad)
    with pytest.raises(ValueError):
        scaler.forward(bad, check_input=True)


def test_periodic_wrap():
    bounds = np.tile([0.0, 2 * np.pi], (2, 1))
    scaler = Reparameterize(2, bounds=bounds, periodic=[0, 1])
    x = jnp.asarray([[2 * np.pi + 0.5, -0.5], [7.0, 13.0]])
    xw = np.asarray(scaler.apply_boundary_conditions_x(x))
    assert np.all(xw >= 0.0) and np.all(xw <= 2 * np.pi)
    np.testing.assert_allclose(xw[0], [0.5, 2 * np.pi - 0.5], rtol=1e-6)


def test_reflective_fold():
    bounds = np.tile([0.0, 1.0], (2, 1))
    scaler = Reparameterize(2, bounds=bounds, reflective=[0, 1])
    x = jnp.asarray([[1.25, -0.25], [2.5, 3.75]])
    xw = np.asarray(scaler.apply_boundary_conditions_x(x))
    assert np.all(xw >= 0.0) and np.all(xw <= 1.0)
    np.testing.assert_allclose(xw[0], [0.75, 0.25], rtol=1e-6)


def test_scalar_bounds_broadcast():
    scaler = Reparameterize(3, bounds=np.array([0.0, 1.0]))
    assert np.asarray(scaler.mask_both).all()
