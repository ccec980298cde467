"""Direct MCMC kernel tests: invariance of the target, adaptation,
call counting, boundary handling, and callback-likelihood parity.

The reference has no kernel-level tests (SURVEY.md §4); these validate the
fused sweeps against properties the algorithm guarantees.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pocomc_tpu.mcmc import make_sweep, make_loglike_device
from pocomc_tpu.models.geometry import fit_geometry_jax
from pocomc_tpu.scaler import Reparameterize
from pocomc_tpu.prior import Prior, Normal


N, D = 512, 3


@pytest.fixture(scope="module")
def setup():
    prior = Prior([Normal(0.0, 3.0) for _ in range(D)])
    scaler = Reparameterize(D, bounds=prior.bounds)

    def log_like(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    key = jax.random.key(0)
    u = jax.random.normal(key, (N, D)) * 0.5
    x, logdetj = scaler.inverse(u)
    logl = log_like(x)
    logp = prior.logpdf(x)
    w = jnp.full((N,), 1.0 / N)
    geom = fit_geometry_jax(u, weights=w, key=jax.random.key(1))
    return prior, scaler, log_like, (u, x, logdetj, logl, logp), geom


def _run(setup, kind, n_steps=50, n_max=50, sigma0=0.5, beta=1.0, seed=2):
    prior, scaler, log_like, state, geom = setup
    loglike_dev = make_loglike_device(log_like, True, True)
    sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                       log_like=loglike_dev, n_dim=D, n_steps=n_steps,
                       n_max=n_max, kind=kind, preconditioned=False)
    return sweep(*state, jnp.float32(beta), jnp.float32(sigma0), geom,
                 jax.random.key(seed))


@pytest.mark.parametrize("kind", ["tpcn", "rwm"])
def test_sweep_preserves_gaussian_target(kind):
    """Invariance: a population drawn FROM the beta=1 posterior, with the
    proposal geometry fit to it, must remain distributed as the posterior
    N(0, s^2 I), s^2 = (1 + 1/9)^-1 = 0.9, after a long sweep."""
    prior = Prior([Normal(0.0, 3.0) for _ in range(D)])
    scaler = Reparameterize(D, bounds=prior.bounds)

    def log_like(xx):
        return -0.5 * jnp.sum(xx**2, axis=-1)

    post_var = 1.0 / (1.0 + 1.0 / 9.0)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(scale=np.sqrt(post_var), size=(N, D)),
                     dtype=jnp.float32)
    u = scaler.forward(x0)
    x, logdetj = scaler.inverse(u)
    logl = log_like(x)
    logp = prior.logpdf(x)
    w = jnp.full((N,), 1.0 / N)
    geom = fit_geometry_jax(u, weights=w, key=jax.random.key(1))

    loglike_dev = make_loglike_device(log_like, True, True)
    sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                       log_like=loglike_dev, n_dim=D, n_steps=10**6,
                       n_max=200, kind=kind, preconditioned=False)
    res = sweep(u, x, logdetj, logl, logp, jnp.float32(1.0),
                jnp.float32(0.5), geom, jax.random.key(2))
    xf = np.asarray(res["x"])
    assert abs(float(xf.mean())) < 0.1
    np.testing.assert_allclose(xf.var(axis=0), post_var * np.ones(D),
                               rtol=0.2)
    assert 0.05 < float(res["accept"]) <= 1.0
    assert int(res["steps"]) == 200  # n_max respected with plateau off


@pytest.mark.parametrize("kind", ["tpcn", "rwm"])
def test_calls_counted(setup, kind):
    res = _run(setup, kind, n_steps=5, n_max=10)
    steps = int(res["steps"])
    # unbounded prior, all proposals finite -> calls == N * steps
    assert int(res["calls"]) == N * steps


def test_sigma_capped_tpcn(setup):
    res = _run(setup, "tpcn", sigma0=5.0)
    cap = min(2.38 / np.sqrt(D), 0.99)
    assert float(res["proposal_scale"]) <= cap + 1e-6


def test_plateau_terminates_early(setup):
    # a converged population plateaus immediately -> steps << n_max
    res = _run(setup, "tpcn", n_steps=2, n_max=200)
    assert int(res["steps"]) < 100


def test_callback_likelihood_matches_traced(setup):
    """pure_callback path must produce the same accept dynamics as the
    traced path given identical RNG."""
    prior, scaler, log_like, state, geom = setup

    def host_like(x):
        x = np.asarray(x)
        return -0.5 * np.sum(x**2, axis=-1)

    traced = make_loglike_device(log_like, True, True)
    callback = make_loglike_device(host_like, True, False)
    results = []
    for loglike_dev in (traced, callback):
        sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                           log_like=loglike_dev, n_dim=D, n_steps=10**6,
                           n_max=5, kind="tpcn", preconditioned=False)
        res = sweep(*state, jnp.float32(0.8), jnp.float32(0.5), geom,
                    jax.random.key(7))
        results.append(res)
    np.testing.assert_allclose(np.asarray(results[0]["x"]),
                               np.asarray(results[1]["x"]), rtol=1e-4,
                               atol=1e-4)
    assert int(results[0]["calls"]) == int(results[1]["calls"])


def test_bounded_infinite_proposals_masked():
    """With a tight bounded prior, out-of-support proposals must get
    logl=-inf and never be accepted into an invalid state."""
    from pocomc_tpu.prior import Uniform
    prior = Prior([Uniform(-1.0, 1.0) for _ in range(D)])
    scaler = Reparameterize(D, bounds=prior.bounds)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.9, 0.9, size=(N, D)), dtype=jnp.float32)
    scaler.fit(np.asarray(x0))
    u = scaler.forward(x0)
    x, logdetj = scaler.inverse(u)

    def log_like(xx):
        return -0.5 * jnp.sum(xx**2, axis=-1)

    logl = log_like(x)
    logp = prior.logpdf(x)
    w = jnp.full((N,), 1.0 / N)
    geom = fit_geometry_jax(u, weights=w, key=jax.random.key(1))
    loglike_dev = make_loglike_device(log_like, True, True)
    sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                       log_like=loglike_dev, n_dim=D, n_steps=10**6,
                       n_max=20, kind="rwm", preconditioned=False)
    res = sweep(u, x, logdetj, logl, logp, jnp.float32(1.0),
                jnp.float32(2.0), geom, jax.random.key(3))
    xf = np.asarray(res["x"])
    assert (np.abs(xf) <= 1.0).all()
    assert np.isfinite(np.asarray(res["logl"])).all()


def test_periodic_boundary_in_sweep():
    """Periodic wrap: states stay in the box and the chain still mixes."""
    prior = Prior([Normal(np.pi, 0.5), Normal(np.pi, 0.5)])
    bounds = np.tile([0.0, 2 * np.pi], (2, 1))
    scaler = Reparameterize(2, bounds=bounds, periodic=[0, 1])
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(1.0, 5.0, size=(N, 2)), dtype=jnp.float32)
    scaler.fit(np.asarray(x0))
    u = scaler.forward(x0)
    x, logdetj = scaler.inverse(u)

    def log_like(xx):
        return -0.5 * jnp.sum((xx - np.pi) ** 2, axis=-1) / 0.25

    logl = log_like(x)
    logp = prior.logpdf(x)
    w = jnp.full((N,), 1.0 / N)
    geom = fit_geometry_jax(u, weights=w, key=jax.random.key(1))
    loglike_dev = make_loglike_device(log_like, True, True)
    sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                       log_like=loglike_dev, n_dim=2, n_steps=10**6,
                       n_max=30, kind="tpcn", preconditioned=False)
    res = sweep(u, x, logdetj, logl, logp, jnp.float32(1.0),
                jnp.float32(0.7), geom, jax.random.key(4))
    xf = np.asarray(res["x"])
    assert (xf >= 0).all() and (xf <= 2 * np.pi).all()
    assert float(res["accept"]) > 0.05
