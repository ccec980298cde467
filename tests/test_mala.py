"""Gradient mutation kernels (mcmc.py kind='mala'/'hmc') —
beyond-reference: preconditioned Metropolis-adjusted Langevin and
Hamiltonian Monte Carlo with gradients by autodiff through the composed
flow/scaler/likelihood program. The reference (torch, black-box
likelihoods) has no gradient kernel at all.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import multivariate_normal

import pocomc_tpu as pc
from pocomc_tpu.mcmc import make_sweep, make_loglike_device
from pocomc_tpu.models.geometry import fit_geometry_jax
from pocomc_tpu.prior import Prior, Normal
from pocomc_tpu.scaler import Reparameterize


def _gauss_setup(d=3, rho=0.7, n=512, seed=0):
    cov = rho * np.ones((d, d)) + (1 - rho) * np.eye(d)
    cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    nc = -0.5 * (d * np.log(2 * np.pi) + np.linalg.slogdet(cov)[1])

    def loglike(x):
        return nc - 0.5 * jnp.einsum("ni,ij,nj->n", x, cov_inv, x)

    prior = Prior([Normal(0.0, 5.0) for _ in range(d)])
    scaler = Reparameterize(d, bounds=prior.bounds)
    key = jax.random.key(seed)
    u = 0.2 * jax.random.normal(key, (n, d), dtype=jnp.float32)
    x, logdetj = scaler.inverse(u)
    return loglike, prior, scaler, u, x, logdetj, cov


@pytest.mark.parametrize("kind", ["mala", "hmc"])
def test_gradient_sweep_targets_correct_distribution(kind):
    """A long plain gradient-kernel sweep must sample the tempered
    posterior: walker moments against the analytic beta-posterior of a
    correlated Gaussian likelihood x N(0,5) prior."""
    d = 3
    loglike, prior, scaler, u, x, logdetj, cov = _gauss_setup(d=d, n=1024)
    beta = 1.0
    # analytic posterior (x-space): precision = beta*C^-1 + I/25
    prec = beta * np.linalg.inv(cov) + np.eye(d) / 25.0
    post_cov = np.linalg.inv(prec)

    loglike_dev = make_loglike_device(loglike, True, True)
    sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                       log_like=loglike_dev, n_dim=d,
                       n_steps=10**6, n_max=120, kind=kind,
                       preconditioned=False, n_leapfrog=3)
    logl = loglike(x)
    logp = prior.logpdf(x)
    geom = fit_geometry_jax(u, key=jax.random.key(1))
    res = sweep(u, x, logdetj, logl, logp, jnp.float32(beta),
                jnp.float32(0.8), geom, jax.random.key(2))
    assert int(res["steps"]) == 120
    assert 0.2 < float(res["accept"]) < 0.98
    xs = np.asarray(res["x"], np.float64)
    assert np.all(np.isfinite(xs))
    np.testing.assert_allclose(xs.mean(axis=0), np.zeros(d), atol=0.25)
    np.testing.assert_allclose(np.cov(xs.T), post_cov, atol=0.35)
    if kind == "hmc":
        # jittered 1..n_leapfrog inner evaluations per step are counted
        assert 120 * 1024 <= int(res["calls"]) <= (3 * 120 + 1) * 1024


def test_mala_grad_zero_outside_support():
    """Proposals that leave the support must be rejected, not NaN the
    carry gradient: bounded prior, walkers near the boundary."""
    d = 2
    prior = Prior([pc.Uniform(-1.0, 1.0) for _ in range(d)])
    scaler = Reparameterize(d, bounds=prior.bounds)

    def loglike(x):
        return -0.5 * jnp.sum((x / 0.3) ** 2, axis=-1)

    loglike_dev = make_loglike_device(loglike, True, True)
    sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                       log_like=loglike_dev, n_dim=d,
                       n_steps=10**6, n_max=40, kind="mala",
                       preconditioned=False)
    u = 3.5 * jnp.ones((256, d), jnp.float32)  # x near +1 boundary
    x, logdetj = scaler.inverse(u)
    logl = loglike(x)
    logp = prior.logpdf(x)
    geom = fit_geometry_jax(jax.random.normal(jax.random.key(0), (256, d)),
                            key=jax.random.key(1))
    res = sweep(u, x, logdetj, logl, logp, jnp.float32(1.0),
                jnp.float32(0.5), geom, jax.random.key(2))
    for k in ("u", "x", "logl", "logp"):
        assert bool(jnp.all(jnp.isfinite(res[k]))), k


def test_hmc_end_to_end_evidence():
    """Full SMC run with sample='hmc' recovers an analytic logZ."""
    d = 4
    rng = np.random.default_rng(0)
    evals = np.logspace(0, 1.5, d)
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    cov = (Q * evals) @ Q.T
    ci = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    nc = -0.5 * (d * np.log(2 * np.pi) + np.linalg.slogdet(cov)[1])

    def loglike(x):
        return nc - 0.5 * jnp.einsum("ni,ij,nj->n", x, ci, x)

    ps = 10.0
    expect = multivariate_normal.logpdf(np.zeros(d), np.zeros(d),
                                        cov + ps**2 * np.eye(d))
    s = pc.Sampler(pc.Prior([Normal(0, ps) for _ in range(d)]), loglike,
                   vectorize=True, random_state=0, n_effective=256,
                   n_active=128, sample="hmc", n_leapfrog=3, flow="nsf3",
                   train_config={"epochs": 60, "patience": 8})
    s.run(n_total=1024, n_evidence=1024, progress=False)
    logz, err = s.evidence()
    assert logz == pytest.approx(expect, abs=0.35)


def test_mala_end_to_end_evidence():
    """Full SMC run with sample='mala' recovers an analytic logZ."""
    d = 4
    rng = np.random.default_rng(0)
    evals = np.logspace(0, 1.5, d)
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    cov = (Q * evals) @ Q.T
    ci = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    nc = -0.5 * (d * np.log(2 * np.pi) + np.linalg.slogdet(cov)[1])

    def loglike(x):
        return nc - 0.5 * jnp.einsum("ni,ij,nj->n", x, ci, x)

    ps = 10.0
    expect = multivariate_normal.logpdf(np.zeros(d), np.zeros(d),
                                        cov + ps**2 * np.eye(d))
    s = pc.Sampler(pc.Prior([Normal(0, ps) for _ in range(d)]), loglike,
                   vectorize=True, random_state=0, n_effective=256,
                   n_active=128, sample="mala", flow="nsf3",
                   train_config={"epochs": 60, "patience": 8})
    s.run(n_total=1024, n_evidence=1024, progress=False)
    logz, err = s.evidence()
    assert logz == pytest.approx(expect, abs=0.35)


@pytest.mark.parametrize("kind", ["mala", "hmc"])
def test_gradient_kernels_require_traceable_likelihood(kind):
    def blackbox(x):
        return float(-0.5 * np.sum(np.asarray(x) ** 2))

    with pytest.raises(ValueError, match="traceable"):
        pc.Sampler(pc.Prior([Normal(0, 1) for _ in range(2)]), blackbox,
                   sample=kind)


def test_gradient_kernels_require_traceable_prior():
    """A callback-based prior cannot provide gradients: requesting a
    gradient kernel with one must raise clearly at construction, not
    crash inside jax.vjp on the first sweep."""
    class NumpyPrior:
        dim = 2
        bounds = np.array([[-np.inf, np.inf]] * 2)

        def logpdf(self, x):
            return -0.5 * np.sum(np.asarray(x) ** 2, axis=-1)

        def rvs(self, size=1):
            return np.random.default_rng(0).standard_normal((size, 2))

    with pytest.raises(ValueError, match="prior"):
        pc.Sampler(NumpyPrior(), lambda x: -jnp.sum(x**2, axis=-1),
                   vectorize=True, sample="mala")


def test_invalid_n_leapfrog_raises():
    with pytest.raises(ValueError, match="n_leapfrog"):
        pc.Sampler(pc.Prior([Normal(0, 1) for _ in range(2)]),
                   lambda x: -jnp.sum(x**2, axis=-1), sample="hmc",
                   n_leapfrog=0)


def test_invalid_sample_name_still_raises():
    with pytest.raises(ValueError, match="tpcn"):
        pc.Sampler(pc.Prior([Normal(0, 1) for _ in range(2)]),
                   lambda x: -jnp.sum(x**2, axis=-1), sample="hamiltonian")
