"""Experimental device-resident SMC iteration (parallel/fused.py):
runs on the 8-device CPU mesh, temperatures must climb and the population
must track the analytic posterior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pocomc_tpu as pc
from pocomc_tpu.parallel import ParticleMesh
from pocomc_tpu.parallel.fused import (init_history, push_history,
                                       make_fused_iteration)
from pocomc_tpu.mcmc import make_sweep, make_loglike_device
from pocomc_tpu.models.flow import Flow
from pocomc_tpu.scaler import Reparameterize


def test_fused_iterations_on_mesh():
    mesh = ParticleMesh(jax.devices()[:8])
    n_dim, n_active, t_max = 3, 128, 16
    prior = pc.Prior([pc.Normal(0.0, 3.0) for _ in range(n_dim)])
    scaler = Reparameterize(n_dim, bounds=prior.bounds)
    flow = Flow(n_dim, "nsf3", seed=0)

    def log_like(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    loglike_dev = make_loglike_device(log_like, True, True)
    sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                       log_like=loglike_dev, n_dim=n_dim, n_steps=4,
                       n_max=20, kind="tpcn", preconditioned=True,
                       flow_fwd=flow.kernel_fwd, flow_inv=flow.kernel_inv)
    iteration = make_fused_iteration(sweep, flow, n_active,
                                     n_effective=96.0)

    # warmup: prior draws at beta=0
    key = jax.random.key(0)
    hist = init_history(t_max, n_active, n_dim)
    for i in range(2):
        key, k = jax.random.split(key)
        x = jnp.asarray(prior.rvs(n_active, random_state=i),
                        dtype=jnp.float32)
        u = scaler.forward(x)
        _, logdetj = scaler.inverse(u)
        hist = push_history(hist, u, x, logdetj, log_like(x),
                            prior.logpdf(x), jnp.float32(0.0),
                            jnp.float32(0.0))

    # shard the history over the particle axis (axis 1 of the buffers)
    from jax.sharding import NamedSharding, PartitionSpec as P
    shard2 = NamedSharding(mesh.mesh, P(None, "particles"))
    hist = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, shard2) if a.ndim >= 2 else a, hist)

    betas = [0.0]
    sigma = jnp.float32(2.38 / np.sqrt(n_dim))
    for i in range(6):
        hist, res = iteration(hist, sigma, flow.params, np.uint32(100 + i))
        sigma = res["proposal_scale"]
        betas.append(float(res["beta"]))
        assert np.isfinite(float(res["logz"]))

    assert int(hist.t) == 8
    assert betas[-1] > betas[1] >= 0.0
    assert betas[-1] <= 1.0
    # the latest population must be finite and in a sane range
    last = np.asarray(hist.x[int(hist.t) - 1])
    assert np.isfinite(last).all()
    assert np.abs(last).max() < 20.0
    # with beta near 1, population variance approaches the posterior's 0.9
    if betas[-1] > 0.9:
        assert 0.4 < last.var() < 1.6


def test_device_loop_matches_host_path():
    """Statistical agreement between the device-resident SMC loop and the
    host-orchestrated path (VERDICT round-1 acceptance criterion): same
    problem, same seed, both execution paths must recover the same
    analytic evidence within combined error."""
    from scipy.stats import norm

    def loglike(x):
        return -0.5 * jnp.sum(x**2, axis=-1) - jnp.log(2 * jnp.pi)

    prior = pc.Prior([pc.Normal(0, 5), pc.Normal(0, 5)])
    expect = 2 * norm.logpdf(0, 0, np.sqrt(26.0))
    logz = {}
    for mode in (True, False):
        s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                       n_effective=256, n_active=128, flow="nsf3",
                       device_loop=mode,
                       train_config={"epochs": 40, "patience": 5})
        s.run(n_total=512, n_evidence=1024, progress=False)
        assert s._use_device_loop() == mode
        logz[mode] = s.logz
        assert s.logz == pytest.approx(expect, abs=0.3), (mode, s.logz)
    # both paths near the truth implies they agree with each other
    assert logz[True] == pytest.approx(logz[False], abs=0.3)


def test_device_evidence_keeps_inf_likelihood_rows():
    """Hard-constraint likelihood (-inf inside the prior volume): the
    device-path evidence must keep zero-likelihood draws in the IS
    denominator (reference sampler.py:904-910 semantics) — dropping them
    inflates logZ by -log(1-f)."""
    from scipy.stats import norm

    def loglike(x):
        base = -0.5 * jnp.sum(x**2, axis=-1) - jnp.log(2 * jnp.pi)
        return jnp.where(x[..., 0] > 0, base, -jnp.inf)

    expect = 2 * norm.logpdf(0, 0, np.sqrt(26.0)) + np.log(0.5)
    prior = pc.Prior([pc.Normal(0, 5), pc.Normal(0, 5)])
    logz = {}
    for mode in (True, False):
        s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                       n_effective=256, n_active=128, flow="nsf3",
                       device_loop=mode,
                       train_config={"epochs": 40, "patience": 5})
        s.run(n_total=512, n_evidence=2048, progress=False)
        logz[mode] = s.logz
        assert s.logz == pytest.approx(expect, abs=0.35), (mode, s.logz)
    assert logz[True] == pytest.approx(logz[False], abs=0.3)


def test_engine_cache_distinguishes_datasets():
    """Two Samplers sharing a likelihood FUNCTION but with different
    large data arrays must not share baked-in engine programs (repr()
    truncates big arrays; the key hashes content)."""
    rng = np.random.default_rng(0)
    data_a = rng.normal(0.0, 1.0, size=2048).astype(np.float64)
    data_b = data_a.copy()
    data_b[1500] += 4.0   # differs beyond repr()'s summarized view

    def loglike(x, data):
        return -0.5 * jnp.sum((x[..., None] - data) ** 2, axis=(-1, -2)) \
            / data.shape[0]

    prior = pc.Prior([pc.Normal(0, 5)])
    logz = {}
    for tag, data in (("a", data_a), ("b", data_b)):
        s = pc.Sampler(prior, loglike, likelihood_args=[jnp.asarray(data)],
                       vectorize=True, random_state=0, n_effective=128,
                       n_active=64, precondition=False)
        s.run(n_total=256, n_evidence=0, progress=False)
        logz[tag] = float(s.particles.compute_logw_and_logz(1.0)[1])
    # different data -> different evidence; a cache collision would make
    # them bitwise identical
    assert logz["a"] != logz["b"]
