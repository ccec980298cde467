"""Pareto-smoothed importance sampling (ops/psis.py) + sampler wiring.

The reference has no analog (its evidence at sampler.py:869-920 is plain
flow-IS with no tail diagnostic); correctness targets are the published
PSIS properties (Vehtari et al. 2024): k-hat recovers the tail index of
Pareto-tailed ratios, smoothing reduces replicate variance when ratios
are heavy-tailed and is a near-no-op when they are not.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import pocomc_tpu as pc
from pocomc_tpu.ops.psis import gpdfit, gpd_quantile, psislw


def _logsumexp_mean(logw):
    m = logw.max()
    return m + np.log(np.mean(np.exp(logw - m)))


def test_gpdfit_recovers_shape():
    rng = np.random.default_rng(0)
    for k_true in (0.2, 0.5, 0.8):
        u = rng.uniform(size=4000)
        x = ((1 - u) ** (-k_true) - 1.0) / k_true  # GPD(k, sigma=1)
        k, sigma = gpdfit(x)
        assert abs(k - k_true) < 0.08
        assert abs(sigma - 1.0) < 0.12


def test_gpd_quantile_roundtrip():
    p = np.linspace(0.05, 0.95, 19)
    for k in (-0.3, 0.0, 0.5):
        x = gpd_quantile(p, k, 2.0)
        if abs(k) < 1e-12:
            cdf = 1 - np.exp(-x / 2.0)
        else:
            cdf = 1 - (1 + k * x / 2.0) ** (-1.0 / k)
        np.testing.assert_allclose(cdf, p, atol=1e-12)


def test_psislw_benign_ratios_nearly_unchanged():
    """Proposal over-covers the target: k-hat < 0.5, smoothing ~ no-op."""
    rng = np.random.default_rng(1)
    z = rng.standard_normal((4000, 5))
    # target N(0, 0.8^2) under proposal N(0, 1): light-tailed ratios
    logw = (-0.5 * np.sum(z**2 / 0.8**2, 1) - 5 * np.log(0.8)
            + 0.5 * np.sum(z**2, 1))
    sm, khat = psislw(logw)
    assert khat < 0.5
    assert abs(_logsumexp_mean(sm) - _logsumexp_mean(logw)) < 0.02


def test_psislw_reduces_variance_when_undercovered():
    """Proposal narrower than target in 5-D: heavy-tailed ratios.  PSIS
    replicate std must drop; both estimators stay near truth (logZ=0)."""
    rng = np.random.default_rng(2)
    raw, psis = [], []
    khats = []
    for _ in range(30):
        z = rng.standard_normal((2000, 5))
        logw = (-0.5 * np.sum(z**2 / 1.5**2, 1) - 5 * np.log(1.5)
                + 0.5 * np.sum(z**2, 1))
        sm, khat = psislw(logw)
        khats.append(khat)
        raw.append(_logsumexp_mean(logw))
        psis.append(_logsumexp_mean(sm))
    assert np.median(khats) > 0.5  # the diagnostic flags the tail
    assert np.std(psis) < 0.85 * np.std(raw)
    assert abs(np.mean(psis)) < 0.1  # bias stays small
    assert abs(np.mean(raw)) < 0.1


def test_psislw_tiny_input_passthrough():
    logw = np.array([0.0, -1.0, -2.0])
    sm, khat = psislw(logw)
    assert np.isinf(khat)
    np.testing.assert_array_equal(sm, logw)


def test_sampler_evidence_method_validation():
    prior = pc.Prior([pc.Normal(0, 3), pc.Normal(0, 3)])
    like = lambda x: -0.5 * jnp.sum(x**2, axis=-1)
    with pytest.raises(ValueError, match="evidence_method"):
        pc.Sampler(prior, like, vectorize=True, evidence_method="bogus")


def test_sampler_psis_evidence_known_answer():
    """2-D unit-Gaussian likelihood under N(0,3) prior: logZ known in
    closed form; both estimators agree with it and k-hat is recorded."""
    from scipy.stats import norm
    prior = pc.Prior([pc.Normal(0, 3), pc.Normal(0, 3)])

    def loglike(x):
        return -0.5 * jnp.sum(x**2, axis=-1) - np.log(2 * np.pi)

    truth = 2 * norm.logpdf(0, 0, np.sqrt(1 + 3**2))
    logzs = {}
    for method in ("is", "psis"):
        s = pc.Sampler(prior, loglike, vectorize=True, random_state=3,
                       n_effective=256, n_active=128, flow="nsf3",
                       evidence_method=method,
                       train_config={"epochs": 200, "patience": 5})
        s.run(n_total=512, n_evidence=1024, progress=False)
        assert s.evidence_khat is not None and np.isfinite(s.evidence_khat)
        assert s.evidence_khat < 0.7  # well-conditioned problem
        logzs[method] = s.logz
        assert abs(s.logz - truth) < max(4 * s.logz_err, 0.3)
    # same ratios up to seeds; the two estimators must broadly agree
    assert abs(logzs["is"] - logzs["psis"]) < 0.5
