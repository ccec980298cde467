"""Statistical correctness regressions (BASELINE.json configs, scaled to
the 1-core CI box). The reference test suite never asserts logZ accuracy
(SURVEY.md §4); these do.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import multivariate_normal, norm

import pocomc_tpu as pc


def test_correlated_gaussian_logz():
    """Ill-conditioned correlated Gaussian with analytic logZ
    (BASELINE config #2, scaled 50-D -> 6-D)."""
    d = 6
    rng = np.random.default_rng(0)
    # condition number ~ 100
    evals = np.logspace(0, 2, d)
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    cov = (Q * evals) @ Q.T
    cov_inv = np.linalg.inv(cov)
    _, logdet = np.linalg.slogdet(cov)
    cov_inv_j = jnp.asarray(cov_inv, dtype=jnp.float32)
    norm_const = -0.5 * (d * np.log(2 * np.pi) + logdet)

    def loglike(x):
        return norm_const - 0.5 * jnp.einsum("ni,ij,nj->n", x, cov_inv_j, x)

    prior_scale = 25.0
    prior = pc.Prior([pc.Normal(0, prior_scale) for _ in range(d)])
    expect = multivariate_normal.logpdf(
        np.zeros(d), np.zeros(d), cov + prior_scale**2 * np.eye(d))

    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=512, n_active=256, precondition=False)
    s.run(n_total=1024, n_evidence=0, progress=False)
    logz, _ = s.evidence()
    assert logz == pytest.approx(expect, abs=0.35)


def test_bimodal_mixture_mode_mass():
    """Two-component Gaussian mixture: mode-mass recovery and logZ
    (BASELINE config #3, scaled 20-D -> 2-D)."""
    d, sep, sig = 2, 4.0, 0.5
    w1, w2 = 0.6, 0.4
    m = np.full(d, sep)

    def loglike(x):
        l1 = -0.5 * jnp.sum((x - m) ** 2, axis=-1) / sig**2 \
             - d * jnp.log(np.sqrt(2 * np.pi) * sig)
        l2 = -0.5 * jnp.sum((x + m) ** 2, axis=-1) / sig**2 \
             - d * jnp.log(np.sqrt(2 * np.pi) * sig)
        return jnp.logaddexp(jnp.log(w1) + l1, jnp.log(w2) + l2)

    ps = 10.0
    prior = pc.Prior([pc.Normal(0, ps) for _ in range(d)])
    var = sig**2 + ps**2
    z1 = w1 * np.exp(-0.5 * np.sum(m**2) / var) / (2 * np.pi * var) ** (d / 2)
    z2 = w2 * np.exp(-0.5 * np.sum(m**2) / var) / (2 * np.pi * var) ** (d / 2)
    expect_logz = np.log(z1 + z2)
    expect_mass1 = z1 / (z1 + z2)

    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=512, n_active=256, precondition=True,
                   flow="nsf3", train_config={"epochs": 60, "patience": 8})
    s.run(n_total=1024, n_evidence=2048, progress=False)
    logz, err = s.evidence()
    assert logz == pytest.approx(expect_logz, abs=max(4 * (err or 0.1), 0.15))

    x, w, _, _ = s.posterior()
    in_mode1 = x[:, 0] > 0
    mass1 = w[in_mode1].sum() / w.sum()
    assert mass1 == pytest.approx(expect_mass1, abs=0.1)


def test_funnel_posterior_moments():
    """Neal's funnel (BASELINE config #4, scaled 25-D -> 3-D): the flow
    preconditioner must handle the hierarchical geometry; check the
    posterior of the log-scale parameter v against truth by construction:
    likelihood = p(x_{1..k} | v), prior v ~ N(0, 1.5^2), x_i ~ U(-30, 30).

    True posterior of v: p(v | .) integrates x out only through the
    likelihood at the SAMPLED x — instead we check E[v] ~ 0 by symmetry
    and that both small and large |x| regions are populated.
    """
    sv = 1.5

    def loglike(x):
        v = x[..., 0]
        y = x[..., 1:]
        var = jnp.exp(v)
        return (-0.5 * jnp.sum(y**2, axis=-1) / var
                - (y.shape[-1] / 2) * (v + jnp.log(2 * jnp.pi)))

    prior = pc.Prior([pc.Normal(0, sv), pc.Uniform(-30, 30), pc.Uniform(-30, 30)])
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=512, n_active=256, precondition=True,
                   flow="nsf3", train_config={"epochs": 60, "patience": 8})
    s.run(n_total=1024, n_evidence=1024, progress=False)

    x, w, _, _ = s.posterior()
    w = w / w.sum()
    v_mean = float((w * x[:, 0]).sum())
    v_var = float((w * x[:, 0] ** 2).sum() - v_mean**2)
    # v | x-marginalized: still close to prior N(0, 1.5^2) since the
    # y-integral of the likelihood is 1 for every v (up to truncation)
    assert abs(v_mean) < 0.45
    assert v_var == pytest.approx(sv**2, rel=0.45)
    # logZ ~ log( (1/60)^2 ) since the y-likelihood is normalized in y.
    # Flow-IS evidence (n_evidence>0): the history-MIS estimator's
    # same-seed spread is +-0.25 under CPU XLA reduction nondeterminism,
    # too wide for a stable assertion.
    logz, _ = s.evidence()
    expect = 2 * np.log(1 / 60.0)
    assert logz == pytest.approx(expect, abs=0.4)
