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


def test_funnel_fixed_data():
    """Neal's funnel with OBSERVED data (BASELINE config #4 sharpened,
    25-D -> 3-D): latent scale v ~ N(0, sv^2), local effects y_i | v ~
    N(0, e^v) inside the likelihood, data d_i ~ N(y_i, sn^2) at fixed
    d.  Unlike the data-free funnel (whose v-posterior equals its prior
    by construction), every v-posterior moment and logZ here is a
    NONTRIVIAL 1-D quadrature:

        p(v | d) propto N(v; 0, sv^2) * prod_i N(d_i; 0, e^v + sn^2)

    so a sampler that cannot enter the funnel neck (or over-disperses in
    it) shifts E[v], SD[v] and logZ measurably.
    """
    sv, sn = 2.0, 0.5
    data = np.array([1.2, -0.8])
    half = 30.0  # y_i ~ U(-half, half)

    def loglike(x):
        v = x[..., 0]
        y = x[..., 1:]
        var = jnp.exp(v)
        lp_y = (-0.5 * jnp.sum(y**2, axis=-1) / var
                - (y.shape[-1] / 2) * (v + jnp.log(2 * jnp.pi)))
        lp_d = (-0.5 * jnp.sum((y - data) ** 2, axis=-1) / sn**2
                - data.size * np.log(np.sqrt(2 * np.pi) * sn))
        return lp_y + lp_d

    # quadrature truth: marginalize y analytically (Gaussian convolution,
    # the U(-half,half) truncation is immaterial at these scales), then
    # integrate v on a dense grid
    vs = np.linspace(-12, 12, 20001)
    log_pv = norm.logpdf(vs, 0, sv)
    log_md = np.sum(
        norm.logpdf(data[None, :], 0, np.sqrt(np.exp(vs)[:, None] + sn**2)),
        axis=1)
    log_joint = log_pv + log_md
    m = log_joint.max()
    joint = np.exp(log_joint - m)
    dv = vs[1] - vs[0]
    logz_true = m + np.log(np.sum(joint) * dv) - data.size * np.log(2 * half)
    v_mean_true = np.sum(vs * joint) / np.sum(joint)
    v_sd_true = np.sqrt(np.sum((vs - v_mean_true) ** 2 * joint)
                        / np.sum(joint))

    prior = pc.Prior([pc.Normal(0, sv), pc.Uniform(-half, half),
                      pc.Uniform(-half, half)])
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=512, n_active=256, precondition=True,
                   flow="nsf3", train_config={"epochs": 120, "patience": 8})
    s.run(n_total=2048, n_evidence=2048, progress=False)

    x, w, _, _ = s.posterior()
    w = w / w.sum()
    v_mean = float((w * x[:, 0]).sum())
    v_sd = float(np.sqrt((w * (x[:, 0] - v_mean) ** 2).sum()))
    assert v_mean == pytest.approx(v_mean_true, abs=0.35)
    assert v_sd == pytest.approx(v_sd_true, rel=0.35)

    logz, err = s.evidence()
    assert logz == pytest.approx(logz_true, abs=max(4 * (err or 0.1), 0.35))
