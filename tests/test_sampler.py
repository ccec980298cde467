"""End-to-end SMC runs (mirrors reference tests/test_sampler.py:19-44 and
adds the analytic-logZ regression the reference lacks, per SURVEY.md §4).

Configs are kept tiny: the CI box is a single CPU core.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import norm

import pocomc_tpu as pc


def gaussian_loglike(x):
    return -0.5 * jnp.sum(x**2, axis=-1) - x.shape[-1] / 2 * jnp.log(2 * jnp.pi)


def make_prior(d=2, scale=5.0):
    return pc.Prior([pc.Normal(0, scale) for _ in range(d)])


def analytic_logz(d=2, scale=5.0):
    # likelihood N(x;0,I), prior N(x;0,scale^2 I) -> Z = prod N(0;0,1+scale^2)
    return d * norm.logpdf(0, 0, np.sqrt(1 + scale**2))


class TestSamplerRuns:
    def test_vectorized_jax_likelihood(self):
        s = pc.Sampler(make_prior(), gaussian_loglike, vectorize=True,
                       random_state=0, n_effective=256, n_active=128,
                       precondition=False)
        s.run(n_total=512, n_evidence=0, progress=False)
        assert s.t > 2
        logz, _ = s.evidence()
        assert abs(logz - analytic_logz()) < 0.3

    def test_scalar_numpy_likelihood(self):
        # black-box, non-traceable scalar likelihood -> pure_callback path
        def loglike(x):
            return float(-0.5 * np.sum(x**2) - np.log(2 * np.pi))

        s = pc.Sampler(make_prior(), loglike, vectorize=False,
                       random_state=0, n_effective=256, n_active=128,
                       precondition=False)
        s.run(n_total=512, n_evidence=0, progress=False)
        assert s.likelihood_traceable is False
        logz, _ = s.evidence()
        assert abs(logz - analytic_logz()) < 0.3

    def test_preconditioned_flow_is_evidence(self):
        s = pc.Sampler(make_prior(), gaussian_loglike, vectorize=True,
                       random_state=0, n_effective=256, n_active=128,
                       precondition=True, flow="nsf3",
                       train_config={"epochs": 30, "patience": 5})
        s.run(n_total=512, n_evidence=1024, progress=False)
        logz, err = s.evidence()
        assert err is not None and err < 0.2
        assert abs(logz - analytic_logz()) < max(3 * err, 0.15)
        # default evidence proposal is the defensive t-latent draw
        assert s.evidence_proposal_used == "t"

    def test_evidence_proposal_flow_parity_option(self):
        # evidence_proposal='flow' reproduces the reference estimator
        # (Gaussian-latent flow draws) and stays accurate here
        s = pc.Sampler(make_prior(), gaussian_loglike, vectorize=True,
                       random_state=0, n_effective=256, n_active=128,
                       precondition=True, flow="nsf3",
                       evidence_proposal="flow",
                       train_config={"epochs": 30, "patience": 5})
        s.run(n_total=512, n_evidence=1024, progress=False)
        assert s.evidence_proposal_used == "flow"
        logz, err = s.evidence()
        assert abs(logz - analytic_logz()) < max(3 * err, 0.2)

    def test_rwm_kernel(self):
        s = pc.Sampler(make_prior(), gaussian_loglike, vectorize=True,
                       random_state=1, n_effective=256, n_active=128,
                       precondition=False, sample="rwm", resample="syst",
                       metric="uss")
        s.run(n_total=512, n_evidence=0, progress=False)
        logz, _ = s.evidence()
        assert abs(logz - analytic_logz()) < 0.4

    def test_posterior_api(self):
        s = pc.Sampler(make_prior(), gaussian_loglike, vectorize=True,
                       random_state=0, n_effective=256, n_active=128,
                       precondition=False)
        s.run(n_total=512, n_evidence=0, progress=False)

        x, w, ll, lp = s.posterior()
        assert x.shape[1] == 2 and len(w) == len(x) == len(ll) == len(lp)
        assert w.min() >= 0
        # posterior of N(0,I) x N(0,25): mean 0, var 25/26
        mean = (w[:, None] * x).sum(0) / w.sum()
        np.testing.assert_allclose(mean, [0, 0], atol=0.2)
        var = (w[:, None] * x**2).sum(0) / w.sum() - mean**2
        np.testing.assert_allclose(var, 25 / 26 * np.ones(2), atol=0.3)

        xr, llr, lpr = s.posterior(resample=True)
        assert xr.shape == x.shape[:1] + (2,) or xr.shape[0] == len(x)

        x2, logw, ll2, lp2 = s.posterior(return_logw=True)
        assert np.all(logw <= 1e-9)

        res = s.results
        assert "logz" in res and "beta" in res and "accept" in res

    def test_invalid_options_raise(self):
        for kw in (dict(sample="bogus"), dict(metric="bogus"),
                   dict(resample="bogus"), dict(transform="bogus"),
                   dict(evidence_proposal="bogus"), dict(evidence_nu=0.0)):
            with pytest.raises(ValueError):
                pc.Sampler(make_prior(), gaussian_loglike, vectorize=True, **kw)


class TestBoundedPrior:
    def test_uniform_prior_bounded_transform(self):
        # uniform prior on [-5,5]^2; same gaussian likelihood
        prior = pc.Prior([pc.Uniform(-5, 5), pc.Uniform(-5, 5)])
        s = pc.Sampler(prior, gaussian_loglike, vectorize=True,
                       random_state=0, n_effective=256, n_active=128,
                       precondition=False)
        s.run(n_total=512, n_evidence=0, progress=False)
        # Z = (1/10)^2 * mass inside box (~1) -> logZ ~ -2 log 10
        logz, _ = s.evidence()
        assert abs(logz - (-2 * np.log(10))) < 0.3
        x, w, _, _ = s.posterior()
        assert (np.abs(x) <= 5).all()

    def test_preconditioned_rwm(self):
        """The preconditioned random-walk kernel (the 4th kernel variant,
        reference mcmc.py:185-341) must also recover the analytic logZ."""
        s = pc.Sampler(make_prior(), gaussian_loglike, vectorize=True,
                       random_state=0, n_effective=256, n_active=128,
                       precondition=True, sample="rwm", flow="nsf3",
                       train_config={"epochs": 30, "patience": 5})
        s.run(n_total=512, n_evidence=1024, progress=False)
        logz, err = s.evidence()
        assert abs(logz - analytic_logz()) < max(4 * err, 0.2)

    def test_coupling_flow_sampler(self):
        """nsfc coupling flow as the preconditioner."""
        s = pc.Sampler(make_prior(), gaussian_loglike, vectorize=True,
                       random_state=0, n_effective=256, n_active=128,
                       precondition=True, flow="nsfc6",
                       train_config={"epochs": 30, "patience": 5})
        s.run(n_total=512, n_evidence=1024, progress=False)
        logz, err = s.evidence()
        assert abs(logz - analytic_logz()) < max(4 * err, 0.2)


class _SeedlessPrior:
    """Fully-custom duck-typed prior whose rvs takes no random_state.

    The reference keeps such priors reproducible by seeding np.random
    globally at __init__ (ref sampler.py:195-197); the sampler must scope a
    seeded global state around the warmup draw instead.
    """

    dim = 2
    bounds = np.array([[-np.inf, np.inf], [-np.inf, np.inf]])

    def logpdf(self, x):
        x = np.asarray(x)
        return (-0.5 * np.sum((x / 5.0) ** 2, axis=-1)
                - x.shape[-1] * np.log(5.0 * np.sqrt(2 * np.pi)))

    def rvs(self, size=1):
        return np.random.randn(size, 2) * 5.0


class TestSeedlessCustomPrior:
    def test_warmup_draws_reproducible(self):
        draws = []
        for _ in range(2):
            s = pc.Sampler(_SeedlessPrior(), gaussian_loglike,
                           vectorize=True, random_state=0,
                           n_effective=256, n_active=128,
                           precondition=False)
            s.run(n_total=256, n_evidence=0, progress=False)
            draws.append(np.array(s.prior_samples))
        np.testing.assert_array_equal(draws[0], draws[1])
