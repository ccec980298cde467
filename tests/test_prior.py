"""Prior tests (mirrors reference tests/test_prior.py:10-51 and adds
scipy-conversion and traceability checks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats

from pocomc_tpu.prior import Prior, Normal, Uniform


class TestJaxPrior:
    def setup_method(self):
        self.prior = Prior([Normal(0, 1), Uniform(0, 1)])

    def test_dim(self):
        assert self.prior.dim == 2

    def test_bounds(self):
        b = self.prior.bounds
        assert b.shape == (2, 2)
        np.testing.assert_allclose(b[1], [0.0, 1.0])
        assert b[0, 0] == -np.inf and b[0, 1] == np.inf

    def test_rvs_shape_and_support(self):
        s = self.prior.rvs(100, random_state=0)
        assert s.shape == (100, 2)
        assert (s[:, 1] >= 0).all() and (s[:, 1] <= 1).all()

    def test_logpdf(self):
        x = np.array([[0.0, 0.5], [0.0, 0.5]])
        lp = np.asarray(self.prior.logpdf(jnp.asarray(x)))
        # N(0,1) at 0 + U(0,1) at .5 = -0.5*log(2*pi)
        np.testing.assert_allclose(lp, -0.5 * np.log(2 * np.pi) * np.ones(2),
                                   rtol=1e-5)

    def test_logpdf_outside_support(self):
        x = np.array([[0.0, 2.0]])
        lp = np.asarray(self.prior.logpdf(jnp.asarray(x)))
        assert lp[0] == -np.inf

    def test_traceable(self):
        assert self.prior.traceable
        jitted = jax.jit(self.prior.logpdf)
        lp = jitted(jnp.zeros((4, 2)) + 0.5)
        assert np.isfinite(np.asarray(lp)).all()


class TestScipyConversion:
    def test_common_dists_match_scipy(self):
        pairs = [
            (stats.norm(1.0, 2.0), None),
            (stats.uniform(-3.0, 6.0), None),
            (stats.expon(0.0, 2.0), None),
            (stats.beta(2.0, 3.0), None),
            (stats.gamma(2.5), None),
            (stats.cauchy(0.5, 1.5), None),
            (stats.laplace(0.0, 2.0), None),
            (stats.t(4.0), None),
            (stats.halfnorm(0.0, 1.5), None),
            (stats.lognorm(0.8), None),
            (stats.truncnorm(-1.0, 2.0, loc=0.5, scale=2.0), None),
        ]
        prior = Prior([p for p, _ in pairs])
        assert prior.traceable
        x = np.stack([p.rvs(size=50, random_state=i) for i, (p, _) in enumerate(pairs)],
                     axis=1)
        got = np.asarray(prior.logpdf(jnp.asarray(x, dtype=jnp.float64)))
        expect = np.zeros(50)
        for i, (p, _) in enumerate(pairs):
            expect += p.logpdf(x[:, i])
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)

    def test_unknown_scipy_dist_falls_back(self):
        prior = Prior([stats.skewnorm(3.0), stats.norm(0, 1)])
        assert not prior.traceable
        x = prior.rvs(20, random_state=1)
        assert x.shape == (20, 2)
        lp = prior.logpdf(x)
        assert np.isfinite(lp).all()

    def test_rvs_statistics(self):
        prior = Prior([stats.norm(2.0, 0.5)])
        s = prior.rvs(4000, random_state=0)
        assert abs(s.mean() - 2.0) < 0.05
        assert abs(s.std() - 0.5) < 0.05


class _SeedlessDist:
    """Duck-typed dist whose rvs signature has no random_state (the case
    the reference covers by seeding np.random globally, ref
    sampler.py:195-197)."""

    def rvs(self, size=1):
        return np.random.rand(size)

    def logpdf(self, x):
        return np.where((x >= 0) & (x <= 1), 0.0, -np.inf)

    def support(self):
        return (0.0, 1.0)


class TestDuckTypedSeeding:
    def test_rvs_reproducible_without_random_state_support(self):
        prior = Prior([_SeedlessDist(), Normal(0, 1)])
        assert not prior.traceable
        a = prior.rvs(50, random_state=0)
        b = prior.rvs(50, random_state=0)
        np.testing.assert_array_equal(a, b)
        c = prior.rvs(50, random_state=1)
        assert not np.array_equal(a[:, 0], c[:, 0])

    def test_rvs_restores_global_np_random_state(self):
        prior = Prior([_SeedlessDist()])
        np.random.seed(123)
        expected_next = np.random.rand()
        np.random.seed(123)
        prior.rvs(10, random_state=0)
        assert np.random.rand() == expected_next

    def test_rvs_seeded_scipy_without_typeerror_path(self):
        # unconvertible scipy dists DO take random_state — the primary path
        prior = Prior([stats.skewnorm(3.0)])
        a = prior.rvs(30, random_state=7)
        b = prior.rvs(30, random_state=7)
        np.testing.assert_array_equal(a, b)
