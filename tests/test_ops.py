"""Unit tests for weight numerics and resampling (ops layer).

Mirrors/extends the reference's invariants (tests/test_tools.py) and adds
statistical checks the reference lacks (SURVEY.md section 4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pocomc_tpu.ops.weights import (effective_sample_size, unique_sample_size,
                                    compute_ess, trim_weights,
                                    compute_logw_and_logz, bisect_beta,
                                    compute_logw_and_logz_jax, ess_jax)
from pocomc_tpu.ops.resampling import (systematic_resample, multinomial_resample,
                                       systematic_resample_jax,
                                       multinomial_resample_jax)


class TestESS:
    def test_degenerate_single_particle(self):
        assert compute_ess(np.array([0.5])) == 1.0
        assert compute_ess(np.array([-1000.0])) == 1.0

    def test_uniform_weights(self):
        w = np.ones(100)
        assert effective_sample_size(w) == pytest.approx(100.0)

    def test_concentrated(self):
        w = np.zeros(100)
        w[0] = 1.0
        assert effective_sample_size(w) == pytest.approx(1.0)

    def test_uss_uniform(self):
        w = np.ones(100)
        # expected unique of 100 draws from uniform over 100
        expect = 100 * (1 - (1 - 0.01) ** 100)
        assert unique_sample_size(w) == pytest.approx(expect)

    def test_jax_matches_numpy(self):
        rng = np.random.default_rng(0)
        w = rng.random(256)
        np.testing.assert_allclose(float(ess_jax(jnp.asarray(w))),
                                   effective_sample_size(w), rtol=1e-5)


class TestTrim:
    def test_degenerate_total_weight_raises(self):
        # all-zero / non-finite totals have no defined trim threshold;
        # must fail loudly instead of NaN-cascading through percentile
        with pytest.raises(ValueError, match="positive, finite"):
            trim_weights(np.zeros(100))
        with pytest.raises(ValueError, match="positive, finite"):
            trim_weights(np.array([1.0, np.nan, 2.0]))

    def test_keeps_ess_fraction(self):
        rng = np.random.default_rng(1)
        w = rng.pareto(1.0, size=2000) + 1e-12
        mask, wt = trim_weights(w, ess=0.99)
        total = effective_sample_size(w)
        trimmed = effective_sample_size(wt)
        assert trimmed / total >= 0.99
        assert mask.sum() == len(wt)
        assert wt.sum() == pytest.approx(1.0)

    def test_uniform_keeps_everything(self):
        w = np.ones(100)
        mask, wt = trim_weights(w)
        assert mask.all()


class TestLogwLogz:
    def test_single_iteration_beta0(self):
        # One warmup iteration at beta=0: weights to beta=1 are the raw
        # tempered likelihood ratios; logz = logsumexp(logl) - log(n).
        logl = np.array([[-1.0, -2.0, -3.0, -4.0]])
        beta = np.array([0.0])
        logz = np.array([0.0])
        logw, lz = compute_logw_and_logz(logl, beta, logz, 1.0)
        expect = np.log(np.mean(np.exp(logl[0])))
        assert lz == pytest.approx(expect)
        # normalized
        assert np.exp(logw).sum() == pytest.approx(1.0)

    def test_beta_equal_component_gives_uniform(self):
        # Single stored iteration, reweighting to its own temperature:
        # logw constant -> uniform.
        logl = np.array([[-1.0, -2.0, -3.0]])
        beta = np.array([0.7])
        logz = np.array([0.0])
        logw, _ = compute_logw_and_logz(logl, beta, logz, 0.7)
        np.testing.assert_allclose(logw, logw[0] * np.ones(3), rtol=1e-10)

    def test_jax_matches_numpy(self):
        rng = np.random.default_rng(2)
        T, n = 5, 64
        logl = rng.normal(-10, 3, size=(T, n))
        beta = np.sort(rng.random(T))
        logz = np.cumsum(-rng.random(T))
        logw_np, lz_np = compute_logw_and_logz(logl, beta, logz, 0.9)
        valid = jnp.ones(T, dtype=bool)
        logw_j, lz_j = compute_logw_and_logz_jax(
            jnp.asarray(logl, dtype=jnp.float32), jnp.asarray(beta, dtype=jnp.float32),
            jnp.asarray(logz, dtype=jnp.float32), valid, jnp.float32(0.9))
        np.testing.assert_allclose(float(lz_j), lz_np, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(logw_j), logw_np, rtol=1e-3, atol=1e-4)


class TestBisectBeta:
    def _hist(self):
        rng = np.random.default_rng(3)
        logl = rng.normal(-50, 10, size=(3, 128))
        beta = np.array([0.0, 0.0, 0.0])
        logz = np.array([0.0, 0.0, 0.0])
        return logl, beta, logz

    def test_moves_beta_up(self):
        logl, beta, logz = self._hist()
        b, logw, ess, lz = bisect_beta(logl, beta, logz, 0.0, 64.0)
        assert 0.0 < b <= 1.0
        assert abs(ess - 64.0) < 0.01 * 64.0 or b == 1.0

    def test_jumps_to_one_when_easy(self):
        # nearly-equal likelihoods: ESS stays high at beta=1
        logl = np.full((1, 128), -10.0) + 1e-6 * np.arange(128)
        b, logw, ess, lz = bisect_beta(logl, np.array([0.0]), np.array([0.0]),
                                       0.0, 64.0)
        assert b == 1.0

    def test_unattainable_tolerance_terminates_with_closest_trial(self):
        """One enormously dominant likelihood: ESS(beta) crashes from n to
        ~1 inside an interval far narrower than 80 halvings of (0, 1] can
        resolve, so the 1% tolerance is unattainable — the reference's bare
        `while True` (sampler.py:764-777) keeps spinning; the bounded loop
        must return the trial whose metric came closest to the target."""
        logl = np.zeros((1, 64))
        logl[0, 0] = 1e300
        b, logw, ess, lz = bisect_beta(
            logl, np.array([0.0]), np.array([0.0]), 0.0, 32.0)
        assert 0.0 <= b <= 1.0
        assert np.isfinite(ess) and np.isfinite(lz)
        assert logw.shape == (64,)
        # the closest reachable trial concentrates all mass -> ESS ~ 1
        assert ess == pytest.approx(1.0, abs=1e-6)
        # returned tuple is internally consistent with a direct reweight
        logw_ref, lz_ref = compute_logw_and_logz(
            logl, np.array([0.0]), np.array([0.0]), b)
        np.testing.assert_allclose(logw, logw_ref, atol=1e-12)
        assert lz == pytest.approx(lz_ref, rel=1e-12)

    def test_hoisted_denominator_matches_direct_reweight(self):
        """bisect_beta precomputes the beta-independent MIS denominator;
        its per-trial (logw, logz) must equal a direct
        compute_logw_and_logz call at the selected beta."""
        rng = np.random.default_rng(11)
        logl = rng.normal(-30, 5, size=(4, 96))
        beta = np.array([0.0, 0.05, 0.21, 0.6])
        logz = np.array([0.0, -1.2, -3.4, -8.0])
        b, logw, ess, lz = bisect_beta(logl, beta, logz, 0.6, 48.0)
        logw_ref, lz_ref = compute_logw_and_logz(logl, beta, logz, b)
        np.testing.assert_allclose(logw, logw_ref, rtol=1e-12, atol=1e-12)
        assert lz == pytest.approx(lz_ref, rel=1e-12)


class TestResampling:
    def test_systematic_proportional(self):
        rng = np.random.default_rng(4)
        w = np.array([0.6, 0.2, 0.15, 0.05])
        counts = np.zeros(4)
        for _ in range(200):
            idx = systematic_resample(4, w, rng)
            counts += np.bincount(idx, minlength=4)
        freq = counts / counts.sum()
        np.testing.assert_allclose(freq, w, atol=0.05)

    def test_multinomial_proportional(self):
        rng = np.random.default_rng(5)
        w = np.array([0.6, 0.2, 0.15, 0.05])
        idx = multinomial_resample(20000, w, rng)
        freq = np.bincount(idx, minlength=4) / 20000
        np.testing.assert_allclose(freq, w, atol=0.02)

    def test_jax_versions(self):
        w = jnp.asarray([0.5, 0.3, 0.2])
        idx_s = systematic_resample_jax(jax.random.key(0), 300, w)
        idx_m = multinomial_resample_jax(jax.random.key(1), 300, w)
        for idx in (idx_s, idx_m):
            assert idx.shape == (300,)
            assert int(idx.min()) >= 0 and int(idx.max()) <= 2
        freq = np.bincount(np.asarray(idx_s), minlength=3) / 300
        np.testing.assert_allclose(freq, np.asarray(w), atol=0.05)

    def test_systematic_deterministic_given_offset(self):
        # all mass on one particle -> all indices 0
        w = np.array([1.0, 0.0, 0.0])
        idx = systematic_resample(5, w, np.random.default_rng(0))
        assert (idx == 0).all()


class TestMISDenominatorCache:
    """Particles.mis_denominator: incremental O(T*n) maintenance of the
    balance-heuristic denominator must agree with the direct
    compute_logw_and_logz build at every append, after rollbacks, and
    after retroactive history edits (which force a rebuild)."""

    def _direct(self, p, beta_final=1.0):
        logl = np.stack([np.asarray(v, dtype=np.float64)
                         for v in p.past["logl"]])
        beta = np.asarray(p.past["beta"], dtype=np.float64)
        logz = np.asarray(p.past["logz"], dtype=np.float64)
        return compute_logw_and_logz(logl, beta, logz, beta_final)

    def test_incremental_appends_match_direct(self):
        from pocomc_tpu.particles import Particles
        rng = np.random.default_rng(7)
        n = 64
        p = Particles(n, 3)
        for t in range(12):
            p.update({"logl": rng.normal(-30, 5, n),
                      "beta": float(min(1.0, 0.09 * (t + 1))),
                      "logz": float(-0.4 * t)})
            lw1, lz1 = p.compute_logw_and_logz(0.7)
            lw2, lz2 = self._direct(p, 0.7)
            np.testing.assert_allclose(lw1, lw2, atol=1e-12)
            assert abs(lz1 - lz2) < 1e-12

    def test_pop_rollback_and_retroactive_edit_rebuild(self):
        from pocomc_tpu.particles import Particles
        rng = np.random.default_rng(8)
        n = 32
        p = Particles(n, 3)
        for t in range(6):
            p.update({"logl": rng.normal(-30, 5, n),
                      "beta": 0.15 * (t + 1), "logz": -0.4 * t})
        p.compute_logw_and_logz(1.0)  # populate the cache at T=6
        for k in ("logl", "beta", "logz"):
            p.pop(k)
        lw1, lz1 = p.compute_logw_and_logz(1.0)
        lw2, lz2 = self._direct(p)
        np.testing.assert_allclose(lw1, lw2, atol=1e-12)
        assert abs(lz1 - lz2) < 1e-12
        # retroactive logz edit invalidates the cached prefix
        p.past["logz"][0] = -3.0
        lw1, lz1 = p.compute_logw_and_logz(1.0)
        lw2, lz2 = self._direct(p)
        np.testing.assert_allclose(lw1, lw2, atol=1e-12)
        assert abs(lz1 - lz2) < 1e-12

    def test_bisect_beta_accepts_cached_denominator(self):
        from pocomc_tpu.particles import Particles
        rng = np.random.default_rng(9)
        n = 128
        p = Particles(n, 3)
        for t in range(5):
            p.update({"logl": rng.normal(-30, 5, n),
                      "beta": 0.1 * (t + 1), "logz": -0.4 * t})
        B, logl = p.mis_denominator()
        beta = np.asarray(p.past["beta"])
        logz = np.asarray(p.past["logz"])
        r_cached = bisect_beta(logl, beta, logz, 0.5, 64.0,
                               B_flat=B.reshape(-1))
        r_direct = bisect_beta(logl, beta, logz, 0.5, 64.0)
        assert r_cached[0] == r_direct[0]
        np.testing.assert_allclose(r_cached[1], r_direct[1], atol=1e-12)
        assert abs(r_cached[3] - r_direct[3]) < 1e-12

    def test_bisect_beta_rejects_mismatched_denominator(self):
        logl = np.zeros((2, 4))
        with pytest.raises(ValueError):
            bisect_beta(logl, np.array([0.1, 0.2]), np.zeros(2), 0.1, 2.0,
                        B_flat=np.zeros(3))

    def test_snapshot_guards_inplace_mutation(self):
        from pocomc_tpu.particles import Particles
        rng = np.random.default_rng(10)
        n = 16
        p = Particles(n, 3)
        block = rng.normal(-30, 5, n)
        p.update({"logl": block, "beta": 0.3, "logz": -0.1})
        B0, _ = p.mis_denominator()
        block[:] = 0.0  # caller mutates its array after the fold
        B1, _ = p.mis_denominator()
        np.testing.assert_array_equal(B0, B1)
