"""Checkpoint save / load / resume integration (mirrors reference
tests/test_state.py:37-63)."""

import numpy as np
import jax.numpy as jnp
import pytest

import pocomc_tpu as pc


def loglike(x):
    return -0.5 * jnp.sum(x**2, axis=-1) - jnp.log(2 * jnp.pi)


def make_sampler(tmp_path, seed=0):
    prior = pc.Prior([pc.Normal(0, 5), pc.Normal(0, 5)])
    return pc.Sampler(prior, loglike, vectorize=True, random_state=seed,
                      n_effective=256, n_active=128, precondition=False,
                      output_dir=str(tmp_path))


def test_save_creates_file(tmp_path):
    s = make_sampler(tmp_path)
    s.run(n_total=256, n_evidence=0, progress=False)
    path = tmp_path / "pmc_test.state"
    s.save_state(path)
    assert path.exists()


def test_save_every_and_resume(tmp_path):
    s = make_sampler(tmp_path)
    s.run(n_total=512, n_evidence=0, progress=False, save_every=2)
    states = sorted(tmp_path.glob("pmc_*.state"))
    assert len(states) >= 2
    assert (tmp_path / "pmc_final.state").exists()
    t_done = s.t
    logz_done, _ = s.evidence()

    # resume from an intermediate state and finish the run
    intermediate = [p for p in states if "final" not in p.name][0]
    s2 = make_sampler(tmp_path, seed=1)
    s2.run(n_total=512, n_evidence=0, progress=False,
           resume_state_path=intermediate)
    assert s2.t >= t_done - 2
    logz2, _ = s2.evidence()
    assert abs(logz2 - logz_done) < 0.5


def test_state_roundtrip_preserves_history(tmp_path):
    s = make_sampler(tmp_path)
    s.run(n_total=256, n_evidence=0, progress=False)
    path = tmp_path / "pmc_rt.state"
    s.save_state(path)

    s2 = make_sampler(tmp_path, seed=2)
    s2.load_state(path)
    assert s2.t == s.t
    assert s2.calls == s.calls
    np.testing.assert_allclose(s2.particles.get("logl", flat=True),
                               s.particles.get("logl", flat=True))
    lw1, lz1 = s.particles.compute_logw_and_logz(1.0)
    lw2, lz2 = s2.particles.compute_logw_and_logz(1.0)
    assert lz1 == pytest.approx(lz2)


def test_extend_finished_run(tmp_path):
    """Resume a finished run with a larger n_total (reference
    docs/source/checkpoint.ipynb 'Load and Add More Samples')."""
    s = make_sampler(tmp_path)
    s.run(n_total=256, n_evidence=0, progress=False)
    path = tmp_path / "pmc_ext.state"
    s.save_state(path)
    t1 = s.t

    s2 = make_sampler(tmp_path, seed=3)
    s2.run(n_total=1024, n_evidence=0, progress=False, resume_state_path=path)
    assert s2.t >= t1
    logw, _ = s2.particles.compute_logw_and_logz(1.0)
    w = np.exp(logw - logw.max())
    assert pc.effective_sample_size(w) >= 1024 * 0.9


def test_sampler_pickle_roundtrip(tmp_path):
    """Pickling the Sampler object itself (reference __getstate__ parity)
    and continuing the run after unpickling."""
    import pickle
    s = make_sampler(tmp_path)
    s.run(n_total=256, n_evidence=0, progress=False)
    s2 = pickle.loads(pickle.dumps(s))
    assert s2.t == s.t and s2.calls == s.calls
    lz1 = s.particles.compute_logw_and_logz(1.0)[1]
    lz2 = s2.particles.compute_logw_and_logz(1.0)[1]
    assert lz1 == pytest.approx(lz2)
    # extend with a termination ESS that provably exceeds what the
    # resumed history can deliver (ESS <= total stored rows), so at
    # least one more iteration MUST run regardless of the trajectory
    n_more = s.t * s.n_active + s.n_active
    s2.run(n_total=n_more, n_evidence=0, progress=False)
    assert s2.t > s.t


def test_orbax_checkpoint_roundtrip(tmp_path):
    """'.orbax' paths select the orbax/tensorstore directory format
    (utils/checkpoint.py); state round-trips exactly, including the
    128-bit PCG64 RNG state through the JSON sidecar."""
    import jax.numpy as jnp
    import pocomc_tpu as pc

    prior = pc.Prior([pc.Normal(0, 3), pc.Normal(0, 3)])
    ll = lambda x: -0.5 * jnp.sum(x**2, axis=-1)
    s = pc.Sampler(prior, ll, vectorize=True, random_state=0,
                   n_effective=128, n_active=64, precondition=True,
                   flow="nsf3", train_config={"epochs": 20, "patience": 3})
    s.run(n_total=256, n_evidence=256, progress=False)
    p = tmp_path / "run.orbax"
    s.save_state(p)
    assert (p / "arrays").exists() and (p / "meta").exists()

    s2 = pc.Sampler(prior, ll, vectorize=True, random_state=1,
                    n_effective=128, n_active=64, precondition=True,
                    flow="nsf3", train_config={"epochs": 20, "patience": 3})
    s2.load_state(p)
    assert s2.t == s.t and s2.calls == s.calls
    assert s2._rng.bit_generator.state == s._rng.bit_generator.state
    np.testing.assert_allclose(s2.particles.get("x"), s.particles.get("x"))
    x1, _, _, _ = s.posterior()
    x2, _, _, _ = s2.posterior()
    np.testing.assert_allclose(x1, x2)


def test_mid_warmup_resume_does_not_duplicate_batches(tmp_path):
    """A checkpoint taken mid-warmup (warmup=True with some prior-stage
    slots already stored) must resume at the next batch, not replay from
    batch 0 — replayed slots would double-count their beta=0 terms in
    the multiple-IS denominator."""
    s = make_sampler(tmp_path)
    s.run(n_total=256, n_evidence=0, progress=False)
    n_batches = s.n_prior // s.n_active
    betas = np.asarray(s.particles.get("beta"))
    assert int((betas == 0).sum()) == n_batches

    # fabricate a mid-warmup checkpoint: first warmup slot only
    state = s.state_dict()
    state["particles_past"] = {k: v[:1] for k, v in
                               state["particles_past"].items()}
    state["warmup"] = True
    state["t"] = 0
    state["calls"] = s.n_active

    s2 = make_sampler(tmp_path)
    s2.load_state_dict(state)
    s2.run(n_total=256, n_evidence=0, progress=False)
    betas2 = np.asarray(s2.particles.get("beta"))
    assert int((betas2 == 0).sum()) == n_batches  # not n_batches + 1
