"""Flow-anchored bridge evidence (bridge.py + sampler evidence_bridge):
the warped temperature path that replaces the raw persistent-sampling
ladder read-out for run(n_evidence=0). Beyond reference: the reference
has only the prior-anchored ladder (its sampler.py:717-805 tempering
loop + particles.py:215-231 accumulation)."""

import numpy as np
import jax.numpy as jnp
import pytest

import pocomc_tpu as pc
from scipy.stats import norm


def _gauss(d=4, ps=5.0):
    def loglike(x):
        return -0.5 * jnp.sum(x**2, axis=-1) - d / 2 * jnp.log(2 * jnp.pi)
    expect = d * norm.logpdf(0, 0, np.sqrt(1 + ps**2))
    prior = pc.Prior([pc.Normal(0, ps) for _ in range(d)])
    return loglike, prior, expect


def test_bridge_known_answer_default_on():
    """run(n_evidence=0) reports the bridge estimate by default and it
    matches the analytic evidence; the diagnostics record the ladder."""
    loglike, prior, expect = _gauss()
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=256, n_active=128, flow="nsf3",
                   bridge_n=1024,
                   train_config={"epochs": 40, "patience": 5})
    s.run(n_total=512, n_evidence=0, progress=False)
    assert s.bridge_diagnostics is not None
    assert s.bridge_diagnostics["rungs"] >= 1
    assert s.bridge_diagnostics["calls"] >= 1024
    assert s.logz == pytest.approx(s.bridge_diagnostics["logz"])
    assert s.logz == pytest.approx(expect, abs=0.35)
    # on a well-fit Gaussian the schedule must be SHORT (the estimator
    # degenerates toward flow-IS); a long ladder here means the ESS
    # controller is broken
    assert s.bridge_diagnostics["rungs"] <= 6


def test_bridge_off_keeps_ladder():
    loglike, prior, expect = _gauss()
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=256, n_active=128, flow="nsf3",
                   evidence_bridge=False,
                   train_config={"epochs": 40, "patience": 5})
    s.run(n_total=512, n_evidence=0, progress=False)
    assert s.bridge_diagnostics is None
    rec = float(s.particles.compute_logw_and_logz(1.0, recorrect=True)[1])
    assert s.logz == pytest.approx(rec)


def test_bridge_validation():
    loglike, prior, _ = _gauss()
    with pytest.raises(ValueError, match="evidence_bridge"):
        pc.Sampler(prior, loglike, evidence_bridge="bogus")
    with pytest.raises(ValueError, match="bridge_n"):
        pc.Sampler(prior, loglike, bridge_n=1)
    with pytest.raises(ValueError, match="bridge_steps"):
        pc.Sampler(prior, loglike, bridge_steps=0)
    # explicit True without preconditioning is an eager error
    with pytest.raises(ValueError, match="evidence_bridge"):
        pc.Sampler(prior, loglike, vectorize=True, precondition=False,
                   evidence_bridge=True)


def test_bridge_blackbox_host_path():
    """Non-traceable (plain-numpy) likelihoods get the bridge too, via
    the host-driven variant (device pullbacks + Python likelihood
    between steps): known-answer Gaussian, diagnostics populated."""
    from scipy.stats import norm
    d = 2

    def loglike(x):
        x = np.asarray(x)
        return -0.5 * np.sum(x**2, axis=-1) - d / 2 * np.log(2 * np.pi)

    expect = d * norm.logpdf(0, 0, np.sqrt(26.0))
    prior = pc.Prior([pc.Normal(0, 5) for _ in range(d)])
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=256, n_active=128, flow="nsf3",
                   bridge_n=512,
                   train_config={"epochs": 30, "patience": 5})
    assert not s.likelihood_traceable
    s.run(n_total=512, n_evidence=0, progress=False)
    assert s.bridge_diagnostics is not None
    assert s.bridge_diagnostics["rungs"] >= 1
    assert s.logz == pytest.approx(expect, abs=0.4)
    assert s.logz_err is not None and 0 < s.logz_err < 0.5


def test_bridge_counts_calls():
    loglike, prior, _ = _gauss()
    s0 = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                    n_effective=256, n_active=128, flow="nsf3",
                    evidence_bridge=False,
                    train_config={"epochs": 40, "patience": 5})
    s0.run(n_total=512, n_evidence=0, progress=False)
    s1 = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                    n_effective=256, n_active=128, flow="nsf3",
                    bridge_n=1024,
                    train_config={"epochs": 40, "patience": 5})
    s1.run(n_total=512, n_evidence=0, progress=False)
    assert s1.calls >= s0.calls + 1024  # bridge work is accounted
