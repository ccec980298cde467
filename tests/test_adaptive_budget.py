"""Adaptive mutation budget (corr_threshold) + device-side termination
guard + evidence_method='auto' — the round-3 accuracy/efficiency layer.

The decorrelation criterion is beyond-reference: the reference's plateau
rule (mcmc.py:169-180) stops a sweep once the walker-mean energy stalls,
which on curved geometries happens long before the resampled duplicates
have decorrelated. corr_threshold requires the measured start-position
correlation to fall below a target before the sweep may stop.
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pocomc_tpu as pc
from pocomc_tpu.mcmc import make_sweep, make_loglike_device
from pocomc_tpu.models.geometry import fit_geometry_jax
from pocomc_tpu.prior import Prior, Normal
from pocomc_tpu.scaler import Reparameterize

N, D = 256, 3


def _sweep_steps(corr_threshold, sigma0, n_steps=1, n_max=60):
    """Steps taken by a plain tpcn sweep at fixed proposal scale regime."""
    prior = Prior([Normal(0.0, 3.0) for _ in range(D)])
    scaler = Reparameterize(D, bounds=prior.bounds)

    def log_like(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    key = jax.random.key(0)
    u = jax.random.normal(key, (N, D)) * 0.5
    x, logdetj = scaler.inverse(u)
    logl = log_like(x)
    logp = prior.logpdf(x)
    geom = fit_geometry_jax(u, weights=jnp.full((N,), 1.0 / N),
                            key=jax.random.key(1))
    sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                       log_like=make_loglike_device(log_like, True, True),
                       n_dim=D, n_steps=n_steps, n_max=n_max, kind="tpcn",
                       preconditioned=False, plateau_z=0.75,
                       corr_threshold=corr_threshold)
    res = sweep(u, x, logdetj, logl, logp, jnp.float32(1.0),
                jnp.float32(sigma0), geom, jax.random.key(3))
    return int(res["steps"])


def test_corr_criterion_extends_poorly_mixing_sweeps():
    """With a tiny proposal scale the chain decorrelates slowly: the
    plateau rule alone stops early, the decorrelation criterion keeps
    the sweep going (here to the n_max cap region)."""
    steps_plain = _sweep_steps(corr_threshold=0.0, sigma0=0.05)
    steps_corr = _sweep_steps(corr_threshold=0.3, sigma0=0.05)
    assert steps_corr > 2 * steps_plain


def test_corr_criterion_cheap_when_mixing_is_fast():
    """At a healthy proposal scale decorrelation happens within (or near)
    the plateau window: the criterion must not inflate the budget."""
    steps_plain = _sweep_steps(corr_threshold=0.0, sigma0=0.9, n_steps=3)
    steps_corr = _sweep_steps(corr_threshold=0.5, sigma0=0.9, n_steps=3)
    assert steps_corr <= steps_plain + 3


def _drift_sweep(calib_z, center, sigma0=0.05, n_max=24, seed=0):
    """Plain tpcn sweep from a population centered at `center` (0 =
    equilibrium-ish start, >0 = displaced/hot start). Returns (steps,
    resid)."""
    prior = Prior([Normal(0.0, 3.0) for _ in range(D)])
    scaler = Reparameterize(D, bounds=prior.bounds)

    def log_like(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    key = jax.random.key(seed)
    u = jax.random.normal(key, (N, D)) * 0.5 + center
    x, logdetj = scaler.inverse(u)
    logl = log_like(x)
    logp = prior.logpdf(x)
    geom = fit_geometry_jax(u, weights=jnp.full((N,), 1.0 / N),
                            key=jax.random.key(1))
    sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                       log_like=make_loglike_device(log_like, True, True),
                       n_dim=D, n_steps=1, n_max=n_max, kind="tpcn",
                       preconditioned=False, plateau_z=0.75,
                       calib_z=calib_z)
    res = sweep(u, x, logdetj, logl, logp, jnp.float32(1.0),
                jnp.float32(sigma0), geom, jax.random.key(3))
    return int(res["steps"]), float(res["resid"])


def test_drift_criterion_extends_relaxing_sweeps():
    """A displaced start population relaxes coherently for many small-
    sigma steps; the paired windowed drift test must keep the sweep
    alive past the plateau exit, and the residual-hotness extrapolation
    must report the unfinished relaxation with the right sign (mean
    logl INCREASES toward the mode => resid > 0... here the displaced
    start has LOWER logl, so relaxation raises it: D > 0)."""
    steps_plain, _ = _drift_sweep(calib_z=0.0, center=2.0)
    steps_drift, resid = _drift_sweep(calib_z=3.0, center=2.0)
    assert steps_drift > steps_plain
    # capped at n_max while still relaxing: the last window still shows
    # coherent positive drift, so the extrapolated residual is positive
    # and material on the logl scale (population spans O(1) nats)
    assert resid > 0.05


def test_drift_criterion_quiet_at_equilibrium():
    """Starting AT the target with a healthy proposal scale: the drift
    statistics are calibrated N(0,1) noise and the criterion must not
    extend the sweep by more than ~one window."""
    from pocomc_tpu.mcmc import CALIB_W
    steps_plain, _ = _drift_sweep(calib_z=0.0, center=0.0, sigma0=0.9)
    steps_drift, resid = _drift_sweep(calib_z=3.0, center=0.0, sigma0=0.9)
    assert steps_drift <= steps_plain + CALIB_W
    assert abs(resid) < 0.5


def test_reweight_ladder_residual_correction():
    """Phase A ADDS dbeta * resid_prev to a MOVING rung (resid is the
    extrapolated remaining mean-logl drift = MINUS the stage hotness, so
    a hot stage's negative resid LOWERS the upward-biased rung; sign
    verified against the closed-form gauss50 oracle, RESULTS.md round 3)
    and leaves a stalled rung alone (the carry rule)."""
    from pocomc_tpu.parallel import fused

    n, d, t_max = 64, 2, 4
    rng = np.random.default_rng(1)
    u = rng.normal(size=(1, n, d))
    logl = rng.normal(size=(1, n)) * 0.3 - 1.0
    beta = np.array([0.0])
    logz = np.array([0.0])
    hist = fused.history_from_numpy(u, u, np.zeros((1, n)), logl,
                                    np.zeros((1, n)), beta, logz, t_max)
    progA = fused.make_reweight_program(n, n)
    out0 = progA(hist, jnp.float32(n // 2), jnp.float32(1e9))
    # a hot stage reports NEGATIVE resid; the corrected rung must be LOWER
    out1 = progA(hist, jnp.float32(n // 2), jnp.float32(1e9),
                 jnp.float32(-2.0))
    db = float(out0["beta"]) - 0.0
    assert db > 0.0
    assert float(out1["logz"]) == pytest.approx(
        float(out0["logz"]) - db * 2.0, abs=1e-5)
    assert float(out1["logz"]) < float(out0["logz"])


def test_corr_threshold_validation():
    prior = Prior([Normal(0, 5), Normal(0, 5)])
    like = lambda x: -0.5 * jnp.sum(x**2, axis=-1)
    with pytest.raises(ValueError, match="corr_threshold"):
        pc.Sampler(prior, like, vectorize=True, corr_threshold=1.0)
    with pytest.raises(ValueError, match="corr_threshold"):
        pc.Sampler(prior, like, vectorize=True, corr_threshold=-0.1)
    with pytest.raises(ValueError, match="evidence_method"):
        pc.Sampler(prior, like, vectorize=True, evidence_method="bogus")


def test_termination_guard_noops_after_termination():
    """Craft a history whose termination criterion already holds: phase A
    must report terminated and phase C must skip (no slot, no calls)."""
    from pocomc_tpu.parallel import fused
    from pocomc_tpu.models.geometry import _fit_geometry_impl

    n, d, t_max = 64, 2, 4
    rng = np.random.default_rng(0)
    u = rng.normal(size=(2, n, d))
    logl = np.full((2, n), -1.0) + rng.normal(size=(2, n)) * 1e-3
    beta = np.array([0.0, 1.0])
    logz = np.array([0.0, -1.0])
    hist = fused.history_from_numpy(u, u, np.zeros((2, n)), logl,
                                    np.zeros((2, n)), beta, logz, t_max)

    progA = fused.make_reweight_program(n, n)
    outA = progA(hist, jnp.float32(n // 2), jnp.float32(4.0))
    assert bool(outA["terminated"])
    # not terminated when n_total is out of reach
    outA2 = progA(hist, jnp.float32(n // 2), jnp.float32(1e9))
    assert not bool(outA2["terminated"])

    prior = Prior([Normal(0.0, 3.0) for _ in range(d)])
    scaler = Reparameterize(d, bounds=prior.bounds)
    sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                       log_like=make_loglike_device(
                           lambda x: -0.5 * jnp.sum(x**2, -1), True, True),
                       n_dim=d, n_steps=2, n_max=4, kind="tpcn",
                       preconditioned=False)
    progC = fused.make_mutate_program(sweep.raw, n, preconditioned=False)
    geom = _fit_geometry_impl(jnp.asarray(u[0], jnp.float32),
                              jnp.full((n,), 1.0 / n), jax.random.key(0))
    args = (outA["beta"], outA["logz"], outA["w_flat"], outA["u_sel"],
            outA["w_sel"], jnp.float32(0.5), geom, None, np.uint32(7), None)

    hist_skip, stats_skip = progC(hist, *args, outA["terminated"])
    assert int(hist_skip.t) == int(hist.t)          # no slot written
    assert float(stats_skip[2]) == 0.0               # no likelihood calls
    assert float(stats_skip[6]) == 1.0               # noop flag

    hist_run, stats_run = progC(hist, *args, outA2["terminated"])
    assert int(hist_run.t) == int(hist.t) + 1
    assert float(stats_run[2]) > 0
    assert float(stats_run[6]) == 0.0


def test_device_loop_slot_accounting_with_pipeline():
    """Full device-loop run at pipeline depth 3: the no-op guard must
    keep host iteration/slot accounting consistent (t == stored slots)
    and calls must exclude skipped iterations."""
    prior = Prior([Normal(0, 5), Normal(0, 5)])

    def like(x):
        return -0.5 * jnp.sum(x**2, axis=-1) - jnp.log(2 * jnp.pi)

    s = pc.Sampler(prior, like, vectorize=True, random_state=0,
                   n_effective=256, n_active=128, precondition=True,
                   flow="nsf3", train_config={"epochs": 20, "patience": 3},
                   pipeline=3)
    s.run(n_total=512, n_evidence=256, progress=False)
    assert s._use_device_loop()
    assert s.t == s.particles.t
    # every stored iteration carries stats rows synced 1:1
    assert len(s._dev_iter_stats) == s.particles.t - s.n_prior // s.n_active
    from scipy.stats import norm
    assert abs(s.logz - 2 * norm.logpdf(0, 0, np.sqrt(26))) < 0.5


def test_warn_evidence_quality_auto_silences_moderate_tail():
    from pocomc_tpu.sampler import Sampler
    # auto + moderate tail: remediated by smoothing, no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        Sampler._warn_evidence_quality(0.1, khat=0.6, method="auto")
    # explicit 'is' keeps the advisory warning
    with pytest.warns(RuntimeWarning, match="heavy-tailed"):
        Sampler._warn_evidence_quality(0.1, khat=0.6, method="is")
    # hard tail always warns
    with pytest.warns(RuntimeWarning, match="k-hat"):
        Sampler._warn_evidence_quality(0.1, khat=0.8, method="auto")


def test_evidence_auto_records_method_used():
    prior = Prior([Normal(0, 5), Normal(0, 5)])

    def like(x):
        return -0.5 * jnp.sum(x**2, axis=-1) - jnp.log(2 * jnp.pi)

    s = pc.Sampler(prior, like, vectorize=True, random_state=1,
                   n_effective=256, n_active=128, flow="nsf3",
                   train_config={"epochs": 20, "patience": 3})
    s.run(n_total=512, n_evidence=512, progress=False)
    assert s.evidence_method == "auto"
    assert s.evidence_method_used in ("is", "psis")
    expected = "psis" if s.evidence_khat > 0.5 else "is"
    assert s.evidence_method_used == expected


def test_device_loop_live_stats(monkeypatch):
    """The device loop's fused sweeps emit per-step stats through the
    live sink on callback-capable backends (reference mcmc.py:159-167
    shows calls/acc/steps during every sweep)."""
    from pocomc_tpu.utils.tools import ProgressBar

    per_step = []
    orig = ProgressBar.update_stats

    def spy(self, info):
        if set(info) == {"steps", "acc", "calls"}:
            per_step.append(dict(info))
        return orig(self, info)

    monkeypatch.setattr(ProgressBar, "update_stats", spy)

    prior = Prior([Normal(0, 5), Normal(0, 5)])

    def like(x):
        return -0.5 * jnp.sum(x**2, axis=-1) - jnp.log(2 * jnp.pi)

    s = pc.Sampler(prior, like, vectorize=True, random_state=0,
                   n_effective=256, n_active=128, flow="nsf3",
                   train_config={"epochs": 10, "patience": 3})
    assert s._use_device_loop() and s._live_stats
    s.run(n_total=512, n_evidence=0, progress=True)
    # more per-step emissions than iterations: sweeps run multiple steps
    n_iters = s.particles.t - s.n_prior // s.n_active
    assert len(per_step) > n_iters
    assert all(p["steps"] >= 1 for p in per_step)


def test_corr_threshold_auto_by_evidence_mode():
    """corr_threshold=None (default) resolves per evidence estimator:
    0.5 for flow-IS runs, 0.15 ladder-grade when run(n_evidence=0)
    selects the SMC persistent-sampling evidence (whose per-rung bias
    scales with the sweep-exit start-correlation; RESULTS.md round 3
    "decorrelation dose-response"). An explicit value is respected in
    both modes."""
    prior = Prior([Normal(0, 5), Normal(0, 5)])

    def like(x):
        return -0.5 * jnp.sum(x**2, axis=-1) - jnp.log(2 * jnp.pi)

    s = pc.Sampler(prior, like, vectorize=True, random_state=0,
                   n_effective=256, n_active=128, flow="nsf3",
                   train_config={"epochs": 10, "patience": 3})
    assert s._corr_auto and s.corr_threshold == 0.5
    cache_05 = s._prog_cache
    s.run(n_total=512, n_evidence=0, progress=False)
    assert s.corr_threshold == 0.15
    # the engine programs bake corr_threshold into their traces: the
    # mode switch must have re-fetched them, not just set the attribute
    assert s._prog_cache is not cache_05
    # extending the same run WITH flow-IS evidence relaxes back
    s.run(n_total=512, n_evidence=256, progress=False)
    assert s.corr_threshold == 0.5
    assert s._prog_cache is cache_05

    s2 = pc.Sampler(prior, like, vectorize=True, random_state=0,
                    n_effective=256, n_active=128, flow="nsf3",
                    corr_threshold=0.3,
                    train_config={"epochs": 10, "patience": 3})
    assert not s2._corr_auto
    s2.run(n_total=512, n_evidence=0, progress=False)
    assert s2.corr_threshold == 0.3


def test_corr_threshold_auto_cost_aware_for_black_box():
    """corr_threshold=None is cost-aware: black-box likelihoods (host
    callbacks — every call costs host wall-clock) floor the d-scaled
    auto target at 0.15 (reference-parity accuracy at reference-scale
    call budgets) instead of the aggressive 0.02 that fused device
    likelihoods can afford (at d=50 that target costs ~37M nearly-free
    device calls; through a host callback it would be a multi-hour
    run). Explicit values always win."""
    d = 25
    prior = Prior([Normal(0, 5) for _ in range(d)])

    def like_np(x):
        x = np.asarray(x)          # host-only: cannot trace
        return -0.5 * float(np.sum(x * x))

    s = pc.Sampler(prior, like_np, flow="maf3")
    assert s._corr_auto and not s.likelihood_traceable
    assert s.corr_threshold == 0.15            # floored, not 0.5*(10/25)^2

    def like_jax(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    s2 = pc.Sampler(prior, like_jax, vectorize=True, flow="maf3")
    assert s2.likelihood_traceable
    # traceable + auto: the bias_rate stopping rule is active, so the
    # d-scaled blanket target relaxes to the 0.15 ladder-grade cap (the
    # rate rule buys the hard-rung decorrelation instead)
    assert s2.bias_rate > 0.0
    assert s2.corr_threshold == 0.15
    # with the rate rule explicitly off, the d-scaled target returns
    s2b = pc.Sampler(prior, like_jax, vectorize=True, flow="maf3",
                     bias_rate=0.0)
    assert s2b.corr_threshold == pytest.approx(0.5 * (10.0 / d) ** 2)

    # explicit value wins over the cost-aware floor
    s3 = pc.Sampler(prior, like_np, flow="maf3", corr_threshold=0.02)
    assert not s3._corr_auto
    assert s3.corr_threshold == 0.02


def test_bias_rate_auto_cost_aware():
    """bias_rate=None resolves cost-aware like the corr target: active
    (0.4) for traceable likelihoods where sweep steps are nearly free,
    off for black-box likelihoods (their 0.15 target keeps
    reference-scale call budgets). Explicit values win; calib_z=0
    disables (reference-rule mode)."""
    d = 25
    prior = Prior([Normal(0, 5) for _ in range(d)])

    def like_np(x):
        x = np.asarray(x)
        return -0.5 * float(np.sum(x * x))

    def like_jax(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    s = pc.Sampler(prior, like_jax, vectorize=True, flow="maf3")
    assert s._bias_rate_auto and s.bias_rate == pytest.approx(0.4)
    # spending bound: the rate rule floors at the unrelaxed blanket
    # target raised to the measured 0.10 knee (0.5*(10/d)^2 = 0.08 at
    # d=25 -> 0.10); see sampler._bias_floor_value dose-response
    assert s.bias_floor == pytest.approx(0.10)

    s2 = pc.Sampler(prior, like_np, flow="maf3")
    assert s2._bias_rate_auto and s2.bias_rate == 0.0
    assert s2.bias_floor == 0.0

    s3 = pc.Sampler(prior, like_jax, vectorize=True, flow="maf3",
                    bias_rate=1.5)
    assert not s3._bias_rate_auto and s3.bias_rate == 1.5

    s4 = pc.Sampler(prior, like_jax, vectorize=True, flow="maf3",
                    calib_z=0.0)
    assert s4.bias_rate == 0.0

    with pytest.raises(ValueError, match="bias_rate"):
        pc.Sampler(prior, like_jax, vectorize=True, bias_rate=-0.1)

    # explicit bias_floor wins over the derived unrelaxed blanket value
    s5 = pc.Sampler(prior, like_jax, vectorize=True, flow="maf3",
                    bias_floor=0.06)
    assert not s5._bias_floor_auto and s5.bias_floor == 0.06
    with pytest.raises(ValueError, match="bias_floor"):
        pc.Sampler(prior, like_jax, vectorize=True, bias_floor=1.5)


def test_bias_rate_extends_high_stakes_rungs_only():
    """The bias-rate stopping rule (mcmc.py cond) keeps sweeping while
    corr * dbeta * Var(logl) > bias_rate: a rung whose dbeta * Var is
    large buys extra decorrelation steps; a rung with dbeta = 0 (the
    beta = 1 stalls) pays nothing beyond the plateau/corr rules."""
    prior = Prior([Normal(0.0, 3.0) for _ in range(D)])
    scaler = Reparameterize(D, bounds=prior.bounds)

    # wide likelihood scale => population Var(logl) is O(100)
    def log_like(x):
        return -5.0 * jnp.sum(x**2, axis=-1)

    key = jax.random.key(0)
    u = jax.random.normal(key, (N, D)) * 0.5
    x, logdetj = scaler.inverse(u)
    logl = log_like(x)
    logp = prior.logpdf(x)
    geom = fit_geometry_jax(u, weights=jnp.full((N,), 1.0 / N),
                            key=jax.random.key(1))

    def steps(bias_rate, dbeta, bias_floor=0.0):
        sweep = make_sweep(
            scaler=scaler, log_prior=prior.logpdf,
            log_like=make_loglike_device(log_like, True, True),
            n_dim=D, n_steps=2, n_max=80, kind="tpcn",
            preconditioned=False, plateau_z=0.75,
            corr_threshold=0.5, bias_rate=bias_rate,
            bias_floor=bias_floor)
        res = sweep(u, x, logdetj, logl, logp, jnp.float32(0.5),
                    jnp.float32(0.05), geom, jax.random.key(3),
                    dbeta=jnp.float32(dbeta))
        return int(res["steps"])

    s_off = steps(bias_rate=0.0, dbeta=0.1)
    s_on = steps(bias_rate=0.05, dbeta=0.1)
    s_stall = steps(bias_rate=0.05, dbeta=0.0)
    s_floored = steps(bias_rate=0.05, dbeta=0.1, bias_floor=0.5)
    assert s_on > s_off            # big dbeta * Var: rule buys steps
    assert s_stall == s_off        # dbeta = 0: rule is free
    # floor at the corr target: the rule may not demand decorrelation
    # beyond the blanket, so it buys nothing extra
    assert s_floored == s_off


def test_khat_triggered_evidence_refinement(monkeypatch):
    """k-hat > 0.7 after the evidence draw must extend the run (n_total
    doubles, new beta=1 rungs land in the history) and re-draw the
    evidence, up to evidence_refine rounds; the warning fires only on
    the final round (measured rescue: 25-D funnel err -2.19 -> -0.54
    over two rounds, RESULTS.md round 3)."""
    import warnings as _w

    prior = Prior([Normal(0, 5), Normal(0, 5)])

    def like(x):
        return -0.5 * jnp.sum(x**2, axis=-1) - jnp.log(2 * jnp.pi)

    s = pc.Sampler(prior, like, vectorize=True, random_state=0,
                   n_effective=256, n_active=128, flow="nsf3",
                   evidence_refine=1,
                   train_config={"epochs": 10, "patience": 3})

    calls = {"n": 0}
    orig = pc.Sampler._compute_evidence

    def fake(self, n=5000, warn=True):
        calls["n"] += 1
        orig(self, n, warn=warn)
        self.evidence_khat = 0.9   # force the hard-tail diagnostic
        if warn:
            self._warn_evidence_quality(0.0, self.evidence_khat,
                                        self.evidence_method)

    monkeypatch.setattr(pc.Sampler, "_compute_evidence", fake)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        s.run(n_total=256, n_evidence=256, progress=False)
    t_first = s.t
    # one refinement round: evidence drawn twice, n_total doubled,
    # history extended, counter unwound for future manual runs
    assert calls["n"] == 2
    assert s.n_total == 512
    assert s._refine_round == 0
    khat_warns = [w for w in rec
                  if "k-hat" in str(w.message) and "0.90" in str(w.message)]
    assert len(khat_warns) == 1   # suppressed while a round could react
    # the refinement really added beta=1 rungs
    assert s.particles.get("beta", index=-1) == 1.0
    assert t_first == s.t and s.t > 0


def test_hot_flag_stored_per_stage():
    """Every history stage must carry the exit-hot flag (a stored
    diagnostic column; a missing entry would silently misalign the
    per-stage columns)."""
    prior = Prior([Normal(0, 5), Normal(0, 5)])

    def like(x):
        return -0.5 * jnp.sum(x**2, axis=-1) - jnp.log(2 * jnp.pi)

    s = pc.Sampler(prior, like, vectorize=True, random_state=0,
                   n_effective=256, n_active=128, flow="nsf3",
                   train_config={"epochs": 10, "patience": 3})
    s.run(n_total=512, n_evidence=0, progress=False)
    n_stages = len(s.particles.past["beta"])
    assert len(s.particles.past["hot"]) == n_stages
    assert len(s.particles.past["resid"]) == n_stages


def test_moderate_tail_advisory_fires_despite_unused_refine_rounds(
        monkeypatch):
    """Regression (review round 3): khat in (0.5, 0.7] under an explicit
    evidence_method='is' never triggers refinement (threshold is 0.7),
    so the heavy-tail advisory must STILL fire even while refinement
    rounds remain unspent — warn=not may_refine used to silence it."""
    import warnings as _w

    prior = Prior([Normal(0, 5), Normal(0, 5)])

    def like(x):
        return -0.5 * jnp.sum(x**2, axis=-1) - jnp.log(2 * jnp.pi)

    s = pc.Sampler(prior, like, vectorize=True, random_state=0,
                   n_effective=256, n_active=128, flow="nsf3",
                   evidence_method="is", evidence_refine=2,
                   train_config={"epochs": 10, "patience": 3})

    calls = {"n": 0}
    orig = pc.Sampler._compute_evidence

    def fake(self, n=5000, warn=True):
        calls["n"] += 1
        orig(self, n, warn=warn)
        self.evidence_khat = 0.6   # moderate tail: below refine trigger

    monkeypatch.setattr(pc.Sampler, "_compute_evidence", fake)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        s.run(n_total=256, n_evidence=256, progress=False)
    assert calls["n"] == 1          # no refinement happened
    advisories = [w for w in rec if "heavy-tailed" in str(w.message)]
    assert len(advisories) == 1    # ...so the advisory must fire
