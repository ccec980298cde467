"""Benchmarks on the driver-defined north-star config (BASELINE.md).

Prints TWO JSON lines:

1. North star — END-TO-END wall-clock of the reference quickstart
   (10-D Rosenbrock, N(0,3) prior, reference defaults, n_total=4096,
   flow-IS evidence with n_evidence=4096) on one TPU chip, warm (one
   un-timed run warms the jit caches; a second full Sampler run is
   timed). Baseline: the reference executes the identical inference in
   150 s on CPU (BASELINE.md quickstart row; logZ -21.430 +- 0.027).
   The median logZ is gated against the EXACT quadrature value -21.4021
   to +-0.35 (matching the assertion below) so a statistically broken
   run can't score while ordinary seed-to-seed flow-IS spread passes.

2. Kernel throughput — t-pCN mutation particle-steps/sec with an NSF-6
   preconditioner at 4096 active particles (fixed 16-step sweep).
   Baseline: 51,456 likelihood calls / 150 s = ~343 particle-steps/sec
   through the reference's kernel including flow transforms.
"""

import json
import time

import numpy as np


def _enable_cache(jax):
    import os
    from pocomc_tpu.utils.tools import enable_compile_cache
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    enable_compile_cache(cache_dir)


def _tpu_peak_flops():
    """Best-effort bf16 peak for the attached chip (None if unknown)."""
    import jax
    kind = jax.devices()[0].device_kind.lower()
    peaks = {"v5 lite": 197.2e12, "v5e": 197.2e12, "v4": 275e12,
             "v5p": 459e12, "v6 lite": 918e12, "v6": 918e12}
    return next((v for k, v in peaks.items() if k in kind), None)


def _rosenbrock_loglike():
    import jax.numpy as jnp

    def log_like(x):
        return -jnp.sum(100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2
                        + (1.0 - x[..., :-1]) ** 2, axis=-1)
    return log_like


def _sweep_step_flops(n_active, n_dim=10, flow_name="nsf6"):
    """XLA-counted flops of ONE t-pCN sweep step (propose + likelihood +
    accept) at the given population size, per particle-step.

    cost_analysis() of a whole sweep counts the lax.while_loop body once
    regardless of trip count, so the honest unit is a standalone
    single-step program; callers multiply by steps actually executed.
    Best-effort: returns None where the backend lacks cost analysis.
    """
    try:
        import jax
        import jax.numpy as jnp
        from pocomc_tpu.mcmc import make_sweep, make_loglike_device
        from pocomc_tpu.models.flow import Flow
        from pocomc_tpu.models.geometry import fit_geometry_jax
        from pocomc_tpu.scaler import Reparameterize
        from pocomc_tpu.prior import Prior, Normal

        prior = Prior([Normal(0.0, 3.0) for _ in range(n_dim)])
        scaler = Reparameterize(n_dim, bounds=prior.bounds)
        flow = Flow(n_dim, flow_name, seed=0)

        log_like = _rosenbrock_loglike()

        loglike_dev = make_loglike_device(log_like, True, True)
        sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                           log_like=loglike_dev, n_dim=n_dim,
                           n_steps=10**6, n_max=16, kind="tpcn",
                           preconditioned=True,
                           flow_fwd=flow.kernel_fwd,
                           flow_inv=flow.kernel_inv)
        key = jax.random.key(0)
        k1, k2 = jax.random.split(key)
        u = jax.random.normal(k1, (n_active, n_dim), dtype=jnp.float32)
        x, logdetj = scaler.inverse(u)
        logl, logp = log_like(x), prior.logpdf(x)
        w = jnp.full((n_active,), 1.0 / n_active, dtype=jnp.float32)
        geom = fit_geometry_jax(u, weights=w, key=k2)
        beta_c, sigma_c = jnp.float32(0.7), jnp.float32(0.75)

        def one_step(st):
            prop = sweep.propose(st, beta_c, geom, flow.params, None)
            logl_p = loglike_dev(prop["x_safe"], prop["finite"])
            new_st, _, _ = sweep.accept_update(st, prop, logl_p, beta_c,
                                               geom)
            return new_st

        st0 = sweep.init_state(u, x, logdetj, logl, logp, beta_c, sigma_c,
                               geom, jax.random.key(3),
                               flow_params=flow.params)
        cost = jax.jit(one_step).lower(st0).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        return flops / n_active if flops > 0 else None
    except Exception:
        return None  # cost analysis is best-effort on exotic plugins


def bench_quickstart():
    """North star: warm end-to-end wall on the reference quickstart."""
    import jax
    import jax.numpy as jnp
    import pocomc_tpu as pc

    # EXACT reference quickstart likelihood/prior
    # (/root/reference/docs/source/quickstart.ipynb)
    def log_like(x):
        return -jnp.sum(10.0 * (x[..., ::2] ** 2 - x[..., 1::2]) ** 2
                        + (x[..., ::2] - 1.0) ** 2, axis=-1)

    prior = pc.Prior([pc.Normal(0.0, 3.0) for _ in range(10)])

    def one_run(seed):
        s = pc.Sampler(prior, log_like, vectorize=True, random_state=seed)
        t0 = time.perf_counter()
        s.run(progress=False)
        return time.perf_counter() - t0, s.logz, s.logz_err, s.calls

    one_run(0)  # warm the jit/program caches (un-timed)
    walls, logzs, calls = [], [], []
    for seed in (1, 2, 3):
        wall, logz, logz_err, n_calls = one_run(seed)
        walls.append(wall)
        logzs.append(logz)
        calls.append(n_calls)
    wall = float(np.median(walls))
    logz = float(np.median(logzs))
    # true logZ by 1-D quadrature of the pairwise-factorized integrand:
    # -21.4021 (the reference's single-seed flow-IS estimate: -21.430
    # +- 0.027). Gate at +-0.35 so a statistically broken run can't
    # score while seed-to-seed flow-IS spread (~0.1) passes.
    true_logz, ref_wall = -21.4021, 150.0
    assert abs(logz - true_logz) < 0.35, (
        f"quickstart logZ {logz:.3f} vs exact {true_logz}")
    out = {
        "metric": "quickstart_wall_seconds_rosenbrock10_warm",
        "value": round(wall, 2),
        "unit": "seconds (median of 3 full runs; reference CPU: 150 s)",
        "vs_baseline": round(ref_wall / wall, 2),
        "logz": round(logz, 3),
        "likelihood_calls_median": int(np.median(calls)),
        "reference_likelihood_calls": 51456,
    }
    # FLOP-utilization proxy (VERDICT r3 #7): sweep-step flops at the
    # run's population size x likelihood calls (= particle-steps), over
    # the measured wall. LOWER bound on device efficiency: excludes the
    # flow-training / reweight / evidence programs and includes the
    # tunnel round-trip share of the wall; quoted against the bf16 peak
    # while flow matmuls run at f32 precision (~3 MXU passes/flop).
    fpp = _sweep_step_flops(256)
    peak = _tpu_peak_flops()
    if fpp and peak:
        out["mfu_sweep_flops_vs_bf16_peak"] = float(
            f"{fpp * float(np.median(calls)) / wall / peak:.3g}")
    print(json.dumps(out))


def _bench_sweep(n_dim, flow_name, n_active, n_steps_fixed, k_chain,
                 n_rep, metric, baseline=None):
    """Fixed-length t-pCN sweep throughput at the given shape (K-chained
    device_get timing; CLAUDE.md methodology). Returns the result dict."""
    import jax
    import jax.numpy as jnp
    from pocomc_tpu.mcmc import make_sweep, make_loglike_device
    from pocomc_tpu.models.flow import Flow
    from pocomc_tpu.models.geometry import fit_geometry_jax
    from pocomc_tpu.scaler import Reparameterize
    from pocomc_tpu.prior import Prior, Normal

    prior = Prior([Normal(0.0, 3.0) for _ in range(n_dim)])
    scaler = Reparameterize(n_dim, bounds=prior.bounds)
    flow = Flow(n_dim, flow_name, seed=0)

    log_like = _rosenbrock_loglike()

    loglike_dev = make_loglike_device(log_like, True, True)
    # plateau disabled (huge n_steps) so the sweep runs exactly n_max steps
    sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                       log_like=loglike_dev, n_dim=n_dim,
                       n_steps=10**6, n_max=n_steps_fixed,
                       kind="tpcn", preconditioned=True,
                       flow_fwd=flow.kernel_fwd, flow_inv=flow.kernel_inv)

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    u = jax.random.normal(k1, (n_active, n_dim), dtype=jnp.float32)
    x, logdetj = scaler.inverse(u)
    logl = log_like(x)
    logp = prior.logpdf(x)
    w = jnp.full((n_active,), 1.0 / n_active, dtype=jnp.float32)
    geom = fit_geometry_jax(u, weights=w, key=k2)

    # K data-dependent sweeps chained inside ONE jitted program: a single
    # short sweep per timed call would be contaminated by the tunnel's
    # 10-75 ms round-trip latency (CLAUDE.md timing methodology); the
    # chain amortizes one RTT over K sweeps of real device work.
    def run_chain(key):
        def body(carry, k):
            u_c, x_c, ldj_c, logl_c, logp_c = carry
            r = sweep.raw(u_c, x_c, ldj_c, logl_c, logp_c,
                          jnp.float32(0.7), jnp.float32(0.75), geom, k,
                          flow_params=flow.params)
            return (r["u"], r["x"], r["logdetj"], r["logl"],
                    r["logp"]), r["steps"]
        keys = jax.random.split(key, k_chain)
        carry, steps = jax.lax.scan(body, (u, x, logdetj, logl, logp), keys)
        return carry[0], steps

    run_chain = jax.jit(run_chain)
    u_out, steps = run_chain(jax.random.key(1))
    jax.block_until_ready(u_out)
    assert int(jax.device_get(steps)[0]) == n_steps_fixed

    # median over reps (the TPU link has rare multi-second stall episodes
    # that would corrupt a mean); each rep ends with a device_get ROUND
    # TRIP — block_until_ready can ack at enqueue on this backend.
    dts = []
    for i in range(n_rep):
        t0 = time.perf_counter()
        u_out, _ = run_chain(jax.random.key(2 + i))
        np.asarray(jax.device_get(u_out[0]))
        dts.append(time.perf_counter() - t0)
    dt = float(np.median(dts))

    particle_steps_per_sec = k_chain * n_active * n_steps_fixed / dt

    # FLOP utilization (VERDICT r3 #7): per-particle-step flops from the
    # standalone single-step cost analysis (_sweep_step_flops) x steps
    # actually executed, over the measured wall. Lower bound on device
    # efficiency: the wall includes one tunnel round trip per rep, and
    # the bf16 peak is quoted while flow matmuls run at f32 precision
    # (~3 MXU passes per logical flop).
    fpp = _sweep_step_flops(n_active, n_dim=n_dim, flow_name=flow_name)
    peak = _tpu_peak_flops()

    out = {
        "metric": metric,
        "value": round(particle_steps_per_sec, 1),
        "unit": "particle-steps/sec",
    }
    if baseline:
        out["vs_baseline"] = round(particle_steps_per_sec / baseline, 2)
    if fpp:
        out["flops_per_particle_step"] = round(fpp, 1)
        if peak:
            out["mfu_vs_bf16_peak"] = float(
                f"{fpp * particle_steps_per_sec / peak:.3g}")
    print(json.dumps(out))
    return out


def bench_kernel():
    """Dispatch-bound kernel: the quickstart's own shape (d=10, nsf6,
    4096 particles) — throughput here measures the tunnel + XLA dispatch
    path, MFU ~2e-4 (VERDICT r4: the quickstart workload is
    latency-bound, not MXU-bound)."""
    return _bench_sweep(n_dim=10, flow_name="nsf6", n_active=4096,
                        n_steps_fixed=16, k_chain=4, n_rep=7,
                        metric="tpcn_particle_steps_per_sec_rosenbrock10_nsf6",
                        baseline=343.0)  # reference CPU p-steps/s


def bench_kernel_compute():
    """Compute-bound kernel (VERDICT r4 #5): d=50 / nsfc12 coupling flow
    / 65536 particles. The MADE-autoregressive inverse is 600 SEQUENTIAL
    small matmuls per sweep step (measured MFU 2.2e-4 at d50/nsf12/16k —
    latency-bound by construction); the coupling variant inverts in ONE
    pass per transform, so 12 large batched matmul stacks per step is
    what actually feeds the MXU and MFU here measures systolic-array
    utilization rather than dependency-chain latency."""
    return _bench_sweep(n_dim=50, flow_name="nsfc12", n_active=65536,
                        n_steps_fixed=4, k_chain=2, n_rep=5,
                        metric="tpcn_particle_steps_per_sec_d50_nsfc12_n64k")


def main():
    import jax
    _enable_cache(jax)
    bench_quickstart()
    bench_kernel_compute()
    bench_kernel()


if __name__ == "__main__":
    main()
