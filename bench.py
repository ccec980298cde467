"""Benchmark: t-pCN mutation throughput on the driver-defined north-star
config (10-D Rosenbrock, preconditioned with an NSF-6 flow, 4096 active
particles — BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: reference pocoMC's quickstart executes 51,456 likelihood calls
(one call = one particle-step) in 150 s wall on CPU (BASELINE.md) —
~343 particle-steps/sec through its t-pCN kernel including flow
transforms. vs_baseline = measured particle-steps/sec / 343.
"""

import json
import time

import numpy as np


def main():
    import os
    import jax
    # persistent compile cache: repeated bench invocations skip the cold
    # XLA compiles (verified working with the axon TPU backend)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp
    from pocomc_tpu.mcmc import make_sweep, make_loglike_device
    from pocomc_tpu.models.flow import Flow
    from pocomc_tpu.models.geometry import fit_geometry_jax
    from pocomc_tpu.scaler import Reparameterize
    from pocomc_tpu.prior import Prior, Normal

    n_dim = 10
    n_active = 4096
    n_steps_fixed = 16  # fixed-length sweep for a clean throughput number

    prior = Prior([Normal(0.0, 3.0) for _ in range(n_dim)])
    scaler = Reparameterize(n_dim, bounds=prior.bounds)
    flow = Flow(n_dim, "nsf6", seed=0)

    def log_like(x):  # 10-D Rosenbrock (BASELINE quickstart likelihood)
        return -jnp.sum(100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2
                        + (1.0 - x[..., :-1]) ** 2, axis=-1)

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

    def run(key):
        return sweep(u, x, logdetj, logl, logp, jnp.float32(0.7),
                     jnp.float32(0.75), geom, key, flow_params=flow.params)

    # warm up / compile
    res = run(jax.random.key(1))
    jax.block_until_ready(res["u"])
    assert int(res["steps"]) == n_steps_fixed

    # timed runs; median over reps (the TPU link has rare multi-second
    # stall episodes that would corrupt a mean)
    n_rep = 7
    dts = []
    for i in range(n_rep):
        t0 = time.perf_counter()
        res = run(jax.random.key(2 + i))
        jax.block_until_ready(res["u"])
        dts.append(time.perf_counter() - t0)
    dt = float(np.median(dts))

    particle_steps_per_sec = n_active * n_steps_fixed / dt
    baseline = 343.0  # reference CPU particle-steps/sec (BASELINE.md)
    print(json.dumps({
        "metric": "tpcn_particle_steps_per_sec_rosenbrock10_nsf6",
        "value": round(particle_steps_per_sec, 1),
        "unit": "particle-steps/sec",
        "vs_baseline": round(particle_steps_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
