"""Particle-axis scaling of the fused t-pCN sweep on one v5e chip
(SURVEY 5.7: the particle axis is the long axis here)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from pocomc_tpu.mcmc import make_sweep, make_loglike_device
from pocomc_tpu.models.flow import Flow
from pocomc_tpu.models.geometry import fit_geometry_jax
from pocomc_tpu.scaler import Reparameterize
from pocomc_tpu.prior import Prior, Normal

from pocomc_tpu.utils.tools import enable_compile_cache
enable_compile_cache()

n_dim = 10
n_steps_fixed = 16
prior = Prior([Normal(0.0, 3.0) for _ in range(n_dim)])
scaler = Reparameterize(n_dim, bounds=prior.bounds)
flow = Flow(n_dim, "nsf6", seed=0)

def log_like(x):
    return -jnp.sum(100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2
                    + (1.0 - x[..., :-1]) ** 2, axis=-1)

loglike_dev = make_loglike_device(log_like, True, True)
sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                   log_like=loglike_dev, n_dim=n_dim,
                   n_steps=10**6, n_max=n_steps_fixed,
                   kind="tpcn", preconditioned=True,
                   flow_fwd=flow.kernel_fwd, flow_inv=flow.kernel_inv)

for n_active in (1024, 4096, 16384, 65536, 262144):
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    u = jax.random.normal(k1, (n_active, n_dim), dtype=jnp.float32)
    x, logdetj = scaler.inverse(u)
    logl = log_like(x)
    logp = prior.logpdf(x)
    w = jnp.full((n_active,), 1.0 / n_active, dtype=jnp.float32)
    geom = fit_geometry_jax(u, weights=w, key=k2)

    # K data-dependent sweeps chained in ONE program amortize the tunnel
    # round trip over real device work (bench.py methodology)
    k_chain = 4

    def run_chain(key):
        def body(carry, k):
            u_c, x_c, ldj_c, logl_c, logp_c = carry
            r = sweep.raw(u_c, x_c, ldj_c, logl_c, logp_c,
                          jnp.float32(0.7), jnp.float32(0.75), geom, k,
                          flow_params=flow.params)
            return (r["u"], r["x"], r["logdetj"], r["logl"],
                    r["logp"]), None
        keys = jax.random.split(key, k_chain)
        carry, _ = jax.lax.scan(body, (u, x, logdetj, logl, logp), keys)
        return carry[0]

    run_chain = jax.jit(run_chain)
    np.asarray(jax.device_get(run_chain(jax.random.key(1))[0]))  # warmup
    dts = []
    for i in range(5):
        t0 = time.perf_counter()
        u_out = run_chain(jax.random.key(2 + i))
        np.asarray(jax.device_get(u_out[0]))  # true round trip
        dts.append(time.perf_counter() - t0)
    dt = float(np.median(dts)) / k_chain
    rate = n_active * n_steps_fixed / dt
    print(f"n_active {n_active:>7}: {dt*1e3:8.1f} ms/sweep  "
          f"{rate/1e6:8.2f}M particle-steps/s", flush=True)
