"""Autoregressive (nsf) vs coupling (nsfc) preconditioner A/B at small
and large particle populations (round-3 item 7; SURVEY 7.3).

Why this comparison: the autoregressive NSF inverse is inherently
sequential in d (one MADE pass per dimension per sweep step), which the
round-2 scaling study showed serializes the sweep below ~16k particles —
while the coupling flow inverts in ONE pass of the same stack. The A/B
measures both the raw sweep throughput (fixed 16-step sweeps, chained
timing per bench.py methodology) and end-to-end quickstart-config
accuracy (logZ vs exact), at 4k and 64k particles.

Run: python benchmarks/coupling_ab.py [sweep|e2e]
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from pocomc_tpu.mcmc import make_sweep, make_loglike_device
from pocomc_tpu.models.flow import Flow
from pocomc_tpu.models.geometry import fit_geometry_jax
from pocomc_tpu.scaler import Reparameterize
from pocomc_tpu.prior import Prior, Normal, Uniform
from pocomc_tpu.utils.tools import enable_compile_cache

enable_compile_cache()

N_DIM = 10
N_STEPS = 16
K_CHAIN = 4


def log_like(x):
    return -jnp.sum(100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2
                    + (1.0 - x[..., :-1]) ** 2, axis=-1)


def sweep_throughput():
    prior = Prior([Normal(0.0, 3.0) for _ in range(N_DIM)])
    scaler = Reparameterize(N_DIM, bounds=prior.bounds)
    loglike_dev = make_loglike_device(log_like, True, True)
    for arch in ("nsf6", "nsfc6"):
        flow = Flow(N_DIM, arch, seed=0)
        sweep = make_sweep(scaler=scaler, log_prior=prior.logpdf,
                           log_like=loglike_dev, n_dim=N_DIM,
                           n_steps=10**6, n_max=N_STEPS, kind="tpcn",
                           preconditioned=True,
                           flow_fwd=flow.kernel_fwd,
                           flow_inv=flow.kernel_inv)
        for n_active in (4096, 65536):
            k1, k2 = jax.random.split(jax.random.key(0))
            u = jax.random.normal(k1, (n_active, N_DIM), dtype=jnp.float32)
            x, logdetj = scaler.inverse(u)
            logl, logp = log_like(x), prior.logpdf(x)
            w = jnp.full((n_active,), 1.0 / n_active, dtype=jnp.float32)
            geom = fit_geometry_jax(u, weights=w, key=k2)

            def run_chain(key):
                def body(carry, k):
                    r = sweep.raw(*carry, jnp.float32(0.7),
                                  jnp.float32(0.75), geom, k,
                                  flow_params=flow.params)
                    return (r["u"], r["x"], r["logdetj"], r["logl"],
                            r["logp"]), None
                keys = jax.random.split(key, K_CHAIN)
                carry, _ = jax.lax.scan(
                    body, (u, x, logdetj, logl, logp), keys)
                return carry[0]

            run_chain = jax.jit(run_chain)
            np.asarray(jax.device_get(run_chain(jax.random.key(1))[0]))
            dts = []
            for i in range(5):
                t0 = time.perf_counter()
                out = run_chain(jax.random.key(2 + i))
                np.asarray(jax.device_get(out[0]))
                dts.append(time.perf_counter() - t0)
            dt = float(np.median(dts))
            rate = K_CHAIN * n_active * N_STEPS / dt
            print(f"{arch} n={n_active}: {dt*1e3/K_CHAIN:.1f} ms/sweep  "
                  f"{rate/1e6:.2f}M particle-steps/s", flush=True)


def e2e():
    import pocomc_tpu as pc
    prior = pc.Prior([pc.Uniform(-10, 10) for _ in range(N_DIM)])
    # truth -50.033: transfer-matrix quadrature (baseline_configs.py)
    for arch in ("nsf6", "nsfc6"):
        for n_active in (1024, 4096):
            t0 = time.time()
            s = pc.Sampler(prior, log_like, vectorize=True, random_state=0,
                           flow=arch, n_effective=2 * n_active,
                           n_active=n_active)
            s.run(n_total=4096, n_evidence=4096, progress=False)
            print(f"{arch} {n_active} active: wall {time.time()-t0:.0f}s  "
                  f"calls {s.calls}  logZ {s.logz:.3f} +- {s.logz_err:.3f} "
                  f"(err {s.logz + 50.033:+.3f})  khat "
                  f"{s.evidence_khat:.2f}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    (sweep_throughput if which == "sweep" else e2e)()
