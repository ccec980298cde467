"""Bridge knob grid on funnel6 (CPU): ess_target x n_steps x seeds.
Also prints flow-IS / raw ladder per seed for reference."""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import jax.numpy as jnp
import pocomc_tpu as pc
from pocomc_tpu.bridge import make_bridge_programs, run_bridge
from pocomc_tpu.mcmc import make_loglike_device

import itertools
_c = itertools.count(5000)
seed_fn = lambda: np.uint32(next(_c))

import sys
sys.path.insert(0, '/root/repo/benchmarks')
from ladder_oracles import funnel25_logz

d, sv, half = 6, 3.0, 40.0
def loglike_f(x):
    v = x[..., 0]
    y = x[..., 1:]
    return (-0.5 * jnp.sum(y**2, axis=-1) / jnp.exp(v)
            - ((d - 1) / 2) * (v + jnp.log(2 * jnp.pi)))
expect = funnel25_logz([1.0], d=d, sv=sv, half=half)[0]

for seed in (0, 1, 2):
    prior_f = pc.Prior([pc.Normal(0, sv)]
                       + [pc.Uniform(-half, half) for _ in range(d - 1)])
    s = pc.Sampler(prior_f, loglike_f, vectorize=True, random_state=seed,
                   n_effective=512, n_active=256, flow="nsf3",
                   evidence_bridge=False,
                   train_config={"epochs": 40, "patience": 5})
    s.run(n_total=1024, n_evidence=1024, progress=False)
    raw = float(s.particles.compute_logw_and_logz(1.0)[1])
    print(f"seed={seed} flowIS {s.logz-expect:+.3f} raw {raw-expect:+.3f}")
    loglike_dev = make_loglike_device(s._like_batch_fn, True, True)
    for ess_t in (0.5, 0.8):
        for K in (10, 20):
            init, rung = make_bridge_programs(
                s.scaler, s._logprior_dev, loglike_dev, s.n_dim,
                s.flow.kernel_inv, n_steps=K)
            errs = []
            res = None
            for rep in range(3):
                res = run_bridge(init, rung, s.flow.params, s._scp(),
                                 1024, seed_fn, fetch=s._fetch,
                                 ess_target=ess_t)
                errs.append(res['logz'] - expect)
            print(f"  ess={ess_t} K={K:2d}: errs "
                  f"{np.round(errs, 3)} (rungs={res['rungs']} "
                  f"calls={res['calls']})")
