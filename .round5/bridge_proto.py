"""Standalone bridge-evidence prototype check on CPU.

1. Gaussian d=4 (flow near-perfect -> 1-2 rungs, must match exact logZ)
2. Funnel d=6 (curved; compare bridge vs raw ladder vs flow-IS vs exact)
"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import jax.numpy as jnp
import pocomc_tpu as pc
from pocomc_tpu.bridge import make_bridge_programs, run_bridge
from pocomc_tpu.mcmc import make_loglike_device
from scipy.stats import norm

import itertools
_seed_counter = itertools.count(1000)
def seed_fn():
    return np.uint32(next(_seed_counter))


def bridge_from_sampler(s, n=1024, n_steps=10, ess_target=0.5):
    loglike_dev = make_loglike_device(s._like_batch_fn, True, True)
    init, rung = make_bridge_programs(
        s.scaler, s._logprior_dev, loglike_dev, s.n_dim,
        s.flow.kernel_inv, n_steps=n_steps)
    return run_bridge(init, rung, s.flow.params, s._scp(), n,
                      seed_fn, fetch=s._fetch, ess_target=ess_target)


def report(tag, s, expect, **kw):
    raw = float(s.particles.compute_logw_and_logz(1.0)[1])
    rec = float(s.particles.compute_logw_and_logz(1.0, recorrect=True)[1])
    res = bridge_from_sampler(s, **kw)
    print(f"{tag}: exact {expect:+.4f}  flowIS {s.logz - expect:+.4f}  "
          f"raw {raw - expect:+.4f}  recorr {rec - expect:+.4f}  "
          f"bridge {res['logz'] - expect:+.4f}  "
          f"(rungs={res['rungs']} calls={res['calls']} "
          f"ess_min={res['ess_min']:.2f} acc={res['accept_last']:.2f} "
          f"s_path={np.round(res['s_path'], 3)})")
    return res


# --- 1. Gaussian d=4 ---------------------------------------------------
d = 4
def loglike(x):
    return -0.5 * jnp.sum(x**2, axis=-1) - d / 2 * jnp.log(2 * jnp.pi)
expect = d * norm.logpdf(0, 0, np.sqrt(26.0))
prior = pc.Prior([pc.Normal(0, 5) for _ in range(d)])
s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
               n_effective=256, n_active=128, flow="nsf3",
               train_config={"epochs": 40, "patience": 5})
s.run(n_total=512, n_evidence=512, progress=False)
report("gauss4 ", s, expect)

# --- 2. Funnel d=6 -----------------------------------------------------
d, sv, half = 6, 3.0, 40.0
def loglike_f(x):
    v = x[..., 0]
    y = x[..., 1:]
    return (-0.5 * jnp.sum(y**2, axis=-1) / jnp.exp(v)
            - ((d - 1) / 2) * (v + jnp.log(2 * jnp.pi)))
import sys
sys.path.insert(0, '/root/repo/benchmarks')
from ladder_oracles import funnel25_logz
expect_f = funnel25_logz([1.0], d=d, sv=sv, half=half)[0]
prior_f = pc.Prior([pc.Normal(0, sv)]
                   + [pc.Uniform(-half, half) for _ in range(d - 1)])
s2 = pc.Sampler(prior_f, loglike_f, vectorize=True, random_state=0,
                n_effective=512, n_active=256, flow="nsf3",
                train_config={"epochs": 40, "patience": 5})
s2.run(n_total=1024, n_evidence=1024, progress=False)
report("funnel6", s2, expect_f)
report("funnel6 (n=2048,K=16)", s2, expect_f, n=2048, n_steps=16)
