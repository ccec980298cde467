"""Instrumented repro of tests/test_imh.py::test_imh_refresh_mixing...
Per-iteration stats for imh_every=0 vs 2 on the 4-D Gaussian."""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import jax.numpy as jnp
import pocomc_tpu as pc
from scipy.stats import norm

d = 4

def loglike(x):
    return -0.5 * jnp.sum(x**2, axis=-1) - d / 2 * jnp.log(2 * jnp.pi)

expect = d * norm.logpdf(0, 0, np.sqrt(26.0))
prior = pc.Prior([pc.Normal(0, 5) for _ in range(d)])

for ie in (0, 2):
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=256, n_active=128, imh_every=ie,
                   corr_threshold=0.1, flow="nsf3",
                   train_config={"epochs": 40, "patience": 5})
    s.run(n_total=512, n_evidence=512, progress=False)
    print(f"\n=== imh_every={ie}: calls={s.calls} logz={s.logz:.4f} "
          f"(expect {expect:.4f}) iters={len(s._dev_iter_stats)}")
    prev_calls = 0
    for st in s._dev_iter_stats:
        dc = st['calls'] - prev_calls
        prev_calls = st['calls']
        print(f"  t={st['iter']:3d} beta={st['beta']:.4f} steps={st['steps']:3d} "
              f"dcalls={dc:6d} acc={st['accept']:.3f} sig={st['sigma']:.3f} "
              f"corr={st['corr']:.4f} hot={st['hot']:.0f} "
              f"zl={st['z_logl']:.1f} zd={st['z_dim']:.1f} "
              f"resid={st['resid']:.3f} mis={st['misfit']:.3f}")
