"""Margin check for tests/test_imh.py::test_imh_refresh_mixing...:
calls[imh_every=2] / calls[imh_every=0] across seeds (post drift-guard)."""
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
for seed in (0, 1, 2, 3, 4):
    calls = {}
    lz = {}
    for ie in (0, 2):
        prior = pc.Prior([pc.Normal(0, 5) for _ in range(d)])
        s = pc.Sampler(prior, loglike, vectorize=True, random_state=seed,
                       n_effective=256, n_active=128, imh_every=ie,
                       corr_threshold=0.1, flow="nsf3",
                       train_config={"epochs": 40, "patience": 5})
        s.run(n_total=512, n_evidence=512, progress=False)
        calls[ie] = s.calls
        lz[ie] = s.logz
    print(f"seed={seed} calls0={calls[0]:6d} calls2={calls[2]:6d} "
          f"ratio={calls[2]/calls[0]:.3f} "
          f"logz0={lz[0]:+.3f} logz2={lz[2]:+.3f} (expect {expect:.3f})")
