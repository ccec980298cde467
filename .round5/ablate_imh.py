"""Which stopping rule stretches imh_every=2 sweeps on the 4-D Gaussian?
Ablate calib_z / bias_rate / bias_budget one at a time."""
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

configs = [
    ("default", {}),
    ("calib_z=0", {"calib_z": 0.0}),
    ("bias_rate=0", {"bias_rate": 0.0}),
    ("bias_budget=0", {"bias_budget": 0.0}),
    ("bias_rate=0,budget=0", {"bias_rate": 0.0, "bias_budget": 0.0}),
]
for name, kw in configs:
    prior = pc.Prior([pc.Normal(0, 5) for _ in range(d)])
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=256, n_active=128, imh_every=2,
                   corr_threshold=0.1, flow="nsf3",
                   train_config={"epochs": 40, "patience": 5}, **kw)
    s.run(n_total=512, n_evidence=512, progress=False)
    steps = [st['steps'] for st in s._dev_iter_stats]
    print(f"{name:24s} calls={s.calls:6d} logz={s.logz:+.4f} "
          f"(expect {expect:.4f}) steps={steps}")
