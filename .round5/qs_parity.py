"""Quickstart call parity (VERDICT r4 #7): plateau_floor A/B at 5 seeds.
Target: median calls <= 54,000 at unchanged logZ gate (|err| < 0.35
vs exact -21.4021)."""
import sys, time
import numpy as np
import jax.numpy as jnp
import pocomc_tpu as pc
from pocomc_tpu.utils.tools import enable_compile_cache
enable_compile_cache("/root/repo/.jax_cache")

def log_like(x):
    return -jnp.sum(10.0 * (x[..., ::2] ** 2 - x[..., 1::2]) ** 2
                    + (x[..., ::2] - 1.0) ** 2, axis=-1)

prior = pc.Prior([pc.Normal(0.0, 3.0) for _ in range(10)])

def one(seed, **kw):
    s = pc.Sampler(prior, log_like, vectorize=True, random_state=seed, **kw)
    s.run(progress=False)
    return s.logz, s.calls

for kw in ({"plateau_z": 1.5}, {"plateau_z": 2.0}, {"plateau_z": 2.5}):
    one(0, **kw)  # warm
    rows = [one(seed, **kw) for seed in (1, 2, 3, 4, 5)]
    logzs, calls = zip(*rows)
    print(f"{kw}: calls {[int(c) for c in calls]} "
          f"(median {int(np.median(calls))})  "
          f"logz med {np.median(logzs):.3f} "
          f"errs {[round(l + 21.4021, 3) for l in logzs]}", flush=True)
