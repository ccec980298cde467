"""Pipeline-depth dose-response on the bench quickstart (VERDICT r3 #6).

With sigma / dynamic-n_effective now chained device-to-device, the
blocking stats sync is pure reporting: deeper pipelines cut syncs per
iteration without staling the adaptation inputs (the round-2 reason
depth > 1 measured slower). Measure wall/calls/logZ at depths 1/2/4/8.
"""
import time
import numpy as np
import jax.numpy as jnp
import pocomc_tpu as pc
from pocomc_tpu.utils.tools import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")


def log_like(x):
    return -jnp.sum(10.0 * (x[..., ::2] ** 2 - x[..., 1::2]) ** 2
                    + (x[..., ::2] - 1.0) ** 2, axis=-1)


prior = pc.Prior([pc.Normal(0.0, 3.0) for _ in range(10)])


def one(seed, depth):
    s = pc.Sampler(prior, log_like, vectorize=True, random_state=seed,
                   pipeline=depth)
    t0 = time.perf_counter()
    s.run(progress=False)
    return time.perf_counter() - t0, s.logz, s.calls, int(s.t)


one(0, 1)  # warm compile caches
for depth in (1, 2, 4, 8):
    walls, logzs, calls = [], [], []
    for seed in (1, 2, 3):
        w, lz, c, t = one(seed, depth)
        walls.append(w), logzs.append(lz), calls.append(c)
    print(f"depth {depth}: wall median {np.median(walls):.2f}s "
          f"(all {[round(w, 2) for w in walls]})  "
          f"calls median {int(np.median(calls))}  "
          f"logZ median {np.median(logzs):.3f}", flush=True)
