"""Diagnose the device-loop wall: is per-iteration flow training the
dominant term? A/B: train_frequency 1 vs 2 vs 4 (diagnostic only), and
patience 10 vs 5.
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


def one(seed, **kw):
    s = pc.Sampler(prior, log_like, vectorize=True, random_state=seed, **kw)
    t0 = time.perf_counter()
    s.run(progress=False)
    return time.perf_counter() - t0, s.logz, s.calls


for kw in ({}, {"train_frequency": 2}, {"train_frequency": 4},
           {"train_config": {"patience": 5}},
           {"train_config": {"epochs": 30}}):
    one(0, **kw)  # warm trace for this config
    walls, logzs, calls = [], [], []
    for seed in (1, 2, 3):
        w, lz, c = one(seed, **kw)
        walls.append(w), logzs.append(lz), calls.append(c)
    print(f"{kw or 'defaults'}: wall median {np.median(walls):.2f}s "
          f"(all {[round(w, 2) for w in walls]})  "
          f"calls {int(np.median(calls))}  logZ {np.median(logzs):.3f}",
          flush=True)
