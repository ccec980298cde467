"""Quickstart wall breakdown on the TPU (VERDICT r3 #6): phase timers
around warmup / device loop / evidence / rest, plus per-iteration wall
from Sampler._iter_walls.
"""
import time
import numpy as np
import jax.numpy as jnp
import pocomc_tpu as pc
from pocomc_tpu.sampler import Sampler
from pocomc_tpu.utils.tools import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")


def log_like(x):
    return -jnp.sum(10.0 * (x[..., ::2] ** 2 - x[..., 1::2]) ** 2
                    + (x[..., ::2] - 1.0) ** 2, axis=-1)


prior = pc.Prior([pc.Normal(0.0, 3.0) for _ in range(10)])

TIMES = {}
for name in ("_run_warmup", "_run_device_loop", "_compute_evidence"):
    orig = getattr(Sampler, name)

    def wrap(orig=orig, name=name):
        def inner(self, *a, **kw):
            t0 = time.perf_counter()
            out = orig(self, *a, **kw)
            TIMES.setdefault(name, []).append(time.perf_counter() - t0)
            return out
        return inner

    setattr(Sampler, name, wrap())


def one(seed):
    s = pc.Sampler(prior, log_like, vectorize=True, random_state=seed, train_config={"batch_size": 2048})
    t0 = time.perf_counter()
    s.run(progress=False)
    total = time.perf_counter() - t0
    return total, s


one(0)  # warm
TIMES.clear()
for seed in (1, 2, 3):
    total, s = one(seed)
    parts = {k: TIMES[k][-1] for k in TIMES}
    rest = total - sum(parts.values())
    iw = np.array([w for (w, st, ns) in s._iter_walls])
    print(f"seed {seed}: total {total:.2f}s  "
          + "  ".join(f"{k.strip('_')} {v:.2f}s" for k, v in parts.items())
          + f"  rest {rest:.2f}s  iters {len(iw)}  "
          f"iter wall median {np.median(iw)*1e3:.0f}ms "
          f"p90 {np.percentile(iw, 90)*1e3:.0f}ms  calls {s.calls}",
          flush=True)
