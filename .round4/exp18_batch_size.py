"""Train-batch dose-response on the bench quickstart: the flow fit is
46.8ms of the 52.4ms per-iteration device compute (exp17), and it is
latency-bound (8 sequential 256-row steps/epoch on a tiny NSF6).
Fewer, larger steps should cut wall at equal FLOPs; optimization
dynamics (fewer updates/epoch) are the risk - watch calls/logZ/khat.
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
    return time.perf_counter() - t0, s.logz, s.calls, s.evidence_khat


for bs in (512, 1024, 2048):
    kw = {"train_config": {"batch_size": bs}}
    one(0, **kw)
    walls, logzs, calls, khats = [], [], [], []
    for seed in (1, 2, 3):
        w, lz, c, kh = one(seed, **kw)
        walls.append(w), logzs.append(lz), calls.append(c)
        khats.append(kh)
    print(f"bs {bs}: wall median {np.median(walls):.2f}s "
          f"(all {[round(w, 2) for w in walls]})  "
          f"calls {int(np.median(calls))}  logZ {np.median(logzs):.3f} "
          f"(all {[round(z, 3) for z in logzs]})  "
          f"khat {np.median(khats):.2f}", flush=True)
