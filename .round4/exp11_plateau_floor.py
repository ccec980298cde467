"""Plateau-floor dose-response on the bench quickstart (CPU; the call
count and logZ are backend-independent given the seed, and the TPU is
busy with the bias_floor campaign).

VERDICT r3 #2's quickstart gate: calls <= 1.05 x 51,456 = 54,029. The
floor binds one step per sweep on easy targets (round-3 5->4 data),
so 4->3 should shave ~1 step/iteration ~ 9k calls at d=10; corr
criterion + khat refinement backstop accuracy.
"""
import sys
import time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import pocomc_tpu as pc


def log_like(x):
    return -jnp.sum(10.0 * (x[..., ::2] ** 2 - x[..., 1::2]) ** 2
                    + (x[..., ::2] - 1.0) ** 2, axis=-1)


prior = pc.Prior([pc.Normal(0.0, 3.0) for _ in range(10)])

for floor in (4.0, 3.0):
    calls, logzs, khats = [], [], []
    for seed in (1, 2, 3, 4, 5):
        s = pc.Sampler(prior, log_like, vectorize=True, random_state=seed,
                       plateau_floor=floor)
        s.run(progress=False)
        calls.append(s.calls)
        logzs.append(s.logz)
        khats.append(s.evidence_khat)
    print(f"floor {floor}: calls median {int(np.median(calls))} "
          f"(all {calls})  logZ median {np.median(logzs):.3f} "
          f"(exact -21.4021; all {[round(z, 3) for z in logzs]})  "
          f"khat median {np.median(khats):.2f}", flush=True)
