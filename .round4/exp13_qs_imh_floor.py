"""Quickstart bench-gate candidates: imh_every=2 with plateau_floor 4
vs 3, seeds 1-5 (CPU; calls/accuracy are backend-independent).

Gate (VERDICT r3 #2): calls median <= 1.05 x 51,456 = 54,029 at
unchanged logZ; plus the #1 quickstart ladder gate smcZ <= 0.25.
"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import pocomc_tpu as pc


def log_like(x):
    return -jnp.sum(10.0 * (x[..., ::2] ** 2 - x[..., 1::2]) ** 2
                    + (x[..., ::2] - 1.0) ** 2, axis=-1)


prior = pc.Prior([pc.Normal(0.0, 3.0) for _ in range(10)])

for imh, floor in ((2, 4.0), (2, 3.0)):
    calls, logzs, smczs = [], [], []
    for seed in (1, 2, 3, 4, 5):
        s = pc.Sampler(prior, log_like, vectorize=True, random_state=seed,
                       imh_every=imh, plateau_floor=floor)
        s.run(progress=False)
        calls.append(s.calls)
        logzs.append(s.logz)
        smczs.append(float(s.particles.compute_logw_and_logz(
            1.0, recorrect=True)[1]) + 21.4021)
    print(f"imh {imh} floor {floor}: calls median {int(np.median(calls))} "
          f"(all {calls})  logZ median {np.median(logzs):.3f} "
          f"(all {[round(z, 3) for z in logzs]})  "
          f"smcZ err median {np.median(smczs):+.3f} "
          f"(all {[round(z, 3) for z in smczs]})", flush=True)
