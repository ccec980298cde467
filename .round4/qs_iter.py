"""Per-iteration step forensics for the bench.py quickstart gate
(pure Sampler defaults). Forced CPU so it can run while the TPU is
busy; prints the per-iteration table + which stopping criterion bound.
"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import pocomc_tpu as pc

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def log_like(x):
    return -jnp.sum(10.0 * (x[..., ::2] ** 2 - x[..., 1::2]) ** 2
                    + (x[..., ::2] - 1.0) ** 2, axis=-1)


prior = pc.Prior([pc.Normal(0.0, 3.0) for _ in range(10)])
s = pc.Sampler(prior, log_like, vectorize=True, random_state=seed)
s.run(progress=False)
print(f"seed {seed}: calls {s.calls}  iters {s.t}  logZ {s.logz:.3f} "
      f"(exact -21.4021)  corr_threshold {s.corr_threshold} "
      f"bias_rate {s.bias_rate} floor {s.bias_floor}")
print("  t    beta  steps sigma   acc   corr    hot  resid")
tot = 0
for d_ in s._dev_iter_stats:
    tot += d_["steps"]
    print(f"  {d_['iter']:3d} {d_['beta']:.4f} {d_['steps']:4d} "
          f"{d_.get('sigma', 0.0):5.2f} {d_['accept']:5.2f} "
          f"{d_.get('corr', 0.0):6.3f} {d_.get('hot', 0.0):5.1f} "
          f"{d_.get('resid', 0.0):8.2f}")
print(f"total steps {tot}  x256 = {tot * 256} calls")
