"""Per-program device timing on realistic quickstart state: run a
default sampler, then re-invoke phase A (reweight), B (train), C
(mutate) K times each, blocking once at the end (amortized RTT).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import pocomc_tpu as pc
from pocomc_tpu.parallel import fused
from pocomc_tpu.utils.tools import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")


def log_like(x):
    return -jnp.sum(10.0 * (x[..., ::2] ** 2 - x[..., 1::2]) ** 2
                    + (x[..., ::2] - 1.0) ** 2, axis=-1)


prior = pc.Prior([pc.Normal(0.0, 3.0) for _ in range(10)])
s = pc.Sampler(prior, log_like, vectorize=True, random_state=1)
s.run(progress=False)

hist = s._hist_dev
n_select = s._select_bucket(hist.u.shape[0])
progA, progB, progC = s._device_programs(n_select)
neff = jnp.float32(s.n_effective)
# huge ESS target so the device-side termination guard reads
# not-terminated and B/C run their real bodies
ntot = jnp.float32(1e9)
resid = jnp.float32(0.0)
sigma = jnp.float32(s.proposal_scale)

outA = progA(hist, neff, ntot, resid)
jax.block_until_ready(outA["stats"])
K = 20

t0 = time.perf_counter()
for _ in range(K):
    outA = progA(hist, neff, ntot, resid)
jax.device_get(outA["stats"])
tA = (time.perf_counter() - t0) / K

params, geom, _ = progB(s.flow.params, outA["u_sel"], outA["w_sel"],
                        np.uint32(7), outA["terminated"])
jax.device_get(geom["t_mean"])
t0 = time.perf_counter()
for i in range(K):
    params, geom, _ = progB(s.flow.params, outA["u_sel"], outA["w_sel"],
                            np.uint32(i), outA["terminated"])
jax.device_get(geom["t_mean"])
tB = (time.perf_counter() - t0) / K

h2, packed = progC(hist, outA["beta"], outA["logz"], outA["w_flat"],
                   outA["u_sel"], outA["w_sel"], sigma, geom, params,
                   np.uint32(3), s._scp(), outA["terminated"],
                   outA["stats"])
jax.device_get(packed)
t0 = time.perf_counter()
for i in range(K):
    h2, packed = progC(hist, outA["beta"], outA["logz"], outA["w_flat"],
                       outA["u_sel"], outA["w_sel"], sigma, geom, params,
                       np.uint32(i + 100), s._scp(), outA["terminated"],
                       outA["stats"])
jax.device_get(packed)
tC = (time.perf_counter() - t0) / K

# pure dispatch+RTT floor: fetch one tiny replicated array K times
t0 = time.perf_counter()
for _ in range(K):
    jax.device_get(outA["beta"])
tRTT = (time.perf_counter() - t0) / K

print(f"A(reweight) {tA*1e3:.1f}ms  B(train) {tB*1e3:.1f}ms  "
      f"C(mutate) {tC*1e3:.1f}ms  sum {1e3*(tA+tB+tC):.1f}ms  "
      f"device_get RTT {tRTT*1e3:.1f}ms  "
      f"(terminated={float(outA['terminated']):.0f} steps={float(packed[fused.STATS_A_LEN+1]):.0f})",
      flush=True)
