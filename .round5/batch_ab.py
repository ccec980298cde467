"""ADVICE r4: train batch_size ceiling 1024 (ours) vs the reference's
min(n_eff//2, 512) — A/B on gauss50 (large populations, where the
advisor's concern applies: bigger batch = fewer optimizer steps/epoch).
Watch flow quality via logz err + khat + calls."""
import time
import numpy as np
import jax, jax.numpy as jnp
from scipy.stats import multivariate_normal
import pocomc_tpu as pc
from pocomc_tpu.utils.tools import enable_compile_cache
enable_compile_cache("/root/repo/.jax_cache")

d = 50
rng = np.random.default_rng(0)
evals = np.logspace(0, 3, d)
Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
cov = (Q * evals) @ Q.T
cov_inv_j = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)
norm_const = -0.5 * (d * np.log(2 * np.pi) + np.linalg.slogdet(cov)[1])
def loglike(x):
    return norm_const - 0.5 * jnp.einsum("ni,ij,nj->n", x, cov_inv_j, x)
ps = 100.0
prior = pc.Prior([pc.Normal(0, ps) for _ in range(d)])
expect = multivariate_normal.logpdf(np.zeros(d), np.zeros(d),
                                    cov + ps**2 * np.eye(d))

for bs in (512, 1024):
    rows = []
    for seed in (0, 1, 2):
        s = pc.Sampler(prior, loglike, vectorize=True, random_state=seed,
                       n_effective=4096, n_active=2048,
                       train_config={"batch_size": bs})
        t0 = time.perf_counter()
        s.run(n_total=4096, n_evidence=4096, progress=False)
        rows.append((time.perf_counter() - t0, s.logz - expect, s.calls,
                     s.evidence_khat))
    walls, errs, calls, khats = zip(*rows)
    print(f"bs {bs}: wall med {np.median(walls):.1f}s  "
          f"logz errs {[round(e, 3) for e in errs]}  "
          f"calls {[int(c) for c in calls]}  "
          f"khat {[round(k, 2) for k in khats]}", flush=True)
