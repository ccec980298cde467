"""50-D cond-1e3 Gaussian (north-star config #2): kernel comparison."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from scipy.stats import multivariate_normal
import pocomc_tpu as pc

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

for kern in sys.argv[1:] or ("mala", "hmc"):
    t0 = time.time()
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=4096, n_active=2048, sample=kern)
    s.run(n_total=4096, n_evidence=4096, progress=False)
    print(f"gauss50 {kern}: wall {time.time()-t0:.0f}s iters {s.t} "
          f"calls {s.calls} logZ {s.logz:.3f} +- {s.logz_err:.3f} "
          f"khat {s.evidence_khat:.2f} err {s.logz-expect:+.3f}", flush=True)
