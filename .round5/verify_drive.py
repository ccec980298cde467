import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import pocomc_tpu as pc

prior = pc.Prior([pc.Uniform(-10, 10) for _ in range(4)])
def log_like(x):
    return -jnp.sum(100*(x[...,1:]-x[...,:-1]**2)**2 + (1-x[...,:-1])**2,
                    axis=-1)

s = pc.Sampler(prior, log_like, vectorize=True, random_state=0,
               n_effective=256, n_active=128, flow='nsf3',
               train_config={'epochs': 50, 'patience': 5})
s.run(n_total=1024, n_evidence=1024, progress=False)
lz, lze = s.evidence()
print("logZ", lz, "+-", lze, "(exact -17.862)")
x, w, ll, lp = s.posterior()
import numpy as np
mean = (np.asarray(w)[:, None] * np.asarray(x)).sum(0) / np.asarray(w).sum()
print("posterior mean", np.round(mean, 3))
assert abs(lz - (-17.862)) < 0.35, lz
print("VERIFY OK")
