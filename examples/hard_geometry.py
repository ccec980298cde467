"""Hard geometries: Neal's funnel with the adaptive mutation budget.

Curved targets (funnels, strong nonlinear correlations) are where
temperature-ladder samplers under-mix: the walker-mean plateau rule
stops each MCMC sweep long before the resampled duplicates have
decorrelated, and the evidence biases low. pocomc_tpu's decorrelation
criterion (`corr_threshold`, on by default) measures that directly —
a sweep may only stop once the population's correlation with its start
positions has decayed — so funnels automatically buy more mutation
steps per temperature while easy targets keep the efficient call count.

Watch `sampler.evidence_khat` after the run: it is the honest tail
diagnostic of the flow-IS evidence. Above 0.5 the (default)
evidence_method='auto' already applied Pareto smoothing; above 0.7 the
RuntimeWarning's advice (larger n_steps / n_max_steps, bigger flow,
more particles) is the remediation ladder.
"""

import sys as _sys
import pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp
import pocomc_tpu as pc

d = 10          # 1 log-scale dimension + (d-1) funnel dimensions
half = 20.0


def log_likelihood(x):
    """Neal's funnel: y_i ~ N(0, exp(v)), v = x[0]."""
    v, y = x[..., 0], x[..., 1:]
    return (-0.5 * jnp.sum(y**2, axis=-1) / jnp.exp(v)
            - 0.5 * (d - 1) * (v + jnp.log(2 * jnp.pi)))


prior = pc.Prior([pc.Normal(0.0, 3.0)]
                 + [pc.Uniform(-half, half) for _ in range(d - 1)])
# analytic evidence by 1-D quadrature over v: each y_i contributes
# P(|y| < half | v) / (2*half), and at large v a non-negligible part of
# the N(0, e^v) mass falls outside the Uniform(-half, half) support
from scipy import integrate
from scipy.stats import norm


def _integrand(v):
    p_in = norm.cdf(half, scale=np.exp(v / 2)) \
        - norm.cdf(-half, scale=np.exp(v / 2))
    return norm.pdf(v, scale=3.0) * p_in ** (d - 1)


expect = (d - 1) * np.log(1.0 / (2 * half)) \
    + np.log(integrate.quad(_integrand, -40, 40, limit=200)[0])

sampler = pc.Sampler(prior, log_likelihood, vectorize=True,
                     n_effective=1024, n_active=512, random_state=0)
sampler.run(n_total=2048, n_evidence=2048)

logz, logz_err = sampler.evidence()
print(f"logZ = {logz:.3f} +- {logz_err:.3f}   (analytic {expect:.3f})")
print(f"k-hat = {sampler.evidence_khat:.2f}  "
      f"(estimator used: {sampler.evidence_method_used})")

# the funnel's neck: the posterior of v must reach well below 0
x, w, _, _ = sampler.posterior()
w = w / w.sum()
v_mean = float(w @ x[:, 0])
v_sd = float(np.sqrt(w @ (x[:, 0] - v_mean) ** 2))
print(f"v posterior: mean {v_mean:+.2f}  sd {v_sd:.2f}  "
      f"(truth: mean ~0 under the N(0,3) prior x funnel)")
