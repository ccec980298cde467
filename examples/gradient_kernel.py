"""Gradient-based mutation (sample='mala') — beyond the reference.

With a JAX-traceable likelihood the mutation kernel can use its
gradient for free: `sample='mala'` runs preconditioned
Metropolis-adjusted Langevin in the flow-latent space, with the
proposal-geometry covariance as the mass matrix and autodiff through
the composed flow/scaler/likelihood program. One vjp pass per step
yields the proposal's Metropolis components AND its gradient. The
reference (torch wrapper around black-box callables) has no gradient
kernel at all.

Here: an 8-D correlated Gaussian with known evidence, run with both
kernels for comparison.
"""

import sys as _sys
import pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))


import numpy as np
import jax.numpy as jnp
from scipy.stats import multivariate_normal

import pocomc_tpu as pc

n_dim = 8
rng = np.random.default_rng(0)
evals = np.logspace(0, 2, n_dim)                       # condition 100
frame, _ = np.linalg.qr(rng.normal(size=(n_dim, n_dim)))
cov = (frame * evals) @ frame.T
cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
norm_const = -0.5 * (n_dim * np.log(2 * np.pi) + np.linalg.slogdet(cov)[1])


def log_likelihood(x):
    return norm_const - 0.5 * jnp.einsum("ni,ij,nj->n", x, cov_inv, x)


prior_scale = 25.0
prior = pc.Prior([pc.Normal(0.0, prior_scale) for _ in range(n_dim)])
logz_true = multivariate_normal.logpdf(
    np.zeros(n_dim), np.zeros(n_dim), cov + prior_scale**2 * np.eye(n_dim))

if __name__ == "__main__":
    for kernel in ("tpcn", "mala"):
        sampler = pc.Sampler(prior, log_likelihood, vectorize=True,
                             random_state=0, sample=kernel)
        sampler.run(n_total=4096, n_evidence=4096, progress=False)
        logz, logz_err = sampler.evidence()
        print(f"{kernel}: logZ = {logz:.3f} +- {logz_err:.3f} "
              f"(true {logz_true:.3f}), {sampler.calls} likelihood calls, "
              f"k-hat {sampler.evidence_khat:.2f}")
