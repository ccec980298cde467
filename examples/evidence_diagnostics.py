"""Evidence tail diagnostics: k-hat and Pareto-smoothed IS.

The flow importance-sampling evidence (reference sampler.py:869-920)
quotes a bootstrap error that silently understates the truth whenever
the importance ratios are heavy-tailed. Every pocomc_tpu run fits a
generalized Pareto to the ratio tail (ops/psis.py, Vehtari et al. 2024)
and exposes the tail index as `sampler.evidence_khat`:

    k-hat <= 0.5   plain IS reliable
    0.5-0.7        heavy tail: prefer evidence_method='psis'
    > 0.7          unreliable regardless; grow the flow / n_effective

Run: python examples/evidence_diagnostics.py   (~2 min on CPU)
"""

import sys as _sys
import pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))


import numpy as np
from scipy.stats import norm

import jax

jax.config.update("jax_platforms", "cpu")  # example runs anywhere

import jax.numpy as jnp  # noqa: E402
import pocomc_tpu as pc  # noqa: E402


def main():
    d = 6
    prior = pc.Prior([pc.Normal(0.0, 5.0) for _ in range(d)])

    def log_like(x):  # unit Gaussian: analytic logZ
        return -0.5 * jnp.sum(x**2, axis=-1) - (d / 2) * np.log(2 * np.pi)

    truth = d * norm.logpdf(0, 0, np.sqrt(26))
    print(f"analytic logZ = {truth:.4f}\n")

    for method in ("is", "psis"):
        s = pc.Sampler(prior, log_like, vectorize=True, random_state=0,
                       n_effective=512, n_active=256, flow="nsf3",
                       evidence_method=method,
                       train_config={"epochs": 200, "patience": 8})
        s.run(n_total=1024, n_evidence=2048, progress=False)
        logz, err = s.evidence()
        print(f"evidence_method={method!r}: logZ {logz:+.4f} +- {err:.4f}"
              f"   k-hat {s.evidence_khat:.3f}   (true err {logz - truth:+.4f})")

    print("\nk-hat <= 0.5 here: both estimators agree with the analytic "
          "value and each other.\nOn hard geometries (50-D ill-conditioned: "
          "RESULTS.md) k-hat rises to ~1.0 and a\nRuntimeWarning explains "
          "that no error bar can be trusted - that warning is the\npoint: "
          "the reference quotes +-0.13 in the same situation.")


if __name__ == "__main__":
    main()
