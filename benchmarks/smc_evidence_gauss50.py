"""SMC persistent-sampling evidence accuracy at 50-D (round-3 item).

Round 2 measured the gauss50 SMC evidence (n_evidence=0 fallback) at
+2.1 nats and attributed it to the f32 on-device logl history. Round-3
diagnosis: f32 *storage* noise is ~1e-5 nats — the real mechanism is the
likelihood einsum running at the TPU default (bf16-input) matmul
precision, whose O(|logl|*4e-3) noise inflates every logsumexp in the
persistent-sampling logz ladder by ~sigma^2/2 nats and compounds across
iterations. The engine now traces all user likelihood/prior calls under
matmul precision 'float32' (mcmc.make_loglike_device).

This script measures, on the north-star gauss50 config:
  1. flow-IS logZ error (headline estimator),
  2. SMC evidence error from the stored history (the fallback),
  3. the same with the logl history re-evaluated on host in f64 and the
     logz ladder recomputed self-consistently — isolating any residual
     device-precision contribution.

Run: python benchmarks/smc_evidence_gauss50.py [corr_threshold]
"""
import sys, time
import numpy as np
import jax.numpy as jnp
from scipy.stats import multivariate_normal
import pocomc_tpu as pc
from pocomc_tpu.ops.weights import compute_logw_and_logz


def recompute_smc_logz(logl, beta):
    """Self-consistent persistent-sampling logz ladder in f64 from raw
    (T, n) logl and (T,) beta (mirrors the run's phase-A recursion,
    including the carry rule when beta stalls)."""
    T = len(beta)
    logz = np.zeros(T)
    for i in range(1, T):
        if beta[i] == beta[i - 1]:
            logz[i] = logz[i - 1]
        else:
            _, logz[i] = compute_logw_and_logz(
                logl[:i], beta[:i], logz[:i], float(beta[i]))
    _, final = compute_logw_and_logz(logl, beta, logz, 1.0)
    return final


def main(corr_threshold=0.5):
    d = 50
    rng = np.random.default_rng(0)
    evals = np.logspace(0, 3, d)
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    cov = (Q * evals) @ Q.T
    cov_inv = np.linalg.inv(cov)
    cov_inv_j = jnp.asarray(cov_inv, dtype=jnp.float32)
    nc = -0.5 * (d * np.log(2 * np.pi) + np.linalg.slogdet(cov)[1])

    def loglike(x):
        return nc - 0.5 * jnp.einsum("ni,ij,nj->n", x, cov_inv_j, x)

    ps = 100.0
    prior = pc.Prior([pc.Normal(0, ps) for _ in range(d)])
    expect = multivariate_normal.logpdf(np.zeros(d), np.zeros(d),
                                        cov + ps**2 * np.eye(d))

    t0 = time.time()
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=4096, n_active=2048,
                   corr_threshold=corr_threshold)
    s.run(n_total=4096, n_evidence=4096, progress=False)
    wall = time.time() - t0

    _, smc_logz = s.particles.compute_logw_and_logz(1.0)
    print(f"wall {wall:.0f}s  iters {s.t}  calls {s.calls}  "
          f"khat {s.evidence_khat:.2f} ({s.evidence_method_used})")
    print(f"analytic          {expect:.3f}")
    print(f"flow-IS           {s.logz:.3f} +- {s.logz_err:.3f}  "
          f"err {s.logz - expect:+.3f}")
    print(f"SMC (stored hist) {smc_logz:.3f}  err {smc_logz - expect:+.3f}")

    # f64 re-evaluation of the stored x history + self-consistent ladder
    x = s.particles.get("x")          # (T, n, d) f64 copies of f32 values
    beta = s.particles.get("beta")
    T, n, _ = x.shape
    xf = x.reshape(T * n, d)
    logl64 = (nc - 0.5 * np.einsum("ni,ij,nj->n", xf, cov_inv, xf)
              ).reshape(T, n)
    stored = s.particles.get("logl")
    print(f"stored-vs-f64 logl noise: std {np.std(stored - logl64):.3g}  "
          f"max {np.max(np.abs(stored - logl64)):.3g}")
    smc64 = recompute_smc_logz(logl64, beta)
    print(f"SMC (f64 ladder)  {smc64:.3f}  err {smc64 - expect:+.3f}")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.5)
