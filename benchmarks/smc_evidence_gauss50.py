"""SMC persistent-sampling evidence accuracy at 50-D (round-3 item).

Round 2 measured the gauss50 SMC evidence (n_evidence=0 fallback) at
+2.1 nats and attributed it to the f32 on-device logl history; round 3
first re-attributed it to bf16-default likelihood noise. BOTH were
wrong: with trace-time f32 precision the stored logl noise is 6e-4 and
the error is unchanged (+2.36). The measured mechanism (RESULTS.md
round 3, "MIS ladder forensics") is the SELF-REFERENTIAL logz ladder:
each logz_t is a balance-heuristic estimate whose denominator reuses
the same logl samples that logz_1..t-1 were estimated from, giving a
positive feedback loop (a too-high logz_i shrinks the denominator b_i,
raising every later logz). With exact iid stage samples the drift is
+0.17 over 140 stages; correlated real-run histories amplify it.

This script measures, on the north-star gauss50 config (tempered logz
is CLOSED-FORM here, so every rung of the ladder can be checked):
  1. flow-IS logZ error (headline estimator),
  2. SMC evidence error from the stored history (the fallback),
  3. ladder-vs-analytic drift per rung, and candidate fixes evaluated
     offline from the saved history: incremental (pairwise) ladder and
     split-half (ladder from one half, evaluation on the other).

Run: python benchmarks/smc_evidence_gauss50.py [corr_threshold]
Saves the history to .round3/gauss50_hist.npz for offline iteration.
"""
import sys, time
import numpy as np
import jax.numpy as jnp
from scipy.stats import multivariate_normal
import pocomc_tpu as pc
from pocomc_tpu.ops.weights import compute_logw_and_logz


def self_consistent_ladder(logl, beta):
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
    return logz


def incremental_ladder(logl, beta):
    """Pairwise-increment ladder: logz_t = logz_{t-1} +
    log mean exp((b_t - b_{t-1}) * logl_{t-1,row}). No self-reference,
    so no feedback loop; per-rung Jensen bias is downward and does not
    compound multiplicatively."""
    T = len(beta)
    logz = np.zeros(T)
    for t in range(1, T):
        db = beta[t] - beta[t - 1]
        lw = db * logl[t - 1]
        m = lw.max()
        logz[t] = logz[t - 1] + m + np.log(np.mean(np.exp(lw - m)))
    return logz


def final_mis(logl, beta, ladder, beta_final=1.0):
    _, z = compute_logw_and_logz(logl, beta, ladder, beta_final)
    return z


def analyze(logl, beta, logz_stored, expect, oracle=None, resid=None):
    """Offline ladder forensics + candidate-fix evaluation."""
    T, n = logl.shape
    sc = self_consistent_ladder(logl, beta)
    inc = incremental_ladder(logl, beta)
    # split-half: ladder from even particles, final MIS on odd particles
    h = n // 2
    sc_a = self_consistent_ladder(logl[:, :h], beta)
    rows = [("stored ladder", final_mis(logl, beta, logz_stored)),
            ("self-consistent", final_mis(logl, beta, sc)),
            ("incremental", final_mis(logl, beta, inc)),
            ("split-half", final_mis(logl[:, h:], beta, sc_a))]
    if resid is not None:
        # residual-hotness corrected ladder: rung t's first-order bias is
        # +dbeta_t * hot_{t-1} where hot = -resid is the LATEST stage's
        # (stage t-1 at reweight time, matching the engine's resid_prev
        # plumbing) unfinished mean-logl relaxation, estimated in-run by
        # the sweep's paired-window extrapolation (mcmc.py accept_update
        # `resid`, negative while hot). Correction = +dbeta * resid_prev.
        # applied to the RAW self-consistent ladder (the stored ladder
        # already carries the in-run correction — adding it again would
        # double-count); unconditional, like the engine (hot-gating
        # measured and rejected, RESULTS.md)
        dbeta = np.diff(beta, prepend=0.0)
        resid_prev = np.concatenate([[0.0], resid[:-1]])
        corr_ladder = sc + np.cumsum(dbeta * resid_prev)
        rows.append(("resid-corrected",
                     final_mis(logl, beta, corr_ladder)))
        if oracle is not None:
            print("resid estimate vs oracle hotness (nats):")
            for t in [1, 5, 10, 25, 50, T - 1]:
                print(f"  t={t:3d}  resid {resid[t]:+9.3f}")
    if oracle is not None:
        rows.append(("oracle ladder", final_mis(logl, beta, oracle)))
        ix = [1, T // 2, -1]
        print("ladder drift (est - analytic) at t=1/mid/end:")
        print(f"  stored      {np.round(logz_stored - oracle, 3)[ix]}")
        print(f"  incremental {np.round(inc - oracle, 3)[ix]}")
        print(f"  split-half  {np.round(sc_a - oracle, 3)[ix]}")
    for name, z in rows:
        print(f"SMC [{name:>15s}] {z:.3f}  err {z - expect:+.3f}")


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

    # analytic tempered logz(b) = log int prior * L^b (closed form)
    def logz_b(b):
        prec = np.eye(d) / ps**2 + b * cov_inv
        _, ld = np.linalg.slogdet(prec)
        return b * nc - 0.5 * ld - d * np.log(ps)

    oracle = np.array([logz_b(b) for b in beta])
    logz_stored = s.particles.get("logz").astype(np.float64)

    # stage-population hotness: mean logl vs the analytic tempered
    # expectation E[logl|b] = nc - tr(Cinv S_b)/2, in population-mean SEs
    # (the round-3 root cause: resampling selects hot particles and
    # under-decorrelated sweeps keep them; see RESULTS.md)
    zs = []
    for t in range(T):
        S_b = np.linalg.inv(np.eye(d) / ps**2 + beta[t] * cov_inv)
        M = cov_inv @ S_b
        E = nc - 0.5 * np.trace(M)
        se = np.sqrt(0.5 * np.trace(M @ M) / n)
        zs.append((logl64[t].mean() - E) / se)
    zs = np.asarray(zs)
    print(f"stage hotness z=(mean-E)/SE: mean {zs.mean():+.1f}  "
          f"max {zs.max():+.1f}  (z at t=5/25/50: "
          f"{zs[min(5, T-1)]:+.1f}/{zs[min(25, T-1)]:+.1f}/"
          f"{zs[min(50, T-1)]:+.1f})")
    # per-stage oracle hotness for the resid-estimator validation
    hot_nats = np.array([logl64[t].mean() - (
        nc - 0.5 * np.trace(cov_inv @ np.linalg.inv(
            np.eye(d) / ps**2 + beta[t] * cov_inv))) for t in range(T)])
    resid = np.asarray(s.particles.get("resid"), dtype=np.float64)
    hot_flag = np.asarray(s.particles.get("hot"), dtype=np.float64)
    print("stage:   resid(est)  hot(oracle)  exit-hot   [nats]")
    for t in [1, 5, 10, 20, 30, 40, 50, 60, T - 1]:
        print(f"{t:4d}  {resid[t]:+11.3f}  {hot_nats[t]:+11.3f}  "
              f"{hot_flag[t]:8.0f}")

    import os
    os.makedirs(".round3", exist_ok=True)
    np.savez(".round3/gauss50_hist.npz", logl=logl64, beta=beta,
             logz=logz_stored, oracle=oracle, expect=expect,
             resid=resid, hot=hot_nats, hot_flag=hot_flag)
    analyze(logl64, beta, logz_stored, expect, oracle, resid=resid)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.5)
