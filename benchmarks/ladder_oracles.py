"""Exact tempered-evidence oracles logZ(beta) for the north-star configs.

Every config in benchmarks/baseline_configs.py except mixture20 admits an
exact (quadrature / closed-form) normalizing constant for the tempered
target prior(x) * L(x)^beta, which makes every rung of the SMC
persistent-sampling ladder checkable — not just the endpoint. Used by
ladder_estimators.py to decompose the final smcZ error into

  (a) rung-value error: replace the stored logz ladder with the exact
      one in the MIS mixture denominators — if the final estimate
      becomes exact, the history POPULATIONS are fine and only the rung
      estimates need repair (the gauss50 round-3 oracle result);
  (b) population-coverage error: if the oracle-rung estimate is STILL
      biased, the stored samples themselves are mis-distributed (e.g.
      the funnel-neck mass the populations never carried) and no
      denominator re-laying can recover it.

Also provides the exact per-rung mean energy E_beta[logl] =
dlogZ/dbeta (finite difference), giving the ORACLE hotness of each
stage population: hot_t = E_{beta_t}[logl] - mean(logl_t).

All oracles return logZ relative to the prior (logZ(0) = 0), the same
convention as the stored `Particles.past["logz"]` ladder.
"""
import numpy as np
from scipy.stats import norm
from scipy.special import erf


def _logsumexp_w(la, w):
    """log sum_i w_i exp(la_i) with nonnegative weights w."""
    m = np.max(la)
    return m + np.log(np.sum(w * np.exp(la - m)))


def quickstart_logz(betas):
    """Banana-coupled 10-D Rosenbrock, N(0,3) prior (pairwise factorized).

    logl = -sum_pairs [10 (a^2 - b)^2 + (a - 1)^2], prior N(0, 3^2) per
    dim. The b-integral is Gaussian-analytic:
      int N(b|0,s^2) exp(-c (b - m)^2) db
        = (1 + 2 s^2 c)^{-1/2} exp(-c m^2 / (1 + 2 s^2 c))
    with c = 10 beta, m = a^2; the remaining a-integral is 1-D
    trapezoid quadrature. logZ(beta) = 5 * log zpair(beta).
    """
    s2 = 9.0
    a = np.linspace(-14.0, 14.0, 40001)
    wa = np.gradient(a)
    log_na = -0.5 * a**2 / s2 - 0.5 * np.log(2 * np.pi * s2)
    out = np.empty(len(betas))
    for i, b in enumerate(np.asarray(betas, dtype=np.float64)):
        if b == 0.0:
            out[i] = 0.0
            continue
        c = 10.0 * b
        la = (log_na - b * (a - 1.0) ** 2
              - 0.5 * np.log1p(2 * s2 * c)
              - c * a**4 / (1.0 + 2 * s2 * c))
        out[i] = 5.0 * _logsumexp_w(la, wa)
    return out


def funnel25_logz(betas, d=25, sv=3.0, half=40.0):
    """Neal funnel, N(v|0,sv^2) x Uniform(-half,half)^(d-1) prior.

    beta*logl = -beta sum y^2/(2 e^v) - beta (d-1)/2 (v + log 2pi).
    The y-integrals over the box are error functions:
      int_{-half}^{half} exp(-beta y^2 / (2 e^v)) dy
        = sqrt(2 pi e^v / beta) * (2 Phi(half sqrt(beta) e^{-v/2}) - 1)
    leaving 1-D quadrature over v.
    """
    m = d - 1
    v = np.linspace(-80.0, 80.0, 160001)
    wv = np.gradient(v)
    log_nv = -0.5 * v**2 / sv**2 - 0.5 * np.log(2 * np.pi * sv**2)
    out = np.empty(len(betas))
    for i, b in enumerate(np.asarray(betas, dtype=np.float64)):
        if b == 0.0:
            out[i] = 0.0
            continue
        z = half * np.sqrt(b) * np.exp(-v / 2.0)
        # log(2 Phi(z) - 1) = log erf(z / sqrt 2), stable for tiny z via
        # the series erf(x) ~ 2x/sqrt(pi)
        x = z / np.sqrt(2.0)
        with np.errstate(divide="ignore"):
            log_erf = np.where(
                x < 1e-6, np.log(2.0 / np.sqrt(np.pi)) + np.log(x),
                np.log(np.maximum(erf(x), 1e-300)))
        la = (log_nv - m * np.log(2 * half)
              + 0.5 * m * (np.log(2 * np.pi) + v - np.log(b)) + m * log_erf
              - 0.5 * m * b * (v + np.log(2 * np.pi)))
        out[i] = _logsumexp_w(la, wv)
    return out


def rosenbrock10_logz(betas, d=10, half=10.0, n_grid=4001):
    """Chained Rosenbrock, Uniform(-10,10)^10 prior, transfer matrices.

    logl = -sum_{i=1}^{9} [100 (x_{i+1} - x_i^2)^2 + (1 - x_i)^2].
    Z(beta) = (1/20)^10 int prod K_b(x_i, x_{i+1}) dx with
    K_b(x, y) = exp(-beta (100 (y - x^2)^2 + (1 - x)^2)); evaluated by
    9 chunked matrix-vector quadrature products per beta, carrying a
    running log-scale for stability.
    """
    x = np.linspace(-half, half, n_grid)
    w = np.gradient(x)
    out = np.empty(len(betas))
    for i, b in enumerate(np.asarray(betas, dtype=np.float64)):
        if b == 0.0:
            out[i] = 0.0
            continue
        v = np.ones(n_grid)
        log_scale = 0.0
        for _ in range(d - 1):
            nv = np.zeros(n_grid)
            # chunk over source x rows to bound the (chunk, n_grid) block
            for s in range(0, n_grid, 256):
                xs = x[s:s + 256, None]
                block = np.exp(-b * (100.0 * (x[None, :] - xs**2) ** 2
                                     + (1.0 - xs) ** 2))
                nv += (w[s:s + 256, None] * v[s:s + 256, None]
                       * block).sum(axis=0)
            m = nv.max()
            if m <= 0:
                return np.full(len(betas), -np.inf)
            v = nv / m
            log_scale += np.log(m)
        out[i] = log_scale + np.log(np.sum(w * v)) - d * np.log(2 * half)
    return out


def gauss_logz(betas, d, evals_hi, ps):
    """Gaussian likelihood N(x|0,C) vs N(0, ps^2 I) prior, closed form.

    C has eigenvalues logspace(0, evals_hi, d) (the random rotation Q is
    irrelevant for the normalizing constant).
    logZ(beta) = beta * nc - 0.5 sum log(1 + beta ps^2 / lam)
    with nc = -d/2 log 2pi - 1/2 log|C|.
    """
    lam = np.logspace(0, evals_hi, d)
    nc = -0.5 * (d * np.log(2 * np.pi) + np.sum(np.log(lam)))
    betas = np.asarray(betas, dtype=np.float64)
    return (betas * nc
            - 0.5 * np.sum(np.log1p(betas[:, None] * ps**2 / lam[None, :]),
                           axis=1))


def gauss50_logz(betas):
    return gauss_logz(betas, 50, 3, 100.0)


def cosmo30_logz(betas):
    return gauss_logz(betas, 30, 2, 20.0)


def mixture20_logz(betas, d=20, sep=2.0, sig=1.0, w1=0.7, ps=10.0):
    """Two-component 70/30 Gaussian mixture at +-sep*ones(d), N(0,ps^2 I)
    prior — EXACT (not mode-split): both modes lie on the ones-diagonal,
    so logL depends on x only through t = sum(x) and s = |x|^2:

      logL = -s/(2 sig^2) - c + g(t),
      g(t) = logaddexp(log w1 + sep t / sig^2, log(1-w1) - sep t / sig^2),
      c = d sep^2 / (2 sig^2) + (d/2) log(2 pi sig^2).

    Under the prior, t ~ N(0, d ps^2) and s = t^2/d + q with independent
    q ~ ps^2 chi^2_{d-1}; E[exp(-beta q / (2 sig^2))] is closed-form, so
    Z(beta) = (1 + beta ps^2/sig^2)^{-(d-1)/2} e^{-beta c}
              * int N(t|0, d ps^2) exp(-beta t^2/(2 d sig^2) + beta g(t)) dt
    — 1-D trapezoid quadrature over t, every mixture-overlap term kept.
    """
    w2 = 1.0 - w1
    s2 = sig**2
    t = np.linspace(-400.0, 400.0, 200001)
    wt = np.gradient(t)
    log_nt = -0.5 * t**2 / (d * ps**2) - 0.5 * np.log(2 * np.pi * d * ps**2)
    g = np.logaddexp(np.log(w1) + sep * t / s2, np.log(w2) - sep * t / s2)
    c = 0.5 * d * sep**2 / s2 + 0.5 * d * np.log(2 * np.pi * s2)
    out = np.empty(len(betas))
    for i, b in enumerate(np.asarray(betas, dtype=np.float64)):
        if b == 0.0:
            out[i] = 0.0
            continue
        la = log_nt - 0.5 * b * t**2 / (d * s2) + b * g
        out[i] = (_logsumexp_w(la, wt) - b * c
                  - 0.5 * (d - 1) * np.log1p(b * ps**2 / s2))
    return out


ORACLES = {
    "quickstart": quickstart_logz,
    "rosenbrock10": rosenbrock10_logz,
    "funnel25": funnel25_logz,
    "gauss50": gauss50_logz,
    "cosmo30": cosmo30_logz,
    "mixture20": mixture20_logz,
}


def mean_logl(oracle, betas, rel_h=1e-4):
    """Exact E_beta[logl] = dlogZ/dbeta by central finite difference."""
    betas = np.asarray(betas, dtype=np.float64)
    h = np.maximum(betas * rel_h, 1e-7)
    lo = np.maximum(betas - h, 0.0)
    hi = betas + h
    return (oracle(hi) - oracle(lo)) / (hi - lo)


if __name__ == "__main__":
    # self-checks against the analytic endpoint truths used in
    # baseline_configs.py
    from scipy import integrate
    import warnings

    print("quickstart  logZ(1) =", quickstart_logz([1.0])[0],
          " expect -21.4021")
    print("rosenbrock  logZ(1) =", rosenbrock10_logz([1.0])[0],
          " expect -50.033 (4001-grid)",
          rosenbrock10_logz([1.0], n_grid=8001)[0], "(8001-grid)")

    d, sv, half = 25, 3.0, 40.0
    def _f(v):
        p = norm.cdf(half, scale=np.exp(v / 2)) \
            - norm.cdf(-half, scale=np.exp(v / 2))
        return norm.pdf(v, scale=sv) * p ** (d - 1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        expect = (d - 1) * np.log(1.0 / (2 * half)) \
            + np.log(integrate.quad(_f, -60, 60, limit=400)[0])
    print("funnel25    logZ(1) =", funnel25_logz([1.0])[0],
          " expect", expect)

    from scipy.stats import multivariate_normal
    rng = np.random.default_rng(0)
    lam = np.logspace(0, 3, 50)
    Q, _ = np.linalg.qr(rng.normal(size=(50, 50)))
    cov = (Q * lam) @ Q.T
    e50 = multivariate_normal.logpdf(np.zeros(50), np.zeros(50),
                                     cov + 1e4 * np.eye(50))
    print("gauss50     logZ(1) =", gauss50_logz([1.0])[0], " expect", e50)

    # mixture20 endpoint: w1+w2=1 with symmetric modes => per-component
    # closed form (baseline_configs.py mixture20)
    d_m, sep_m, sig_m, ps_m = 20, 2.0, 1.0, 10.0
    var_m = sig_m**2 + ps_m**2
    e_mix = (-0.5 * d_m * sep_m**2 / var_m
             - (d_m / 2) * np.log(2 * np.pi * var_m))
    print("mixture20   logZ(1) =", mixture20_logz([1.0])[0],
          " expect", e_mix)
    # mid-ladder sanity: monotone decreasing in beta, logZ(0)=0
    bs = np.array([0.0, 1e-4, 1e-2, 0.1, 0.5, 1.0])
    for nm, fn in ORACLES.items():
        z = fn(bs)
        print(f"{nm:12s} ladder {np.round(z, 3)}")
