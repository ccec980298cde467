"""A/B: flow-IS evidence under heavier-tailed latent proposals.

The round-3 residual gaps (quickstart flow-IS floor -0.10, funnel25
-0.25, rosenbrock spread +-0.3) are all negative-bias symptoms of the
flow under-covering the target's tails at evidence-draw time: draws
rarely land where q << p, so the finite-n logsumexp misses mass and
k-hat reads 0.4-0.7. The IS identity holds for ANY proposal with
computable density, so this experiment swaps the evidence proposal's
LATENT base from N(0, I) to

  * t-nu:   z ~ multivariate Student-t_nu(0, I)  (radially heavier)
  * defensive mixture: half the draws from each base, weighted by the
    pointwise mixture density 0.5 q_flow + 0.5 q_t (bounded weights
    w.r.t. the flow component; Hesterberg 1995)

pushing z through the SAME trained flow. For any base b(z) the
proposal density at u is b(z) + log|det dz/du| (one forward pass), so
all variants share one fused device program.

Run: python benchmarks/evidence_proposal_ab.py [quickstart|funnel25] [seeds...]
"""
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

import pocomc_tpu as pc
from pocomc_tpu.mcmc import f32_precision
from pocomc_tpu.ops.psis import psislw


def _mvt_logpdf(z, nu):
    d = z.shape[-1]
    r2 = jnp.sum(z * z, axis=-1)
    return (gammaln((nu + d) / 2.0) - gammaln(nu / 2.0)
            - 0.5 * d * jnp.log(nu * jnp.pi)
            - 0.5 * (nu + d) * jnp.log1p(r2 / nu))


def _normal_logpdf(z):
    d = z.shape[-1]
    return -0.5 * jnp.sum(z * z, axis=-1) - 0.5 * d * math.log(2 * math.pi)


def make_program(s, n, nu):
    """One fused program returning per-draw (logw_flow-ish raw ratios)
    for the three proposals on a shared draw budget n."""
    flow, scaler, log_prior = s.flow, s.scaler, s._logprior_dev
    like = s._like_batch_fn
    d = s.n_dim

    def ratios(params, seed, scp):
        k = jax.random.key(seed)
        k1, k2, k3 = jax.random.split(k, 3)
        zn = jax.random.normal(k1, (n, d))
        g = 2.0 * jax.random.gamma(k2, nu / 2.0, (n, 1))
        zt = jax.random.normal(k3, (n, d)) * jnp.sqrt(nu / g)

        def logratio(z, base_logq):
            # base_logq(z_fwd) callable evaluated at the recovered latent
            u, ladj_inv = flow._inverse(params, z)  # log|det du/dz|
            x, logdetj = scaler.inverse(u, params=scp)
            logp = log_prior(x)
            finite = jnp.isfinite(logp)
            x_safe = jnp.where(finite[:, None], x, 0.0)
            logl = jnp.where(finite, f32_precision(like)(x_safe), -jnp.inf)
            logq_u = base_logq(z) - ladj_inv
            return jnp.where(finite, logl + logp + logdetj - logq_u,
                             jnp.nan)

        k4 = jax.random.fold_in(k, 4)
        g3 = 2.0 * jax.random.gamma(k4, 3.0 / 2.0, (n, 1))
        zt3 = jax.random.normal(jax.random.fold_in(k, 5), (n, d)) \
            * jnp.sqrt(3.0 / g3)

        # pure flow proposal (baseline, = shipped _evidence_program)
        w_flow = logratio(zn, _normal_logpdf)
        # pure t-latent proposals
        w_t = logratio(zt, lambda z: _mvt_logpdf(z, nu))
        w_t3 = logratio(zt3, lambda z: _mvt_logpdf(z, 3.0))

        # defensive mixture: n/2 from each base, mixture density at both
        def mix_logq(z):
            return jnp.logaddexp(_normal_logpdf(z),
                                 _mvt_logpdf(z, nu)) - math.log(2.0)
        z_mix = jnp.concatenate([zn[: n // 2], zt[n // 2:]], axis=0)
        w_mix = logratio(z_mix, mix_logq)
        return w_flow, w_t, w_t3, w_mix

    return jax.jit(ratios)


def estimate(logw):
    logw = np.asarray(jax.device_get(logw), dtype=np.float64)
    logw = logw[~(np.isnan(logw) | np.isposinf(logw))]
    sm, khat = psislw(logw)
    out = {}
    for tag, lw in (("is", logw), ("psis", sm)):
        m = lw.max()
        out[tag] = float(m + np.log(np.sum(np.exp(lw - m))) - np.log(len(lw)))
    out["khat"] = float(khat)
    return out


def quickstart(seed):
    def log_like(x):
        return -jnp.sum(10.0 * (x[..., ::2] ** 2 - x[..., 1::2]) ** 2
                        + (x[..., ::2] - 1.0) ** 2, axis=-1)
    prior = pc.Prior([pc.Normal(0.0, 3.0) for _ in range(10)])
    s = pc.Sampler(prior, log_like, vectorize=True, random_state=seed)
    s.run(progress=False)
    return s, -21.4021


def funnel25(seed):
    d = 25
    prior = pc.Prior([pc.Normal(0.0, 3.0)]
                     + [pc.Uniform(-20.0, 20.0) for _ in range(d - 1)])
    def log_like(x):
        v = x[..., 0]
        sig2 = jnp.exp(v)
        rest = x[..., 1:]
        return (-0.5 * jnp.sum(rest * rest, axis=-1) / sig2
                - 0.5 * (d - 1) * (v + math.log(2 * math.pi)))
    # truth: integral over uniform box of the gaussian mass (quadrature)
    from scipy.stats import norm
    vs = np.linspace(-12, 12, 4001)
    mass = (norm.cdf(20.0 / np.exp(vs / 2)) - norm.cdf(-20.0 / np.exp(vs / 2)))
    integ = norm.pdf(vs, 0, 3) * mass ** (d - 1)
    truth = float(np.log(np.trapezoid(integ, vs)) - (d - 1) * np.log(40.0))
    s = pc.Sampler(prior, log_like, vectorize=True, random_state=seed)
    s.run(progress=False)
    return s, truth


def rosenbrock10(seed):
    d = 10
    prior = pc.Prior([pc.Uniform(-10, 10) for _ in range(d)])
    def loglike(x):
        return -jnp.sum(100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2
                        + (1.0 - x[..., :-1]) ** 2, axis=-1)
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=seed,
                   n_effective=2048, n_active=1024)
    s.run(n_total=4096, n_evidence=4096, progress=False)
    return s, -50.033


def mixture20(seed):
    # 70/30 two-Gaussian mixture in 20-D (baseline_configs.py)
    d = 20
    mu = 3.0
    prior = pc.Prior([pc.Normal(0.0, 5.0) for _ in range(d)])
    def loglike(x):
        a = -0.5 * jnp.sum((x - mu) ** 2, axis=-1)
        b = -0.5 * jnp.sum((x + mu) ** 2, axis=-1)
        c = -0.5 * d * math.log(2 * math.pi)
        return jnp.logaddexp(jnp.log(0.7) + a, jnp.log(0.3) + b) + c
    from scipy.stats import norm
    truth = float(d * norm.logpdf(0.0, mu, math.sqrt(1 + 5.0 ** 2)))
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=seed)
    s.run(progress=False)
    return s, truth


CONFIGS = {"quickstart": quickstart, "funnel25": funnel25,
           "rosenbrock10": rosenbrock10, "mixture20": mixture20}


def main():
    args = sys.argv[1:]
    name = args[0] if args else "quickstart"
    seeds = [int(a) for a in args[1:]] or [1, 2, 3]
    nu = 5.0
    for seed in seeds:
        t0 = time.time()
        s, truth = CONFIGS[name](seed)
        prog = make_program(s, 4096, nu)
        w_flow, w_t, w_t3, w_mix = prog(s.flow.params, seed + 777, s._scp())
        rows = {"flow": estimate(w_flow), f"t{nu:.0f}": estimate(w_t),
                "t3": estimate(w_t3), "mix": estimate(w_mix)}
        print(f"{name} seed {seed}  run-logz {s.logz:.3f} "
              f"(err {s.logz - truth:+.3f}, khat {s.evidence_khat:.2f}, "
              f"method {s.evidence_method_used})  wall {time.time()-t0:.0f}s")
        for k, r in rows.items():
            print(f"   {k:5s}  is {r['is'] - truth:+.3f}  "
                  f"psis {r['psis'] - truth:+.3f}  khat {r['khat']:.2f}",
                  flush=True)


if __name__ == "__main__":
    main()
