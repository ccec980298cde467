"""Experimental: one full SMC iteration as a single device program over a
device-resident particle history.

The production Sampler orchestrates iterations from the host (a handful of
dispatches each — fine for locally-attached accelerators). This module is
the foundation for a zero-host-round-trip mode: the persistent-sampling
history lives on device in fixed-shape buffers (T_max slots, validity by
count), and ONE jitted call performs

  reweight (ESS bisection over the full history, on device)
  -> resample (systematic, from the flat masked history weights)
  -> geometry fit (weighted moments + Student-t EM)
  -> mutate (fused adaptive t-pCN/RWM sweep)
  -> history write (dynamic slot update)

Everything shards over the particle mesh; the only collectives are
reductions. Flow training stays a separate call (its cadence is a host
decision). Exercised by __graft_entry__.dryrun_multichip; scheduled for
Sampler integration in round 2 (ROADMAP.md #1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.weights import compute_logw_and_logz_jax, ess_jax
from ..ops.resampling import systematic_resample_jax
from ..models.geometry import _fit_geometry_impl


class DeviceHistory(NamedTuple):
    """Fixed-shape device-resident persistent-sampling history."""
    u: jnp.ndarray        # (T_max, n, d)
    x: jnp.ndarray        # (T_max, n, d)
    logdetj: jnp.ndarray  # (T_max, n)
    logl: jnp.ndarray     # (T_max, n)
    logp: jnp.ndarray     # (T_max, n)
    beta: jnp.ndarray     # (T_max,)
    logz: jnp.ndarray     # (T_max,)
    t: jnp.ndarray        # scalar int32: filled slots


def init_history(t_max: int, n: int, d: int, dtype=jnp.float32) -> DeviceHistory:
    z2 = jnp.zeros((t_max, n, d), dtype)
    z1 = jnp.zeros((t_max, n), dtype)
    return DeviceHistory(u=z2, x=z2, logdetj=z1, logl=z1, logp=z1,
                         beta=jnp.zeros(t_max, dtype),
                         logz=jnp.zeros(t_max, dtype),
                         t=jnp.asarray(0, jnp.int32))


def push_history(hist: DeviceHistory, u, x, logdetj, logl, logp, beta, logz
                 ) -> DeviceHistory:
    """Write one iteration into slot hist.t (device, fixed shapes). Writes
    past t_max clamp onto the last slot (size t_max adequately; the
    counter saturates rather than growing silently)."""
    t_max = hist.logl.shape[0]
    t = jnp.minimum(hist.t, t_max - 1)
    upd2 = lambda buf, v: jax.lax.dynamic_update_slice(buf, v[None], (t, 0, 0))
    upd1 = lambda buf, v: jax.lax.dynamic_update_slice(buf, v[None], (t, 0))
    return DeviceHistory(
        u=upd2(hist.u, u), x=upd2(hist.x, x),
        logdetj=upd1(hist.logdetj, logdetj),
        logl=upd1(hist.logl, logl), logp=upd1(hist.logp, logp),
        beta=hist.beta.at[t].set(beta), logz=hist.logz.at[t].set(logz),
        t=jnp.minimum(hist.t + 1, t_max))


def _valid(hist: DeviceHistory):
    t_max = hist.logl.shape[0]
    return jnp.arange(t_max) < hist.t


def bisect_beta_device(hist: DeviceHistory, beta_prev, n_effective,
                       n_iters: int = 40):
    """ESS bisection over the device history (mirrors ops.weights
    .bisect_beta; fixed-count bisection for static control flow)."""
    valid = _valid(hist)

    def metric_at(beta):
        logw, logz = compute_logw_and_logz_jax(
            hist.logl, hist.beta, hist.logz, valid, beta)
        w = jnp.exp(logw - jnp.max(logw))
        return logw, ess_jax(jnp.where(jnp.repeat(valid, hist.logl.shape[1]),
                                       w, 0.0)), logz

    _, m_prev, _ = metric_at(beta_prev)
    _, m_max, _ = metric_at(jnp.asarray(1.0, hist.beta.dtype))

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        _, m, _ = metric_at(mid)
        lo = jnp.where(m >= n_effective, mid, lo)
        hi = jnp.where(m >= n_effective, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iters, body,
                               (beta_prev, jnp.asarray(1.0, hist.beta.dtype)))
    beta_bisect = 0.5 * (lo + hi)
    beta = jnp.where(m_prev <= n_effective, beta_prev,
                     jnp.where(m_max >= n_effective, 1.0, beta_bisect))
    logw, logz = compute_logw_and_logz_jax(
        hist.logl, hist.beta, hist.logz, valid, beta)
    w = jnp.exp(logw - jnp.max(logw))
    w = jnp.where(jnp.repeat(valid, hist.logl.shape[1]), w, 0.0)
    return beta, w / jnp.sum(w), logz


def make_fused_iteration(sweep, flow, n_active: int, n_effective: float):
    """Build iteration(hist, sigma0, flow_params, key) -> (hist, results).

    `sweep` is a mcmc.make_sweep product (preconditioned); `flow` provides
    the latent map for the geometry fit. Flow training happens OUTSIDE
    (separate cadence); this program does reweight/resample/geometry/
    mutate/record in one dispatch.
    """

    def iteration(hist: DeviceHistory, sigma0, flow_params, key):
        k_res, k_geom, k_sweep = jax.random.split(key, 3)
        t_max, n, d = hist.u.shape

        # 1. reweight: next temperature + flat history weights
        beta_prev = hist.beta[jnp.maximum(hist.t - 1, 0)]
        beta, w_flat, logz = bisect_beta_device(hist, beta_prev, n_effective)

        # 2. resample n_active particles from the flat masked history
        idx = systematic_resample_jax(k_res, n_active, w_flat)
        flat2 = lambda a: a.reshape(t_max * n, -1)[idx]
        flat1 = lambda a: a.reshape(t_max * n)[idx]
        u = flat2(hist.u).reshape(n_active, d)
        x = flat2(hist.x).reshape(n_active, d)
        logdetj = flat1(hist.logdetj)
        logl = flat1(hist.logl)
        logp = flat1(hist.logp)

        # 3. proposal geometry in flow-latent space (weights uniform after
        #    resampling)
        theta, _ = flow._forward(flow_params, u)
        geom = _fit_geometry_impl(theta, None, k_geom)

        # 4. mutate
        res = sweep(u, x, logdetj, logl, logp, beta, sigma0, geom, k_sweep,
                    flow_params=flow_params)

        # 5. record
        hist = push_history(hist, res["u"], res["x"], res["logdetj"],
                            res["logl"], res["logp"], beta, logz)
        return hist, dict(beta=beta, logz=logz, accept=res["accept"],
                          steps=res["steps"], calls=res["calls"],
                          proposal_scale=res["proposal_scale"])

    return jax.jit(iteration)
