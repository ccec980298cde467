"""Univariate monotone transforms for autoregressive flows.

Two families, matching the reference's zuko configuration
(/root/reference/pocomc/flow.py:54-86):
  - monotonic affine (MAF): z = (x - loc) * exp(-log_scale), log_scale
    soft-clipped for stability; 2 parameters per dimension,
  - monotonic rational-quadratic spline (NSF, Durkan et al. 2019): 8 bins
    on [-B, B] with identity tails; 3*bins - 1 parameters per dimension.

All functions are elementwise over arbitrary leading batch/dim axes and
both directions are analytic (the RQS inverse solves the bin-local
quadratic), so they fuse into the surrounding jitted programs. Parameters
are zero-init-friendly: raw params of 0 give the identity map in both
families (see shifted softplus for the spline derivatives).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG_SCALE_BOUND = 5.0
SPLINE_BOUND = 5.0
MIN_BIN = 1e-3
MIN_DERIV = 1e-3
# shift such that MIN_DERIV + softplus(0 + shift) == 1 exactly (identity init)
_SOFTPLUS_INV_1 = math.log(math.exp(1.0 - MIN_DERIV) - 1.0)


# ----------------------------------------------------------------------------
# Affine
# ----------------------------------------------------------------------------

AFFINE_N_PARAMS = 2


def affine_forward(x, params):
    """x -> z (data -> latent). params: (..., 2) = [loc, raw_scale].
    Returns (z, ladj) with ladj elementwise log|dz/dx|."""
    loc = params[..., 0]
    log_s = LOG_SCALE_BOUND * jnp.tanh(params[..., 1] / LOG_SCALE_BOUND)
    z = (x - loc) * jnp.exp(-log_s)
    return z, -log_s


def affine_inverse(z, params):
    """z -> x. Returns (x, ladj) with ladj elementwise log|dx/dz|."""
    loc = params[..., 0]
    log_s = LOG_SCALE_BOUND * jnp.tanh(params[..., 1] / LOG_SCALE_BOUND)
    x = z * jnp.exp(log_s) + loc
    return x, log_s


# ----------------------------------------------------------------------------
# Rational-quadratic spline
# ----------------------------------------------------------------------------

def rqs_n_params(bins: int) -> int:
    return 3 * bins - 1


def _cumsum_last(a, k: int):
    """Cumulative sum over a small trailing axis as an upper-triangular
    matmul. Equivalent to jnp.cumsum(a, -1) for k lanes, but lowers
    everywhere (Pallas TPU has no cumsum primitive) and is a single
    fused contraction for the k <= 9 spline axes used here. The
    triangular mask is built from iotas, not a materialized constant —
    Pallas kernels reject captured device arrays."""
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    tri = (r <= c).astype(a.dtype)
    return jnp.dot(a, tri, preferred_element_type=a.dtype)


def _set_last(a, value):
    """a.at[..., -1].set(value) as an iota-mask select (Pallas TPU has no
    scatter primitive; XLA fuses this identically)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    return jnp.where(idx == a.shape[-1] - 1, jnp.asarray(value, a.dtype), a)


def _rqs_setup(params, bins: int):
    """Raw params (..., 3*bins-1) -> knot positions and derivatives."""
    B = SPLINE_BOUND
    w_raw = params[..., :bins]
    h_raw = params[..., bins:2 * bins]
    d_raw = params[..., 2 * bins:]

    widths = MIN_BIN + (1 - MIN_BIN * bins) * jax.nn.softmax(w_raw, axis=-1)
    heights = MIN_BIN + (1 - MIN_BIN * bins) * jax.nn.softmax(h_raw, axis=-1)
    widths = widths * 2 * B
    heights = heights * 2 * B

    cw = _cumsum_last(widths, bins)
    xk = jnp.concatenate([jnp.full_like(cw[..., :1], -B), cw - B], axis=-1)
    xk = _set_last(xk, B)
    ch = _cumsum_last(heights, bins)
    yk = jnp.concatenate([jnp.full_like(ch[..., :1], -B), ch - B], axis=-1)
    yk = _set_last(yk, B)

    inner = MIN_DERIV + jax.nn.softplus(d_raw + _SOFTPLUS_INV_1)
    ones = jnp.ones_like(inner[..., :1])
    deriv = jnp.concatenate([ones, inner, ones], axis=-1)  # (..., bins+1)
    return xk, yk, deriv


def _gather_pair(arr, oh0, oh1):
    """Gather arr[..., idx] and arr[..., idx+1] via one-hot contractions.

    TPU-friendly replacement for take_along_axis: gathers lower to slow
    scatter/gather sequences on the VPU, while a one-hot multiply-reduce
    over K<=9 lanes is a handful of fused vector ops.
    """
    return jnp.sum(arr * oh0, axis=-1), jnp.sum(arr * oh1, axis=-1)


def _bin_onehots(pos, knots, bins):
    """One-hot encodings of the bin index (and index+1) containing pos."""
    idx = jnp.clip(jnp.sum((pos[..., None] >= knots[..., 1:-1]), axis=-1),
                   0, bins - 1)
    K = knots.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, pos.shape + (K,), pos.ndim)
    oh0 = (iota == idx[..., None]).astype(knots.dtype)
    oh1 = (iota == (idx + 1)[..., None]).astype(knots.dtype)
    return oh0, oh1


def rqs_forward(x, params, bins: int):
    """x -> y with ladj = log|dy/dx| elementwise; identity outside [-B, B]."""
    B = SPLINE_BOUND
    xk, yk, deriv = _rqs_setup(params, bins)
    inside = (x > -B) & (x < B)
    xc = jnp.clip(x, -B + 1e-6, B - 1e-6)

    oh0, oh1 = _bin_onehots(xc, xk, bins)
    x0, x1 = _gather_pair(xk, oh0, oh1)
    y0, y1 = _gather_pair(yk, oh0, oh1)
    d0, d1 = _gather_pair(deriv, oh0, oh1)

    w = x1 - x0
    h = y1 - y0
    s = h / w
    xi = (xc - x0) / w
    xi1m = 1 - xi
    denom = s + (d1 + d0 - 2 * s) * xi * xi1m
    y = y0 + h * (s * xi * xi + d0 * xi * xi1m) / denom
    dydx = s * s * (d1 * xi * xi + 2 * s * xi * xi1m + d0 * xi1m * xi1m) / (denom * denom)

    y = jnp.where(inside, y, x)
    ladj = jnp.where(inside, jnp.log(dydx), 0.0)
    return y, ladj


def rqs_inverse(y, params, bins: int):
    """y -> x with ladj = log|dx/dy| elementwise; identity outside [-B, B]."""
    B = SPLINE_BOUND
    xk, yk, deriv = _rqs_setup(params, bins)
    inside = (y > -B) & (y < B)
    yc = jnp.clip(y, -B + 1e-6, B - 1e-6)

    oh0, oh1 = _bin_onehots(yc, yk, bins)
    x0, x1 = _gather_pair(xk, oh0, oh1)
    y0, y1 = _gather_pair(yk, oh0, oh1)
    d0, d1 = _gather_pair(deriv, oh0, oh1)

    w = x1 - x0
    h = y1 - y0
    s = h / w
    dy = yc - y0
    t = d1 + d0 - 2 * s
    a = h * (s - d0) + dy * t
    b = h * d0 - dy * t
    c = -s * dy
    disc = jnp.maximum(b * b - 4 * a * c, 0.0)
    xi = 2 * c / (-b - jnp.sqrt(disc))
    xi = jnp.clip(xi, 0.0, 1.0)
    x = x0 + xi * w

    xi1m = 1 - xi
    denom = s + t * xi * xi1m
    dydx = s * s * (d1 * xi * xi + 2 * s * xi * xi1m + d0 * xi1m * xi1m) / (denom * denom)

    x = jnp.where(inside, x, y)
    ladj = jnp.where(inside, -jnp.log(dydx), 0.0)
    return x, ladj
