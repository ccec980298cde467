"""Resampling schemes (systematic and multinomial).

Reference behavior: /root/reference/pocomc/tools.py:136-186 (systematic,
sequential cumulative-sum loop) and sampler.py:702-705 (multinomial via
np.random.choice). Re-designed vectorized: systematic resampling is a
searchsorted over the weight cumsum against stratified uniform positions;
multinomial is searchsorted against iid uniforms. Both have numpy (host)
and jax (device, jittable/shardable) implementations.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def systematic_resample(size: int, weights: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
    """Systematic resampling: one uniform offset, stratified positions."""
    w = np.asarray(weights, dtype=np.float64)
    w = w / w.sum()
    if rng is None:
        rng = np.random.default_rng()
    positions = (rng.random() + np.arange(size)) / size
    csum = np.cumsum(w)
    csum[-1] = 1.0  # guard against round-off
    return np.searchsorted(csum, positions, side="right").clip(0, len(w) - 1)


def multinomial_resample(size: int, weights: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
    """Multinomial resampling: size iid draws from the weight distribution."""
    w = np.asarray(weights, dtype=np.float64)
    w = w / w.sum()
    if rng is None:
        rng = np.random.default_rng()
    return rng.choice(len(w), size=size, replace=True, p=w)


def systematic_resample_jax(key: jax.Array, size: int, weights: jnp.ndarray) -> jnp.ndarray:
    """Device systematic resampling (jittable, static `size`)."""
    w = weights / jnp.sum(weights)
    u0 = jax.random.uniform(key, ())
    positions = (u0 + jnp.arange(size, dtype=w.dtype)) / size
    csum = jnp.cumsum(w)
    csum = csum.at[-1].set(1.0)
    idx = jnp.searchsorted(csum, positions, side="right")
    return jnp.clip(idx, 0, weights.shape[0] - 1)


def multinomial_resample_jax(key: jax.Array, size: int, weights: jnp.ndarray) -> jnp.ndarray:
    """Device multinomial resampling via inverse-CDF (jittable)."""
    w = weights / jnp.sum(weights)
    u = jax.random.uniform(key, (size,), dtype=w.dtype)
    csum = jnp.cumsum(w)
    csum = csum.at[-1].set(1.0)
    idx = jnp.searchsorted(csum, u, side="right")
    return jnp.clip(idx, 0, weights.shape[0] - 1)
