"""Change-of-variables reparameterization x <-> u (jittable).

Maps every parameter to an unbounded, standardized space:
  - per-dimension bound bijections (none / left / right / both) selected by
    static masks, computed branchlessly so the whole map is one fused XLA
    program (reference: /root/reference/pocomc/scaler.py:228-274 uses
    boolean-mask scatter assignments; here we compute all four candidate
    branches and `where`-select, which vectorizes on the VPU),
  - an affine whitening on top (diagonal or full Cholesky; reference
    scaler.py:276-313 loops particles in Python, here it is one matmul),
  - closed-form periodic / reflective boundary wrapping (reference
    scaler.py:109-157 uses per-element Python while-loops; here modular
    arithmetic and a triangle wave).

Conventions match the reference: `forward(x) -> u`; `inverse(u) -> (x,
log_det_J)` where log_det_J = sum_dims log|dx/du| (scaler.py:204-226).
The latent reference bug of a discarded np.clip (scaler.py:393) is fixed
here by actually clipping.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfinv

from .utils.validation import (assert_array_2d, assert_array_float,
                               assert_array_finite,
                               assert_array_within_interval)

_LOG_SQRT_2PI = 0.5 * np.log(2.0 * np.pi)


class Reparameterize:
    """Vectorized reparameterizer for bounded parameters.

    Parameters
    ----------
    n_dim : int
        Number of parameters.
    bounds : array (n_dim, 2) or (2,) or None
        Lower/upper bounds per dimension (np.inf for unbounded sides).
    periodic : list[int] or None
        Dimensions wrapped periodically onto [low, high].
    reflective : list[int] or None
        Dimensions reflected back into [low, high].
    transform : "probit" | "logit"
        Two-sided bound bijection.
    scale : bool
        Apply affine whitening after the bound bijection.
    diagonal : bool
        Diagonal (mean/std) whitening instead of full Cholesky.
    """

    def __init__(self, n_dim, bounds=None, periodic=None, reflective=None,
                 transform="probit", scale=True, diagonal=True):
        self.n_dim = int(n_dim)

        if bounds is None:
            bounds = np.full((self.n_dim, 2), np.inf)
            bounds[:, 0] = -np.inf
        bounds = np.asarray(bounds, dtype=np.float64)
        if bounds.shape == (2,):
            bounds = np.tile(bounds.reshape(1, 2), (self.n_dim, 1))
        if bounds.shape != (self.n_dim, 2):
            raise ValueError(f"bounds must have shape ({self.n_dim}, 2), got {bounds.shape}")

        if transform not in ("probit", "logit"):
            raise ValueError("transform must be 'probit' or 'logit'")
        self.transform = transform
        self.scale = bool(scale)
        self.diagonal = bool(diagonal)

        low = bounds[:, 0]
        high = bounds[:, 1]
        finite_low = np.isfinite(low)
        finite_high = np.isfinite(high)

        # Static per-dimension branch masks. Host numpy: these enter the
        # jitted maps as trace-time constants; eager jnp.asarray here
        # would pay a device round trip per constant at construction.
        self.mask_none = ~finite_low & ~finite_high
        self.mask_left = finite_low & ~finite_high
        self.mask_right = ~finite_low & finite_high
        self.mask_both = finite_low & finite_high

        # Safe sentinel bounds so unused branches stay finite.
        self.low = low
        self.high = high
        self._low_s = np.where(finite_low, low, 0.0).astype(np.float32)
        self._high_s = np.where(finite_high, high, 1.0).astype(np.float32)
        rng = np.where(finite_low & finite_high, high - low, 1.0)
        self._range_s = rng.astype(np.float32)
        self._log_range = np.log(rng).astype(np.float32)

        self.periodic = periodic
        self.reflective = reflective
        per = np.zeros(self.n_dim, dtype=bool)
        ref = np.zeros(self.n_dim, dtype=bool)
        if periodic is not None:
            per[np.asarray(periodic, dtype=int)] = True
        if reflective is not None:
            ref[np.asarray(reflective, dtype=int)] = True
        self.mask_periodic = per
        self.mask_reflective = ref
        self.has_boundary = bool(per.any() or ref.any())

        # Affine whitening parameters (set by fit()).
        self.mu = np.zeros(self.n_dim, np.float32)
        self.sigma = np.ones(self.n_dim, np.float32)
        self.L = None
        self.L_inv = None
        self.log_det_L = np.float32(0.0)
        self._fitted = False

    # -- boundary conditions -------------------------------------------------

    def apply_boundary_conditions_x(self, x):
        """Closed-form periodic wrap and reflective fold in x-space."""
        if not self.has_boundary:
            return x
        rng = self._range_s
        low = self._low_s
        # periodic: low + ((x - low) mod range)
        xp = low + jnp.mod(x - low, rng)
        # reflective: triangle wave with period 2*range
        y = jnp.mod(x - low, 2.0 * rng)
        xr = low + jnp.minimum(y, 2.0 * rng - y)
        x = jnp.where(self.mask_periodic, xp, x)
        x = jnp.where(self.mask_reflective, xr, x)
        return x

    # -- bound bijections ----------------------------------------------------

    def _forward_bounds(self, x):
        eps = 1e-13
        u_left = jnp.log(jnp.maximum(x - self._low_s, eps))
        u_right = jnp.log(jnp.maximum(self._high_s - x, eps))
        p = (x - self._low_s) / self._range_s
        p = jnp.clip(p, eps, 1.0 - eps)
        if self.transform == "logit":
            u_both = jnp.log(p) - jnp.log1p(-p)
        else:
            u_both = jnp.sqrt(2.0) * erfinv(2.0 * p - 1.0)
        u = x
        u = jnp.where(self.mask_left, u_left, u)
        u = jnp.where(self.mask_right, u_right, u)
        u = jnp.where(self.mask_both, u_both, u)
        return u

    def _inverse_bounds(self, u):
        x_left = jnp.exp(u) + self._low_s
        x_right = self._high_s - jnp.exp(u)
        if self.transform == "logit":
            # p = sigmoid(u); stable logs via softplus
            p = jax.nn.sigmoid(u)
            x_both = p * self._range_s + self._low_s
            j_both = self._log_range - jax.nn.softplus(-u) - jax.nn.softplus(u)
        else:
            p = 0.5 * (erf(u / jnp.sqrt(2.0)) + 1.0)
            x_both = p * self._range_s + self._low_s
            j_both = self._log_range - 0.5 * u * u - _LOG_SQRT_2PI

        x = u
        j = jnp.zeros_like(u)
        x = jnp.where(self.mask_left, x_left, x)
        j = jnp.where(self.mask_left, u, j)
        x = jnp.where(self.mask_right, x_right, x)
        j = jnp.where(self.mask_right, u, j)
        x = jnp.where(self.mask_both, x_both, x)
        j = jnp.where(self.mask_both, j_both, j)
        return x, jnp.sum(j, axis=-1)

    # -- affine whitening ----------------------------------------------------

    def _forward_bounds_np(self, x):
        """Host-numpy (f64) mirror of _forward_bounds for the one-time
        fit: zero device involvement."""
        from scipy.special import erfinv as np_erfinv
        eps = 1e-13
        low = np.asarray(self._low_s, np.float64)
        high = np.asarray(self._high_s, np.float64)
        rng = np.asarray(self._range_s, np.float64)
        u_left = np.log(np.maximum(x - low, eps))
        u_right = np.log(np.maximum(high - x, eps))
        p = np.clip((x - low) / rng, eps, 1.0 - eps)
        if self.transform == "logit":
            u_both = np.log(p) - np.log1p(-p)
        else:
            u_both = np.sqrt(2.0) * np_erfinv(2.0 * p - 1.0)
        u = np.where(self.mask_left, u_left, x)
        u = np.where(self.mask_right, u_right, u)
        u = np.where(self.mask_both, u_both, u)
        return u

    def fit(self, x):
        """Learn whitening moments from samples (host-side, once).

        Validates the fit inputs the way the reference's scaler does
        through its input_validation helpers (ref scaler.py /
        input_validation.py): 2-D float array, all finite, inside the
        declared support.
        """
        x = assert_array_finite(
            assert_array_float(assert_array_2d(np.asarray(x,
                                                          dtype=np.float64))))
        self._check_bounds(x)
        u = self._forward_bounds_np(x)
        self.mu = np.mean(u, axis=0).astype(np.float32)
        if self.diagonal:
            self.sigma = np.std(u, axis=0).astype(np.float32)
        else:
            cov = np.cov(u.T)
            cov = np.atleast_2d(cov)
            L = np.linalg.cholesky(cov)
            self.L = L.astype(np.float32)
            self.L_inv = np.linalg.inv(L).astype(np.float32)
            self.log_det_L = np.float32(np.linalg.slogdet(L)[1])
        self._fitted = True

    def _check_bounds(self, x):
        low = np.asarray(self.low)
        high = np.asarray(self.high)
        try:
            assert_array_within_interval(x, low, high)
        except ValueError:
            raise ValueError("Input values outside the prior bounds.")

    # -- public API ----------------------------------------------------------

    def whitening_params(self):
        """The fitted whitening moments as a pytree. Jitted programs that
        should be shareable across Sampler instances take this as an
        ARGUMENT (params=...) instead of closing over the instance state
        — closed-over moments are baked into the trace as constants,
        which both staleness-couples the program to one fit and defeats
        cross-instance program caching."""
        if self.diagonal:
            return dict(mu=self.mu, sigma=self.sigma)
        return dict(mu=self.mu, L=self.L, L_inv=self.L_inv,
                    log_det_L=self.log_det_L)

    def forward(self, x, check_input=False, params=None):
        """x -> u (bound bijection then whitening)."""
        if check_input:
            self._check_bounds(np.asarray(x))
        p = self.whitening_params() if params is None else params
        u = self._forward_bounds(x)
        if self.scale:
            if self.diagonal:
                u = (u - p["mu"]) / p["sigma"]
            else:
                u = (u - p["mu"]) @ p["L_inv"].T
        return u

    def inverse(self, u, params=None):
        """u -> (x, log|det dx/du|) summed over dimensions."""
        p = self.whitening_params() if params is None else params
        if self.scale:
            if self.diagonal:
                v = p["mu"] + p["sigma"] * u
                ladj_affine = jnp.sum(jnp.log(p["sigma"]))
            else:
                v = p["mu"] + u @ p["L"].T
                ladj_affine = p["log_det_L"]
            x, ladj = self._inverse_bounds(v)
            return x, ladj + ladj_affine
        return self._inverse_bounds(u)
