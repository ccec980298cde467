"""Pallas TPU kernels: fused masked-autoregressive MLP (MADE) pass.

The MADE forward is the innermost hot op of the framework: flow training
evaluates it T times per batch, and the autoregressive inverse inside the
t-pCN sweep evaluates it T*d times per MCMC step (models/flow.py). Under
plain XLA each layer is a separate fusion — the masked weights (w * mask)
are materialized and activations round-trip between layers. This kernel
runs the WHOLE pass (input layer, residual hidden layers, output layer)
in one `pallas_call`:

  - the mask multiply is fused into the weight load (never materialized
    to HBM),
  - activations stay in VMEM across layers,
  - the particle axis is tiled over the grid; weights are broadcast to
    every grid step (they fit VMEM comfortably: h<=256 for d<=85),
  - matmuls run on the MXU with preferred_element_type=float32.

Gradients: the returned apply() carries a custom VJP whose backward
re-runs the XLA reference implementation (models/made.apply_made) under
jax.vjp — the Pallas kernel accelerates every forward (training
included); the backward stays one fused XLA HLO.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.made import apply_made as _apply_made_xla


def _made_kernel(n_layers: int):
    """Kernel for an n_layers-deep MADE pass.

    Ref order: x, then (w, b, mask) per layer, then out.
    """

    def kernel(*refs):
        x_ref = refs[0]
        out_ref = refs[-1]
        h = jnp.dot(x_ref[:], refs[1][:] * refs[3][:],
                    preferred_element_type=jnp.float32) + refs[2][:]
        for l in range(1, n_layers - 1):
            w_ref, b_ref, m_ref = refs[1 + 3 * l], refs[2 + 3 * l], refs[3 + 3 * l]
            y = jnp.dot(jnp.maximum(h, 0.0), w_ref[:] * m_ref[:],
                        preferred_element_type=jnp.float32) + b_ref[:]
            if w_ref.shape[0] == w_ref.shape[1]:
                h = h + y
            else:
                h = y
        l = n_layers - 1
        out_ref[:] = jnp.dot(jnp.maximum(h, 0.0),
                             refs[1 + 3 * l][:] * refs[3 + 3 * l][:],
                             preferred_element_type=jnp.float32) + refs[2 + 3 * l][:]

    return kernel


def _pallas_made_call(params, masks, x, tile_n: int, interpret: bool):
    n, d = x.shape
    n_layers = len(params)
    out_features = params[-1]["w"].shape[1]

    in_specs = [pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    for p, m in zip(params, masks):
        fi, fo = p["w"].shape
        for arr, shape in ((p["w"], (fi, fo)),
                           (p["b"].reshape(1, -1), (1, fo)),
                           (m, (fi, fo))):
            in_specs.append(pl.BlockSpec(shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(arr)

    return pl.pallas_call(
        _made_kernel(n_layers),
        grid=(n // tile_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, out_features), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_features), jnp.float32),
        interpret=interpret,
    )(*args)


def make_made_apply(masks, n_dim: int, n_params: int, tile_n: int = 1024,
                    interpret: bool = False):
    """Build apply(params, x) -> (n, d, n_params) backed by the fused
    kernel, with an XLA backward. `masks` are static per flow instance."""
    masks = [jnp.asarray(m) for m in masks]

    @jax.custom_vjp
    def apply(params, x):
        n = x.shape[0]
        tile = min(tile_n, n)
        n_pad = (-n) % tile
        x_in = jnp.pad(x, ((0, n_pad), (0, 0))) if n_pad else x
        out = _pallas_made_call(params, masks, x_in, tile, interpret)
        if n_pad:
            out = out[:n]
        return out.reshape(n, n_dim, n_params)

    def fwd(params, x):
        return apply(params, x), (params, x)

    def bwd(res, g):
        params, x = res
        _, vjp = jax.vjp(
            lambda p, xx: _apply_made_xla(p, masks, xx, n_dim, n_params),
            params, x)
        return vjp(g)

    apply.defvjp(fwd, bwd)
    return apply
