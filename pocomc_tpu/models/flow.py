"""Normalizing flows: masked-autoregressive MAF / NSF stacks + trainer.

This is the TPU-native replacement for the reference's torch/zuko flows
(/root/reference/pocomc/flow.py:13-384). Same capacity and architecture
menu ('maf3'|'maf6'|'maf12'|'nsf3'|'nsf6'|'nsf12'; flow.py:54-86): T
masked-autoregressive transforms with alternating variable order, each a
3-hidden-layer residual MADE with n_hidden = max(next_pow2(3*d), 32),
standard-normal base. NSF uses 8-bin rational-quadratic splines.

Directions (zuko convention, flow.py:99-132):
  forward : data -> latent, one MADE pass per transform (density direction)
  inverse : latent -> data, autoregressive -> a `lax.scan` over dimensions
            with one MADE pass per dim per transform

Training (`Flow.fit`) ports the semantics of flow.py:165-384: shuffled
optional validation split, AdamW, weighted NLL `sum(-logq * w * 1000) /
sum(w)` per batch, optional Laplace/Gaussian weight regularization,
grad-norm clipping, ReduceLROnPlateau-style annealing, best-state snapshot
and early stop after 1.5*patience stale epochs. The epoch is one jitted
`lax.scan` over batches; only the early-stopping decision syncs to host.
Variable train-set sizes are padded with zero-weight rows to keep shapes
static across SMC iterations.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .made import init_made, apply_made, apply_made_dim
from . import transforms as tr


def _next_pow2(n: int) -> int:
    return 1 if n <= 0 else 2 ** ((n - 1).bit_length())


_ARCHS = {
    "maf3": ("maf", 3), "maf6": ("maf", 6), "maf12": ("maf", 12),
    "nsf3": ("nsf", 3), "nsf6": ("nsf", 6), "nsf12": ("nsf", 12),
}


class Flow:
    """Masked-autoregressive normalizing flow with a trainer.

    Parameters are a pytree (`self.params`); all compute methods are
    functional in the params so the MCMC kernels can consume them as jit
    arguments without retracing.
    """

    def __init__(self, n_dim: int, flow: str = "nsf6", bins: int = 8,
                 seed: int = 0, use_pallas: bool | str = "auto"):
        if flow not in _ARCHS:
            raise ValueError(
                f"Invalid flow {flow!r}. Choose from {sorted(_ARCHS)}.")
        if use_pallas == "auto":
            # The fused Pallas MADE pass pays off once the hidden width
            # fills MXU tiles; below that the (8,128)-tile padding overhead
            # exceeds the fusion win (measured on v5e: nsf6/d=10 XLA
            # log_prob 0.76 ms vs Pallas 1.34 ms, but the reverse for
            # h>=128). Auto-enable on TPU for wide networks only.
            n_hidden_auto = max(_next_pow2(3 * n_dim), 32)
            use_pallas = (jax.default_backend() == "tpu"
                          and n_hidden_auto >= 128)
        self.use_pallas = bool(use_pallas)
        self.n_dim = int(n_dim)
        self.kind, self.n_transforms = _ARCHS[flow]
        self.bins = int(bins)
        self.n_hidden = max(_next_pow2(3 * self.n_dim), 32)
        self.hidden_sizes = [self.n_hidden] * 3
        self.n_params = (tr.AFFINE_N_PARAMS if self.kind == "maf"
                         else tr.rqs_n_params(self.bins))

        # Alternating autoregressive orders (zuko MAF behavior).
        self.orders = []
        base = np.arange(self.n_dim)
        for t in range(self.n_transforms):
            self.orders.append(base if t % 2 == 0 else base[::-1].copy())

        key = jax.random.key(seed)
        keys = jax.random.split(key, self.n_transforms)
        self.params = []
        self.masks = []
        for t in range(self.n_transforms):
            p, m = init_made(keys[t], self.n_dim, self.hidden_sizes,
                             self.n_params, self.orders[t])
            self.params.append(p)
            self.masks.append(m)

        # inverse scan processes dims in increasing autoregressive degree:
        # position k updates dim argsort(order)[k]
        self._inv_dim_order = [np.argsort(o).astype(np.int32) for o in self.orders]

        self._build_fns()

    # -- functional core -----------------------------------------------------

    def _elem_fwd(self, x, p):
        if self.kind == "maf":
            return tr.affine_forward(x, p)
        return tr.rqs_forward(x, p, self.bins)

    def _elem_inv(self, z, p):
        if self.kind == "maf":
            return tr.affine_inverse(z, p)
        return tr.rqs_inverse(z, p, self.bins)

    def _build_fns(self):
        n_dim, n_params = self.n_dim, self.n_params
        masks = self.masks
        inv_orders = [jnp.asarray(o) for o in self._inv_dim_order]

        if self.use_pallas:
            from ..ops.pallas_kernels import make_made_apply
            interpret = jax.default_backend() != "tpu"
            applies = [make_made_apply(m, n_dim, n_params, interpret=interpret)
                       for m in masks]

            def made_pass(t, tp, x):
                return applies[t](tp, x)
        else:
            def made_pass(t, tp, x):
                return apply_made(tp, masks[t], x, n_dim, n_params)

        def transform_forward(t, tp, x):
            p = made_pass(t, tp, x)
            return self._elem_fwd(x, p)  # (n, d), (n, d)

        def transform_inverse(t, tp, z, dim_order):
            """Sequential inverse: scan over dims in degree order. Each
            step computes only the current dim's parameter block
            (apply_made_dim) and accumulates the ladj in the carry —
            no extra full pass at the end."""

            def body(carry, dim):
                x, ladj = carry
                p_dim = apply_made_dim(tp, masks[t], x, dim, n_params)
                z_dim = jnp.take(z, dim, axis=1)         # (n,)
                x_dim, l = self._elem_inv(z_dim, p_dim)
                x = x.at[:, dim].set(x_dim)
                return (x, ladj + l), None

            x0 = jnp.zeros_like(z)
            ladj0 = jnp.zeros(z.shape[0], z.dtype)
            (x, ladj), _ = jax.lax.scan(body, (x0, ladj0), dim_order)
            return x, ladj

        def forward(params, x):
            """data -> latent; returns (z, sum ladj log|dz/dx|)."""
            ladj = jnp.zeros(x.shape[0], x.dtype)
            for t in range(self.n_transforms):
                x, l = transform_forward(t, params[t], x)
                ladj = ladj + jnp.sum(l, axis=-1)
            return x, ladj

        def inverse(params, z):
            """latent -> data; returns (x, sum ladj log|dx/dz|)."""
            ladj = jnp.zeros(z.shape[0], z.dtype)
            for t in reversed(range(self.n_transforms)):
                z, l = transform_inverse(t, params[t], z, inv_orders[t])
                ladj = ladj + l
            return z, ladj

        def log_prob(params, x):
            z, ladj = forward(params, x)
            base = -0.5 * jnp.sum(z * z, axis=-1) - 0.5 * n_dim * math.log(2 * math.pi)
            return base + ladj

        def sample(params, key, size):
            z = jax.random.normal(key, (size, n_dim))
            x, ladj = inverse(params, z)
            base = -0.5 * jnp.sum(z * z, axis=-1) - 0.5 * n_dim * math.log(2 * math.pi)
            return x, base - ladj

        self._forward = forward
        self._inverse = inverse
        self._log_prob = log_prob
        self._sample = sample
        self._forward_jit = jax.jit(forward)
        self._inverse_jit = jax.jit(inverse)
        self._log_prob_jit = jax.jit(log_prob)
        self._sample_jit = jax.jit(sample, static_argnames=("size",))

        # Kernel-facing contract (mirrors reference tools.py:318-349
        # flow_numpy_wrapper): both directions report log|det du/dtheta|.
        def kernel_fwd(params, u):
            theta, ladj = forward(params, u)
            return theta, -ladj

        def kernel_inv(params, theta):
            u, ladj = inverse(params, theta)
            return u, ladj

        self.kernel_fwd = kernel_fwd
        self.kernel_inv = kernel_inv

    # -- public compute API ----------------------------------------------

    def forward(self, x):
        """data -> (latent, log|det dz/dx|)."""
        return self._forward_jit(self.params, jnp.asarray(x))

    def inverse(self, z):
        """latent -> (data, log|det dx/dz|)."""
        return self._inverse_jit(self.params, jnp.asarray(z))

    def log_prob(self, x):
        return self._log_prob_jit(self.params, jnp.asarray(x))

    def sample(self, size=1, key=None):
        if key is None:
            key = jax.random.key(np.random.default_rng().integers(2**31 - 1))
        return self._sample_jit(self.params, key, size)

    # -- training ----------------------------------------------------------

    def _loss_fn(self, params, xb, wb, laplace_scale, gaussian_scale):
        logq = self._log_prob(params, xb)
        loss = jnp.sum(-logq * wb * 1000.0) / jnp.maximum(jnp.sum(wb), 1e-30)
        if laplace_scale is not None or gaussian_scale is not None:
            reg = 0.0
            for tp in params:
                for layer in tp:
                    if laplace_scale is not None:
                        reg += jnp.sum(jnp.abs(layer["w"])) / laplace_scale
                    if gaussian_scale is not None:
                        reg += jnp.sum(layer["w"] ** 2) / (2.0 * gaussian_scale**2)
            loss = loss + reg
        return loss

    def fit(self, x, weights=None, validation_split=0.0, epochs=1000,
            batch_size=1000, patience=20, learning_rate=1e-3,
            weight_decay=0.0, laplace_scale=None, gaussian_scale=None,
            annealing=True, noise=None, shuffle=True, clip_grad_norm=1.0,
            verbose=0, seed=None, mesh=None):
        """Weighted maximum-likelihood training. See module docstring."""
        x = jnp.asarray(x, dtype=jnp.float32)
        n_samples = x.shape[0]
        if weights is None:
            w_all = jnp.full((n_samples,), 1.0 / n_samples, dtype=jnp.float32)
        else:
            w_all = jnp.asarray(weights, dtype=jnp.float32)

        rng = np.random.default_rng(seed)
        if shuffle:
            perm = rng.permutation(n_samples)
            x = x[perm]
            w_all = w_all[perm]

        if noise is not None:
            # mean nearest-neighbor distance, vectorized (reference
            # flow.py:240-245 is an O(n^2) python loop; same O(n^2) math
            # but one fused program)
            d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
            d2 = jnp.where(d2 <= 0.0, jnp.inf, d2)
            noise_scale = float(noise) * float(jnp.mean(jnp.sqrt(jnp.min(d2, axis=1))))
        else:
            noise_scale = 0.0

        validation = validation_split > 0.0
        if validation:
            n_train = int(validation_split * n_samples)
            x_train, w_train = x[:n_train], w_all[:n_train]
            x_val, w_val = x[n_train:], w_all[n_train:]
        else:
            x_train, w_train = x, w_all
            x_val = w_val = None

        batch_size = max(1, min(int(batch_size), x_train.shape[0]))
        n_batches = -(-x_train.shape[0] // batch_size)
        n_pad = n_batches * batch_size - x_train.shape[0]
        if n_pad > 0:
            reps = -(-n_pad // x_train.shape[0])
            pad_x = jnp.tile(x_train, (reps, 1))[:n_pad]
            x_train = jnp.concatenate([x_train, pad_x], axis=0)
            w_train = jnp.concatenate([w_train, jnp.zeros(n_pad, w_train.dtype)], axis=0)
        n_train_total = x_train.shape[0]

        if mesh is not None and n_train_total % mesh.size == 0:
            # data-parallel training: samples sharded over the particle
            # mesh; parameter grads all-reduce automatically under jit
            x_train = mesh.shard_particles(x_train)
            w_train = mesh.shard_particles(w_train)
            params = mesh.replicate(self.params)
        else:
            params = self.params

        tx = optax.inject_hyperparams(
            lambda lr: optax.chain(
                optax.clip_by_global_norm(clip_grad_norm),
                optax.adamw(lr, weight_decay=weight_decay),
            )
        )(lr=learning_rate)
        opt_state = tx.init(params)

        loss_fn = partial(self._loss_fn, laplace_scale=laplace_scale,
                          gaussian_scale=gaussian_scale)

        @jax.jit
        def train_epoch(params, opt_state, xd, wd, order, key):
            xb = xd[order].reshape(n_batches, batch_size, self.n_dim)
            wb = wd[order].reshape(n_batches, batch_size)

            def step(carry, batch):
                params, opt_state, key = carry
                xi, wi = batch
                if noise is not None:
                    key, sub = jax.random.split(key)
                    xi = xi + noise_scale * jax.random.normal(sub, xi.shape)
                loss, grads = jax.value_and_grad(loss_fn)(params, xi, wi)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, key), loss

            (params, opt_state, key), losses = jax.lax.scan(
                step, (params, opt_state, key), (xb, wb))
            return params, opt_state, jnp.sum(losses) / n_train_total

        @jax.jit
        def eval_loss(params, xd, wd):
            return loss_fn(params, xd, wd) / xd.shape[0]

        history = {"loss": [], "val_loss": []}
        monitor = "val_loss" if validation else "loss"
        best_loss = np.inf
        best_epoch = 0
        best_params = params
        key = jax.random.key(int(rng.integers(2**31 - 1)))
        lr = learning_rate
        plateau = _PlateauLR(lr, factor=0.2, patience=patience,
                             threshold=1e-4, min_lr=1e-6)

        for epoch in range(epochs):
            key, k_perm, k_noise = jax.random.split(key, 3)
            order = (jax.random.permutation(k_perm, n_train_total)
                     if shuffle else jnp.arange(n_train_total))
            params, opt_state, train_loss = train_epoch(
                params, opt_state, x_train, w_train, order, k_noise)
            train_loss = float(train_loss)
            history["loss"].append(train_loss)

            if validation:
                val_loss = float(eval_loss(params, x_val, w_val))
                history["val_loss"].append(val_loss)
                current = val_loss
            else:
                current = train_loss

            if annealing:
                new_lr = plateau.step(current)
                if new_lr != lr:
                    lr = new_lr
                    opt_state.hyperparams["lr"] = jnp.asarray(lr)

            if current < best_loss:
                best_loss = current
                best_epoch = epoch
                best_params = params

            if verbose > 1:
                print(f"Epoch {epoch + 1}/{epochs}, loss {train_loss:.3f}"
                      + (f", val {val_loss:.3f}" if validation else ""))

            if epoch - best_epoch >= int(1.5 * patience):
                params = best_params
                if verbose > 0:
                    print(f"Finished early after {best_epoch} epochs; "
                          f"best {monitor} {best_loss:.3f}")
                break

        self.params = best_params if best_loss < np.inf else params
        return history


class _PlateauLR:
    """ReduceLROnPlateau: factor decay after `patience` stale epochs
    (absolute threshold), floored at min_lr. Mirrors the torch scheduler
    configured at reference flow.py:274-281."""

    def __init__(self, lr, factor=0.2, patience=20, threshold=1e-4, min_lr=1e-6):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = np.inf
        self.stale = 0

    def step(self, value):
        if value < self.best - self.threshold:
            self.best = value
            self.stale = 0
        else:
            self.stale += 1
            if self.stale > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.stale = 0
        return self.lr
