"""Whitening pre-transform (models/flow.py identity_pre/fit_pre_*).

The flow fits its autoregressive stack in a weighted-full-covariance
whitened space refit at every `fit` — the capability the reference lacks
(its scaler whitens once, on prior samples, diagonally by default:
/root/reference/pocomc/sampler.py:438-440) and the root cause of the
50-D rotated/ill-conditioned evidence pathology in RESULTS.md.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pocomc_tpu.models.flow import (Flow, identity_pre, fit_pre_numpy,
                                    fit_pre_jax)


def make_rotated_gaussian(d=6, n=4096, cond_log10=1.5, seed=0):
    rng = np.random.default_rng(seed)
    frame = np.linalg.qr(rng.standard_normal((d, d)))[0]
    scales = np.logspace(0, cond_log10, d)
    x = rng.standard_normal((n, d)) @ np.diag(scales) @ frame.T
    # analytic differential entropy = optimal achievable mean NLL
    nll_opt = 0.5 * d * np.log(2 * np.pi) + np.sum(np.log(scales)) + 0.5 * d
    return x.astype(np.float32), float(nll_opt)


def test_fit_pre_numpy_whitens():
    x, _ = make_rotated_gaussian()
    w = np.full(x.shape[0], 1.0 / x.shape[0], np.float32)
    pre = fit_pre_numpy(x, w, identity_pre(x.shape[1]))
    y = (x - pre["mean"]) @ pre["w_fwd"]
    cov = np.cov(y.T)
    np.testing.assert_allclose(cov, np.eye(x.shape[1]), atol=0.06)
    # ladj = -log det L = -0.5 log det cov
    sign, logdet = np.linalg.slogdet(np.cov(x.T))
    assert sign > 0
    np.testing.assert_allclose(float(pre["ladj"]), -0.5 * logdet, atol=0.05)
    # round trip through w_inv
    x_r = y @ pre["w_inv"] + pre["mean"]
    np.testing.assert_allclose(x_r, x, atol=1e-3)


def test_fit_pre_jax_matches_numpy():
    x, _ = make_rotated_gaussian(d=5, n=2048, seed=3)
    w = np.random.default_rng(4).uniform(0.1, 1.0, x.shape[0]).astype(np.float32)
    pre_np = fit_pre_numpy(x, w, identity_pre(5))
    pre_j = jax.jit(fit_pre_jax)(jnp.asarray(x), jnp.asarray(w))
    for k in ("mean", "w_fwd", "w_inv", "ladj"):
        np.testing.assert_allclose(np.asarray(pre_j[k]), pre_np[k],
                                   rtol=2e-3, atol=2e-3)


def test_fit_pre_degenerate_falls_back():
    prev = identity_pre(3)
    # fewer samples than dims -> keep previous
    x = np.zeros((2, 3), np.float32)
    w = np.ones(2, np.float32)
    assert fit_pre_numpy(x, w, prev) is prev
    # zero weights -> keep previous
    x = np.random.default_rng(0).standard_normal((64, 3)).astype(np.float32)
    assert fit_pre_numpy(x, np.zeros(64, np.float32), prev) is prev
    # jax variant: constant data -> regularized cov stays PD, stays finite
    pre = jax.jit(fit_pre_jax)(jnp.zeros((64, 3)), jnp.ones(64) / 64)
    assert all(bool(jnp.all(jnp.isfinite(pre[k]))) for k in pre)


@pytest.mark.parametrize("arch", ["maf3", "nsf3", "nsfc3"])
def test_whitened_flow_bijection_invariants(arch):
    x, _ = make_rotated_gaussian(d=4, n=1024, seed=1)
    flow = Flow(4, arch, seed=2, whiten=True)
    flow.fit(x, epochs=60, patience=10, annealing=False, seed=5)
    # pre must be non-identity after a whitening fit
    assert not np.allclose(np.asarray(flow.params["pre"]["w_fwd"]), np.eye(4))
    z, ladj = flow.forward(x[:128])
    x_r, ladj_inv = flow.inverse(z)
    np.testing.assert_allclose(np.asarray(x_r), x[:128], atol=5e-3)
    np.testing.assert_allclose(np.asarray(ladj), -np.asarray(ladj_inv),
                               atol=1e-3)
    # sampling logq consistent with log_prob under a non-identity pre
    xs, logq = flow.sample(256, key=jax.random.key(9))
    np.testing.assert_allclose(np.asarray(flow.log_prob(xs)),
                               np.asarray(logq), atol=1e-3)


def test_whitening_recovers_rotated_gaussian_nll():
    """On a rotated ill-conditioned Gaussian the whitened fit must reach
    the analytic entropy; the unwhitened fit measurably cannot."""
    x, nll_opt = make_rotated_gaussian(d=6, n=4096, cond_log10=1.5, seed=0)
    nlls = {}
    for whiten in (False, True):
        flow = Flow(6, "maf3", seed=0, whiten=whiten)
        flow.fit(x, epochs=300, patience=30, annealing=False,
                 validation_split=0.2, seed=1)
        nlls[whiten] = float(-np.mean(np.asarray(flow.log_prob(x[:2048]))))
    assert nlls[True] < nll_opt + 0.1, (nlls, nll_opt)
    assert nlls[True] < nlls[False] - 0.1, nlls


def test_device_train_program_whitens():
    """fused.make_train_program refits pre in-program and returns the
    composed params."""
    from pocomc_tpu.parallel import fused

    x, nll_opt = make_rotated_gaussian(d=4, n=512, cond_log10=1.0, seed=2)
    w = np.full(512, 1.0 / 512, np.float32)
    flow = Flow(4, "maf3", seed=1, whiten=True)
    train = fused.make_train_program(flow, n_select=512, batch_size=256,
                                     validation_split=0.5, epochs=150,
                                     patience=15)
    params, geom, stats = train(flow.params, jnp.asarray(x), jnp.asarray(w),
                                np.uint32(7))
    assert not np.allclose(np.asarray(params["pre"]["w_fwd"]), np.eye(4))
    nll = float(-np.mean(np.asarray(
        jax.jit(flow._log_prob)(params, jnp.asarray(x)))))
    assert nll < nll_opt + 0.5, (nll, nll_opt)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in
               jax.tree_util.tree_leaves(geom))


def test_diag_whiten_scales_without_rotation():
    """'diag' mode: w_fwd is diagonal (no rotation), per-dim variances
    are normalized, and the jax/numpy fits agree."""
    x, _ = make_rotated_gaussian(d=5, n=2048, seed=7)
    w = np.full(x.shape[0], 1.0 / x.shape[0], np.float32)
    pre = fit_pre_numpy(x, w, identity_pre(5), mode="diag")
    assert np.count_nonzero(pre["w_fwd"] - np.diag(np.diag(pre["w_fwd"]))) == 0
    y = (x - pre["mean"]) @ pre["w_fwd"]
    np.testing.assert_allclose(y.var(axis=0), np.ones(5), rtol=0.05)
    pre_j = jax.jit(partial(fit_pre_jax, mode="diag"))(jnp.asarray(x),
                                                       jnp.asarray(w))
    for k in ("mean", "w_fwd", "ladj"):
        np.testing.assert_allclose(np.asarray(pre_j[k]), pre[k],
                                   rtol=2e-3, atol=2e-3)
    # end-to-end through a Flow
    flow = Flow(5, "maf3", seed=1, whiten="diag")
    flow.fit(x, epochs=40, patience=8, annealing=False, seed=3)
    wf = np.asarray(flow.params["pre"]["w_fwd"])
    assert np.count_nonzero(wf - np.diag(np.diag(wf))) == 0
    z, ladj = flow.forward(x[:64])
    x_r, ladj_inv = flow.inverse(z)
    np.testing.assert_allclose(np.asarray(x_r), x[:64], atol=5e-3)


def test_whiten_off_keeps_identity_pre():
    x, _ = make_rotated_gaussian(d=3, n=512, seed=5)
    flow = Flow(3, "maf3", seed=0, whiten=False)
    flow.fit(x, epochs=20, patience=5, annealing=False, seed=2)
    np.testing.assert_allclose(np.asarray(flow.params["pre"]["w_fwd"]),
                               np.eye(3))
    np.testing.assert_allclose(float(flow.params["pre"]["ladj"]), 0.0)


def test_pre_whitening_checkpoint_migrates():
    """State dicts saved before the {'pre','stack'} params split (bare
    transform-stack flow_params) must load and run, not TypeError on the
    first flow call."""
    import pocomc_tpu as pc

    def loglike(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    prior = pc.Prior([pc.Normal(0, 5) for _ in range(2)])
    s = pc.Sampler(prior, loglike, vectorize=True, random_state=0,
                   n_effective=128, n_active=64, flow="nsf3",
                   train_config={"epochs": 20, "patience": 4})
    s.run(n_total=256, n_evidence=0, progress=False)
    state = s.state_dict()
    # simulate an old checkpoint: strip the pre layer
    state["flow_params"] = state["flow_params"]["stack"]

    s2 = pc.Sampler(prior, loglike, vectorize=True, random_state=1,
                    n_effective=128, n_active=64, flow="nsf3",
                    train_config={"epochs": 20, "patience": 4})
    s2.load_state_dict(state)
    assert "pre" in s2.flow.params and "stack" in s2.flow.params
    z, ladj = s2.flow.forward(jnp.zeros((4, 2)))  # would TypeError before
    assert bool(jnp.all(jnp.isfinite(z)))
    s2.run(n_total=512, n_evidence=0, progress=False)  # resume continues


def test_invalid_whiten_raises():
    with pytest.raises(ValueError):
        Flow(3, "maf3", whiten="pca")
