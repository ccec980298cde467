"""Blobs: per-particle auxiliary data from the likelihood (reference
docs/source/blobs.ipynb behavior; sampler.py:807-861 blob extraction)."""

import numpy as np
import pytest

import pocomc_tpu as pc


def make_prior(d=2):
    return pc.Prior([pc.Normal(0, 5) for _ in range(d)])


def test_single_blob_run_and_posterior():
    def loglike(x):
        logl = float(-0.5 * np.sum(x**2) - np.log(2 * np.pi))
        chi2 = float(np.sum(x**2))
        return logl, chi2

    s = pc.Sampler(make_prior(), loglike, vectorize=False,
                   blobs_dtype=np.float64, random_state=0,
                   n_effective=128, n_active=64, precondition=False)
    s.run(n_total=256, n_evidence=0, progress=False)

    x, w, logl, logp, blobs = s.posterior(return_blobs=True)
    assert blobs.shape == (len(x),)
    # blob is a deterministic function of x: verify consistency
    np.testing.assert_allclose(np.asarray(blobs, dtype=np.float64),
                               np.sum(x**2, axis=1), rtol=1e-5)


def test_blob_inferred_without_dtype():
    def loglike(x):
        return float(-0.5 * np.sum(x**2)), int(x[0] > 0)

    s = pc.Sampler(make_prior(), loglike, vectorize=False,
                   random_state=0, n_effective=128, n_active=64,
                   precondition=False)
    s.run(n_total=256, n_evidence=0, progress=False)
    assert s.have_blobs
    x, w, logl, logp, blobs = s.posterior(return_blobs=True)
    assert len(blobs) == len(x)


def test_vectorize_with_blobs_raises():
    with pytest.raises(ValueError):
        pc.Sampler(make_prior(), lambda x: x, vectorize=True,
                   blobs_dtype=np.float64)


def test_posterior_blobs_without_blobs_raises():
    def loglike(x):
        return float(-0.5 * np.sum(x**2))

    s = pc.Sampler(make_prior(), loglike, vectorize=False, random_state=0,
                   n_effective=128, n_active=64, precondition=False)
    s.run(n_total=128, n_evidence=0, progress=False)
    with pytest.raises(ValueError):
        s.posterior(return_blobs=True)
