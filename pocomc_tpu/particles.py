"""Append-only particle history ("persistent sampling" memory).

Host-side store in float64 numpy: the history is tiny (T iterations x
n_active particles) and the multiple-importance-sampling evidence math
(compute_logw_and_logz) benefits from f64 accumulation, so it stays off
the accelerator. Device compute (MCMC sweeps, flow training) receives
only the current working set.

Parity: reference /root/reference/pocomc/particles.py:69-301. The stored
keys and semantics are identical; `compute_logw_and_logz` matches
particles.py:215-231 via pocomc_tpu.ops.weights.compute_logw_and_logz.
"""

from __future__ import annotations

import numpy as np

from .ops.weights import compute_logw_and_logz as _logw_logz

_KEYS = ("u", "x", "logdetj", "logl", "logp", "logw", "blobs", "iter",
         "logz", "calls", "steps", "efficiency", "ess", "accept", "beta",
         "resid", "hot")


class Particles:
    """Per-iteration history of particles and scalar diagnostics."""

    def __init__(self, n_particles, n_dim):
        self.n_particles = n_particles
        self.n_dim = n_dim
        self.past = {key: [] for key in _KEYS}
        self.results_dict = None

    def update(self, data):
        for key, value in data.items():
            if key in self.past:
                self.past[key].append(value)

    def pop(self, key):
        """Drop the newest stored value of ONE key (reference parity:
        particles.py:150-164, which likewise discards the value). The
        caller is responsible for popping every per-iteration key it
        wants rolled back — popping a single key leaves the other
        columns one entry longer."""
        self.past[key].pop()

    def get(self, key, index=None, flat=False):
        if index is None:
            if flat:
                return np.concatenate(self.past[key])
            return np.asarray(self.past[key])
        return self.past[key][index]

    @property
    def t(self):
        return len(self.past["beta"])

    def compute_logw_and_logz(self, beta_final=1.0, normalize=True):
        """Reweight the FULL history to temperature beta_final (see
        ops.weights.compute_logw_and_logz for the estimator)."""
        logl = np.stack([np.asarray(v, dtype=np.float64) for v in self.past["logl"]])
        beta = np.asarray(self.past["beta"], dtype=np.float64)
        logz = np.asarray(self.past["logz"], dtype=np.float64)
        return _logw_logz(logl, beta, logz, beta_final, normalize=normalize)

    def compute_results(self):
        if self.results_dict is None:
            self.results_dict = {key: self.get(key) for key in self.past}
            logw, _ = self.compute_logw_and_logz(1.0)
            self.results_dict["logw"] = logw
        return self.results_dict
