"""Device-mesh parallelism: particles sharded over TPU chips.

TPU-native replacement for the reference's process/MPI likelihood fan-out
(/root/reference/pocomc/parallel.py:20-178, sampler.py:267-274): instead
of shipping scalar likelihood calls to worker processes, the particle axis
is sharded over a 1-D `jax.sharding.Mesh` and every jitted program (MCMC
sweeps, flow training, geometry fits) runs SPMD — XLA inserts the
collectives (psum for the acceptance/plateau means and weighted moments,
all-gathers for resampling) over ICI.

The SMC algorithm's only cross-particle couplings are reductions
(SURVEY.md section 5.7), so a pure data-parallel layout is optimal: zero
resharding inside the sweep, one all-reduce per MCMC step for the
adaptation statistics.

Multi-host: call `jax.distributed.initialize()` before constructing the
mesh and pass `jax.devices()`; black-box host likelihoods still work via
`pure_callback`, which runs per-host on its local shard.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ParticleMesh:
    """1-D mesh over which particle-major arrays are sharded.

    Parameters
    ----------
    devices : list of jax devices or None
        Defaults to all visible devices.
    """

    def __init__(self, devices=None):
        if devices is None:
            devices = jax.devices()
        self.devices = list(devices)
        self.mesh = Mesh(np.array(self.devices), ("particles",))
        self.particle_spec = P("particles")
        self.particle_sharding = NamedSharding(self.mesh, self.particle_spec)
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def size(self):
        return len(self.devices)

    def shard_particles(self, arr):
        """Place a particle-major array (first axis = particles) sharded."""
        return jax.device_put(arr, self.particle_sharding)

    def shard_batches(self, arr):
        """Place a (n_batches, batch, ...) training stack with the batch
        axis sharded."""
        spec = P(None, "particles")
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def replicate(self, tree):
        """Replicate a pytree (flow params, geometry) on every device."""
        return jax.device_put(tree, self.replicated)

    def pad_to_multiple(self, n: int) -> int:
        """Smallest multiple of the mesh size >= n."""
        k = self.size
        return ((n + k - 1) // k) * k
