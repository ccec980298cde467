"""Test configuration: run the suite on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware (the driver separately
dry-runs multi-chip compilation; see __graft_entry__.py).

Note: this environment pins JAX_PLATFORMS=axon (remote TPU tunnel); the
env var route is overridden at interpreter startup, so the platform must
be forced through jax.config before any backend initialization.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
