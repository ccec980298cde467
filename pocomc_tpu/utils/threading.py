"""Thread configuration (reference parity: /root/reference/pocomc/
threading.py:3-21, which caps torch's intra-op threads so flow training
does not fight the likelihood pool for cores).

There is no torch here — XLA manages its own thread pools — so this is a
compatibility shim: it optionally caps the host-side thread pools that
matter in this stack (numpy/BLAS via environment, set before import)."""

from __future__ import annotations

import os


def configure_threads(pytorch_threads=None, blas_threads=None):
    """Best-effort host thread capping.

    `pytorch_threads` is accepted for reference API compatibility and
    ignored (no torch in the stack). `blas_threads` sets OMP/MKL thread
    env vars if they are not already set; this only has an effect when
    called before numpy/scipy initialize their thread pools.
    """
    if blas_threads is not None:
        for var in ("OMP_NUM_THREADS", "MKL_NUM_THREADS",
                    "OPENBLAS_NUM_THREADS"):
            os.environ.setdefault(var, str(int(blas_threads)))
