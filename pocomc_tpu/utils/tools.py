"""Small host-side utilities: progress bar and pickleable function wrapper.

Parity: reference /root/reference/pocomc/tools.py:189-260.
"""

from __future__ import annotations

from tqdm import tqdm


class ProgressBar:
    """tqdm wrapper with a persistent stats postfix."""

    def __init__(self, show: bool = True, initial: int = 0):
        self.progress_bar = tqdm(desc="Iter", disable=not show, initial=initial)
        self.info = dict()

    def update_stats(self, info):
        self.info = {**self.info, **info}
        self.progress_bar.set_postfix(ordered_dict=self.info)

    def update_iter(self):
        self.progress_bar.update(1)

    def close(self):
        self.progress_bar.close()


class FunctionWrapper:
    """Bind args/kwargs to a log-probability function, pickleably."""

    def __init__(self, f, args=None, kwargs=None):
        self.f = f
        self.args = [] if args is None else args
        self.kwargs = {} if kwargs is None else kwargs

    def __call__(self, x):
        return self.f(x, *self.args, **self.kwargs)


def enable_compile_cache(path=None):
    """Point XLA's persistent compilation cache at a durable directory.

    The framework's hot programs (adaptive sweep, flow training, fused
    SMC iteration) cost 2-4 minutes of XLA compilation on first use; the
    persistent cache turns every later process's local compile into a
    disk read (a cached big program traces in ~1 s and loads in ~0.4 s).
    Measured caveat (docs/tpu.md): remote-TPU (tunneled PJRT) backends
    additionally initialize each executable server-side on its FIRST
    execution (~60 s per big program on the v5e tunnel) — the cache
    cannot remove that part; on locally attached devices it removes
    cold start entirely.

    Called automatically by Sampler(compile_cache=True) (the default).
    Resolution order: explicit ``path`` argument, the
    ``POCOMC_COMPILE_CACHE`` environment variable (set to ``0``/``off``
    to disable), else ``~/.cache/pocomc_tpu/xla_cache``.  A cache dir
    already configured on jax.config (by the user or a driver script) is
    always respected and left untouched.

    Returns the cache directory in effect, or None when disabled.
    """
    import os
    import jax

    if path is None:
        path = os.environ.get("POCOMC_COMPILE_CACHE")
    if str(path).lower() in ("0", "off", "false", "no"):
        return None
    if path is None:
        # one cache dir per backend: artifacts written by a process on a
        # different backend (e.g. a remote-TPU plugin whose CPU client
        # carries different XLA feature flags) otherwise load with noisy
        # AOT feature-mismatch errors
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "pocomc_tpu",
                            f"xla_cache-{jax.default_backend()}")
    existing = getattr(jax.config, "jax_compilation_cache_dir", None)
    if existing:
        return existing
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except (OSError, RuntimeError):
        return None  # read-only FS or backend restriction: run uncached
    return str(path)
