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
