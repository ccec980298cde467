"""MPIPool task-farm logic tested against a fake in-process MPI comm
(mpi4py is not installed here; the reference never tests this path at
all — SURVEY.md §4)."""

import sys
import types

import numpy as np
import pytest


class FakeStatus:
    def __init__(self):
        self.source = None
        self.tag = None


class FakeComm:
    """Single-process stand-in: 'workers' execute tasks synchronously when
    the master sends, and recv drains completed results."""

    def __init__(self, size=4):
        self.size = size
        self._results = []  # (worker, tag, result)
        self.closed = []

    def Get_rank(self):
        return 0  # always master in-process

    def Get_size(self):
        return self.size

    def send(self, obj, dest=None, tag=0):
        if obj is None:
            self.closed.append(dest)
            return
        func, arg = obj
        self._results.append((dest, tag, func(arg)))

    def ssend(self, obj, dest, tag):  # pragma: no cover - worker side
        raise AssertionError("worker path must not run in-process")

    def Iprobe(self, source=None, tag=None):
        return bool(self._results)

    def recv(self, source=None, tag=None, status=None):
        worker, t, result = self._results.pop(0)
        if status is not None:
            status.source = worker
            status.tag = t
        return result


@pytest.fixture()
def pool(monkeypatch):
    """Build an MPIPool against the fake comm by stubbing mpi4py."""
    fake_mpi = types.SimpleNamespace(
        COMM_WORLD=FakeComm(),
        ANY_SOURCE=-1, ANY_TAG=-1, Status=FakeStatus,
        pickle=types.SimpleNamespace(__init__=lambda *a, **k: None),
    )
    monkeypatch.setitem(sys.modules, "mpi4py",
                        types.SimpleNamespace(MPI=fake_mpi))
    from pocomc_tpu.parallel.pool import MPIPool
    return MPIPool(comm=FakeComm(size=4))


def test_map_preserves_order(pool):
    xs = list(range(17))
    out = pool.map(lambda v: v * v, xs)
    assert out == [v * v for v in xs]


def test_map_nontrivial_payloads(pool):
    xs = [np.arange(3) + i for i in range(5)]
    out = pool.map(lambda a: float(a.sum()), xs)
    assert out == [float(a.sum()) for a in xs]


def test_close_sends_poison_pills(pool):
    pool.map(lambda v: v, [1, 2, 3])
    pool.close()
    assert sorted(pool.comm.closed) == sorted(pool.workers)


def test_context_manager(pool):
    with pool as p:
        assert p.map(lambda v: v + 1, [0, 1]) == [1, 2]
    assert len(pool.comm.closed) == len(pool.workers)


def test_close_idempotent(pool):
    pool.close()
    pool.close()  # second close must not re-send poison pills
    assert sorted(pool.comm.closed) == sorted(pool.workers)


def test_atexit_safety_net(pool):
    """A master that never calls close() still poisons the workers at
    interpreter exit (reference parallel.py:54)."""
    import atexit
    # the pool registered its close at construction; firing the atexit
    # callback directly stands in for interpreter shutdown
    pool_close_registered = pool._closed is False
    assert pool_close_registered
    atexit.unregister(pool.close)  # avoid double-fire after the test
    pool.close()
    assert sorted(pool.comm.closed) == sorted(pool.workers)


def test_map_blocks_without_iprobe(pool):
    """The master loop must not require Iprobe (no busy-wait): a comm
    without Iprobe at all still completes map()."""
    del FakeComm.Iprobe
    try:
        xs = list(range(9))
        assert pool.map(lambda v: v + 2, xs) == [v + 2 for v in xs]
    finally:
        FakeComm.Iprobe = lambda self, source=None, tag=None: bool(
            self._results)


def test_single_process_comm_rejected(monkeypatch):
    fake_mpi = types.SimpleNamespace(
        COMM_WORLD=FakeComm(size=1),
        ANY_SOURCE=-1, ANY_TAG=-1, Status=FakeStatus,
        pickle=types.SimpleNamespace(__init__=lambda *a, **k: None),
    )
    monkeypatch.setitem(sys.modules, "mpi4py",
                        types.SimpleNamespace(MPI=fake_mpi))
    from pocomc_tpu.parallel.pool import MPIPool
    with pytest.raises(ValueError):
        MPIPool(comm=FakeComm(size=1))
