"""DevicePrefetcher: stream identity, resume semantics, error propagation."""

import numpy as np
import pytest

from voicesplit_tpu.data.dataset import IteratorState
from voicesplit_tpu.data.prefetch import DevicePrefetcher


class FakeIterator:
    """Deterministic stateful batch source with the IteratorState API."""

    def __init__(self, n=10, seed=0):
        self.n = n
        self._state = IteratorState(seed=seed)

    @property
    def state(self):
        return IteratorState(**self._state.to_dict())

    def load_state(self, state):
        self._state = IteratorState(**state.to_dict())

    def __iter__(self):
        return self

    def __next__(self):
        if self._state.position >= self.n:
            raise StopIteration
        k = self._state.position
        self._state.position += 1
        rng = np.random.default_rng((self._state.seed, k))
        return {"x": rng.standard_normal(4).astype(np.float32), "i": np.int32(k)}


def collect(it, n):
    return [next(it) for _ in range(n)]


def test_stream_identical_to_unwrapped():
    plain = collect(FakeIterator(), 10)
    with DevicePrefetcher(FakeIterator(), depth=3, place=lambda b: b) as pf:
        fetched = collect(pf, 10)
    for a, b in zip(plain, fetched):
        np.testing.assert_array_equal(a["x"], b["x"])
        assert a["i"] == b["i"]


def test_stop_iteration_propagates():
    with DevicePrefetcher(FakeIterator(n=3), depth=2, place=lambda b: b) as pf:
        assert len(collect(pf, 3)) == 3
        with pytest.raises(StopIteration):
            next(pf)


def test_resume_from_consumed_state():
    src = FakeIterator(n=10)
    with DevicePrefetcher(src, depth=4, place=lambda b: b) as pf:
        seen = collect(pf, 4)
        # producer has read ahead past position 4, but state reflects
        # only what was consumed
        ckpt = pf.state
    assert seen[-1]["i"] == 3
    assert ckpt.position == 4

    fresh = FakeIterator(n=10)
    fresh.load_state(ckpt)
    nxt = next(fresh)
    assert nxt["i"] == 4  # first unconsumed batch


def test_producer_error_surfaces():
    class Boom(FakeIterator):
        def __next__(self):
            if self._state.position == 2:
                raise RuntimeError("bad wav")
            return super().__next__()

    with DevicePrefetcher(Boom(), depth=2, place=lambda b: b) as pf:
        collect(pf, 2)
        with pytest.raises(RuntimeError, match="bad wav"):
            next(pf)


def test_place_called_in_background():
    calls = []
    with DevicePrefetcher(
        FakeIterator(n=4), depth=2, place=lambda b: (calls.append(1), b)[1]
    ) as pf:
        collect(pf, 4)
    assert len(calls) == 4


def test_device_put_default(rng):
    # default place = jax.device_put (CPU backend under conftest)
    with DevicePrefetcher(FakeIterator(n=2), depth=1) as pf:
        b = next(pf)
    import jax

    assert isinstance(b["x"], jax.Array)
