"""Device prefetch: overlap host batch assembly + H2D transfer with compute.

The training step consumes device-resident batches; without prefetch the
chip idles while the host assembles the next batch and pushes it over
the host→device link (measured on the tunneled dev chip: 32 ms assembly
+ 169 ms transfer vs a 122 ms step — the chip was idle ~60% of wall
time; on production PCIe hosts the transfer is cheap but the overlap is
still free throughput).

`DevicePrefetcher` wraps any batch iterator (`BatchIterator`,
`OnlineMixIterator`, `NativeBatchIterator`) with a background thread
that stays `depth` batches ahead, calling `jax.device_put` (optionally
with a `Sharding`) off the critical path.

Checkpoint/resume correctness: the wrapped iterator's `state` is
snapshotted right after each batch is drawn (i.e. it points at the NEXT
undrawn batch) and travels with that batch; `state`
returns the snapshot of the most recently CONSUMED batch, so saving it
and later `load_state`-ing the inner iterator replays the stream exactly
from the first unconsumed batch — prefetched-but-unconsumed batches are
not lost (the reference's DataLoader has no resume at all; this keeps
the deterministic mid-epoch resume of `data/dataset.py::IteratorState`).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np


class DevicePrefetcher:
    """Iterator adapter: background thread assembling + placing batches.

    `place` defaults to `jax.device_put` (import deferred so pure-host
    pipelines can use the prefetcher without jax); pass
    `place=lambda b: jax.device_put(b, sharding)` for sharded placement.
    """

    def __init__(
        self,
        it: Iterator[Dict[str, np.ndarray]],
        depth: int = 2,
        place: Optional[Callable[[Dict[str, np.ndarray]], Any]] = None,
    ):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self._it = it
        if place is None:
            import jax

            place = jax.device_put
        self._place = place
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._consumed_state = getattr(it, "state", None)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self):
        try:
            while not self._stop.is_set():
                try:
                    batch = next(self._it)
                except StopIteration:
                    self._q.put(("stop", None, None))
                    return
                # post-draw snapshot: restoring it replays the stream from
                # the batch AFTER this one — i.e. resume-after-consume
                state = getattr(self._it, "state", None)
                placed = self._place(batch)
                # block while the queue is full — bounded readahead
                while not self._stop.is_set():
                    try:
                        self._q.put(("batch", placed, state), timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surface producer crashes to the consumer
            self._q.put(("error", e, None))

    def __iter__(self):
        return self

    def __next__(self):
        kind, payload, state = self._q.get()
        if kind == "stop":
            raise StopIteration
        if kind == "error":
            raise payload
        self._consumed_state = state
        return payload

    @property
    def state(self):
        """Inner-iterator state as of the last CONSUMED batch (for
        checkpointing; see module docstring)."""
        return self._consumed_state

    def close(self):
        self._stop.set()
        # drain so a blocked producer can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
