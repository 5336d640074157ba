"""Host->device streaming input pipeline: the live-camera front-end.

The reference's live mode is a per-frame Python loop that re-uploads each
frame synchronously (flower_model.py:277-291, live_pose.py:22-41). On TPU the
transfer must overlap compute: `FrameFeeder` runs `jax.device_put` on a
background thread into a bounded queue (double-buffered by default), so batch
N+1 is in flight over PCIe/ICI while batch N computes. Frames travel in their
compact sensor dtypes (uint8 RGB, uint16 depth-mm) — 4x less wire traffic
than float32 — and are cast on device by the pipeline itself
(predict_frame already takes raw dtypes).

Works with a single device (device_put to it) or a Mesh (leading frame axis
sharded over the 'stream' axis — BASELINE.json config 5's multi-camera
scale-out).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax

from flope_tpu.parallel.mesh import stream_sharding

__all__ = ["FrameFeeder", "device_stream"]

_STOP = object()


class FrameFeeder:
    """Background-thread prefetching device feeder.

    source: an iterable of pytrees of host numpy arrays (one batch each).
    target: a jax.Device, a Sharding, or a Mesh (leading axis sharded over
    `axis`). depth: number of batches in flight (2 = double buffering).

    Iterate to receive device-resident batches in order. The feeder thread
    keeps at most `depth` transferred batches queued; `device_put` is async,
    so the actual overlap is managed by the runtime while the queue bounds
    host memory. Exceptions in the source propagate to the consumer.
    """

    def __init__(self, source: Iterable, target=None, depth: int = 2,
                 axis: str = "stream"):
        from jax.sharding import Mesh, Sharding

        if target is None:
            target = jax.devices()[0]
        if isinstance(target, Mesh):
            target = stream_sharding(target, axis)
        self._put: Callable = lambda tree: jax.tree.map(
            lambda x: jax.device_put(x, target), tree)
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._source = iter(source)
        self._err: BaseException | None = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for batch in self._source:
                if self._stop.is_set():
                    return
                self._q.put(self._put(batch))
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            self._q.put(_STOP)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is _STOP:
                if self._err is not None:
                    raise self._err
                return
            yield item

    def close(self):
        self._stop.set()
        # Drain so the producer can observe the stop flag if blocked on put.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)


def device_stream(source: Iterable, target=None, depth: int = 2,
                  axis: str = "stream") -> Iterator:
    """Convenience generator: yields device-resident batches with prefetch."""
    feeder = FrameFeeder(source, target=target, depth=depth, axis=axis)
    try:
        yield from feeder
    finally:
        feeder.close()
