"""Double-buffered host→device transfer for the train loop.

The reference keeps host→device transfer implicit in torch's CUDA streams
(src/train.py train loop); on TPU the equivalent overlap is: stage + enqueue
`jax.device_put` of batch i+1 in a background thread while the device
computes on batch i. The jit step then finds its inputs already committed,
so the step stream never stalls on PCIe/host staging.

Usage:
    for images, labels, weight in device_feed(loader, sharding):
        state, metrics = train_step(state, images, labels)
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _stage(batch, sharding) -> Tuple[Any, Any, np.ndarray]:
    arr = batch.images if batch.images.dtype == np.uint8 else \
        np.asarray(batch.images, np.float32)
    images = jax.device_put(jnp.asarray(arr), sharding)
    labels = jax.device_put(jnp.asarray(batch.labels), sharding)
    return images, labels, batch.weight


def device_feed(loader: Iterable, sharding=None, depth: int = 2
                ) -> Iterator[Tuple[Any, Any, np.ndarray]]:
    """Iterate `loader`, yielding (images, labels, weight) already on device.

    A background thread runs `device_put` up to `depth` batches ahead;
    `device_put` is asynchronous, so the actual DMA overlaps both the
    staging of later batches and the device compute of earlier ones.
    With depth<=0 behaves like inline device_put (no thread)."""
    if depth <= 0:
        for batch in loader:
            yield _stage(batch, sharding)
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that also watches the shutdown flag, so an abandoned
        # consumer (break / exception in the train loop) doesn't leave the
        # worker blocked forever with `depth` device batches pinned
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in loader:
                if not _put(_stage(batch, sharding)):
                    return
        except BaseException as e:
            err.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True,
                         name="vitax-device-feed")
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # generator close / consumer exception: release the worker and drain
        stop.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
