"""Device prefetch: overlap host batch prep with device compute.

The reference overlaps via DataLoader worker processes
(train_multitask.py:414-427). TPU-native equivalent: a background thread
runs the host pipeline (decode/augment/homography sampling) and
jax.device_put's the next batch while the current step executes —
double-buffering into HBM."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


def device_prefetch(iterator: Iterable, size: int = 2,
                    sharding=None) -> Iterator:
    """Wrap a batch iterator with an N-deep device-transfer pipeline."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    SENTINEL = object()
    err: list = []

    def producer():
        try:
            for batch in iterator:
                if sharding is not None:
                    batch = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, sharding), batch)
                else:
                    batch = jax.tree_util.tree_map(jax.device_put, batch)
                q.put(batch)
        except Exception as e:  # surface producer failures to the consumer
            err.append(e)
        finally:
            q.put(SENTINEL)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is SENTINEL:
            if err:
                raise err[0]
            return
        yield item
