"""Host→device feeding with background prefetch.

The reference overlaps CPU augmentation with GPU compute via 14 DataLoader
worker processes + pinned memory (``Pre_Process.py:1137-1145``,
``ModelTraining.py:209-215``). Here augmentation runs *on device* inside the
train step, so the host only reads+assembles patches; a single prefetch
thread keeps ``depth`` batches in flight, calling ``jax.device_put`` with the
target sharding so the H2D copy overlaps the previous step's compute
(double-buffered HBM feeding, SURVEY.md §2.2 table)."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import numpy as np


class PrefetchIterator:
    """Wraps a host batch iterator; materializes + transfers ahead of use."""

    _SENTINEL = object()

    def __init__(self, source: Iterable, transfer: Callable, depth: int = 2):
        self.source = iter(source)
        self.transfer = transfer
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._error = None
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        try:
            for item in self.source:
                self.q.put(self.transfer(item))
        except BaseException as e:  # surface worker errors on the consumer side
            self._error = e
        finally:
            self.q.put(self._SENTINEL)

    def __iter__(self) -> Iterator:
        while True:
            item = self.q.get()
            if item is self._SENTINEL:
                if self._error is not None:
                    raise self._error
                return
            yield item


def microbatch_stacker(batch_iter: Iterable, n_accum: int):
    """Group ``n_accum`` sampler batches into one stacked (n_accum, B, ...)
    device step input (the reference's grad-accumulation cadence,
    ``Main_MMR_SegModel.py:718``)."""
    imgs, masks = [], []
    for im, mk in batch_iter:
        imgs.append(im)
        masks.append(mk)
        if len(imgs) == n_accum:
            yield np.stack(imgs), np.stack(masks)
            imgs, masks = [], []
