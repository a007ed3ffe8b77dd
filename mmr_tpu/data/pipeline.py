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
        self._closed = threading.Event()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        try:
            for item in self.source:
                out = self.transfer(item)
                # bounded put with a close check: if the consumer abandons
                # iteration (step raised, epoch aborted), the worker must not
                # block forever holding `depth` device-sharded batches of HBM
                while not self._closed.is_set():
                    try:
                        self.q.put(out, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if self._closed.is_set():
                    return
        except BaseException as e:  # surface worker errors on the consumer side
            self._error = e
        finally:
            # the sentinel MUST reach the consumer (a dropped one leaves the
            # consumer blocked on get() forever); bounded put + close check
            while not self._closed.is_set():
                try:
                    self.q.put(self._SENTINEL, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def close(self):
        """Release the producer thread and any staged batches."""
        self._closed.set()
        while True:  # drain so a blocked put can finish
            try:
                self.q.get_nowait()
            except queue.Empty:
                break

    def __del__(self):
        self._closed.set()

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
    if imgs:
        # no silent caps: a steps_per_epoch not divisible by n_accum leaves
        # fully-sampled batches unused (RNG advanced, windows decoded)
        import logging
        logging.getLogger("mmr_tpu").warning(
            "microbatch_stacker dropped %d trailing sampler batch(es): "
            "steps_per_epoch %% grad_accumulate_step != 0", len(imgs))
