"""Streaming segmentation evaluator — the Path-A ``utils.Evaluate`` rebuilt.

Reference: ``MMR_Seg_Unet/MMR_Core_ModelData/utils.py:31-181`` — accumulates
per-class TP/FP/FN over batches from argmaxed predictions vs one-hot GT, then
``getIoU = tp/(tp+fp+fn+1e-15)`` (``utils.py:140-157``) and
``getPRF1`` (``utils.py:159-181``).

TPU-first: instead of one-hot materialization on CPU, each ``add_batch``
runs the fused Pallas confusion kernel (XLA fallback off-TPU) and accumulates
three (C,) float64 host counters.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mmr_tpu.ops.pallas.confusion import confusion_stats_auto


class Evaluate:
    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self) -> None:
        self.tp = np.zeros(self.num_classes, np.float64)
        self.fp = np.zeros(self.num_classes, np.float64)
        self.fn = np.zeros(self.num_classes, np.float64)

    def add_batch(self, logits_or_ids: jnp.ndarray, gt_ids: jnp.ndarray) -> None:
        """``logits_or_ids``: (B, H, W, C) logits/probs or (B, H, W) ids;
        ``gt_ids``: (B, H, W) int ids."""
        pred = logits_or_ids
        if pred.ndim == gt_ids.ndim + 1:
            pred = jnp.argmax(pred, axis=-1)
        tp, fp, fn = confusion_stats_auto(pred, gt_ids, self.num_classes)
        self.tp += np.asarray(tp, np.float64)
        self.fp += np.asarray(fp, np.float64)
        self.fn += np.asarray(fn, np.float64)

    # epsilon matches utils.py:154-157 / :174-181
    def iou(self) -> tuple[np.ndarray, float]:
        per_class = self.tp / (self.tp + self.fp + self.fn + 1e-15)
        return per_class, float(per_class.mean())

    def precision_recall_f1(self):
        p = self.tp / (self.tp + self.fp + 1e-15)
        r = self.tp / (self.tp + self.fn + 1e-15)
        f1 = 2.0 * p * r / (p + r + 1e-15)
        return p, r, f1

    def mean_f1(self) -> float:
        _, _, f1 = self.precision_recall_f1()
        return float(f1.mean())
