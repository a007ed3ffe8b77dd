"""Metric functions over confusion stats (smp ``segmentation_models_pytorch.
metrics.functional`` semantics: ``iou_score`` etc. with reduction modes and
``zero_division=1.0`` default), as used at ``Main_MMR_SegModel.py:634-639`` and
``:1323-1326``."""

from __future__ import annotations

import jax.numpy as jnp


def _safe_divide(num, den, zero_division: float):
    zero = den == 0
    score = num / jnp.where(zero, 1.0, den)
    return jnp.where(zero, zero_division, score)


def _reduce(metric_fn, tp, fp, fn, tn, reduction, zero_division):
    if reduction == "micro":
        return metric_fn(tp.sum(), fp.sum(), fn.sum(), tn.sum(), zero_division)
    if reduction == "macro":
        per_class = metric_fn(tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0), zero_division)
        return per_class.mean()
    if reduction == "micro-imagewise":
        per_image = metric_fn(tp.sum(1), fp.sum(1), fn.sum(1), tn.sum(1), zero_division)
        return per_image.mean()
    if reduction == "macro-imagewise":
        return metric_fn(tp, fp, fn, tn, zero_division).mean()
    if reduction is None or reduction == "none":
        return metric_fn(tp, fp, fn, tn, zero_division)
    raise ValueError(f"unknown reduction {reduction!r}")


def iou_score(tp, fp, fn, tn, reduction=None, zero_division=1.0):
    fn_ = lambda tp, fp, fn, tn, zd: _safe_divide(tp, tp + fp + fn, zd)
    return _reduce(fn_, tp, fp, fn, tn, reduction, zero_division)


def f1_score(tp, fp, fn, tn, reduction=None, zero_division=1.0):
    fn_ = lambda tp, fp, fn, tn, zd: _safe_divide(2 * tp, 2 * tp + fp + fn, zd)
    return _reduce(fn_, tp, fp, fn, tn, reduction, zero_division)


def precision(tp, fp, fn, tn, reduction=None, zero_division=1.0):
    fn_ = lambda tp, fp, fn, tn, zd: _safe_divide(tp, tp + fp, zd)
    return _reduce(fn_, tp, fp, fn, tn, reduction, zero_division)


def recall(tp, fp, fn, tn, reduction=None, zero_division=1.0):
    fn_ = lambda tp, fp, fn, tn, zd: _safe_divide(tp, tp + fn, zd)
    return _reduce(fn_, tp, fp, fn, tn, reduction, zero_division)
