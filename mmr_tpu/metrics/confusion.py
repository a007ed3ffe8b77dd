"""Per-image per-class confusion statistics (smp ``get_stats`` semantics).

Rebuilds ``segmentation_models_pytorch.metrics.get_stats(mode='multiclass')``
as used at ``Main_MMR_SegModel.py:634-639`` (training IoU) and ``:1323-1326``
(inference, with the ``preds-1 / masks-1 / ignore_index=-1`` background-drop
trick). Returns (tp, fp, fn, tn) each of shape ``(batch, num_classes)``.

Implemented as a single fused one-hot-free reduction: class membership is
compared per class with the ignore mask applied, all inside one jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_index"))
def segmentation_stats(
    pred_ids: jnp.ndarray,
    gt_ids: jnp.ndarray,
    num_classes: int,
    ignore_index: int | None = None,
):
    """``pred_ids``/``gt_ids``: (B, ...) integer maps → (B, C) f32 stats."""
    b = pred_ids.shape[0]
    pred = pred_ids.reshape(b, -1).astype(jnp.int32)
    gt = gt_ids.reshape(b, -1).astype(jnp.int32)
    if ignore_index is not None:
        valid = gt != ignore_index
    else:
        valid = jnp.ones_like(gt, dtype=bool)
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    pred_oh = (pred[..., None] == classes) & valid[..., None]  # (B, P, C)
    gt_oh = (gt[..., None] == classes) & valid[..., None]
    tp = jnp.sum((pred_oh & gt_oh).astype(jnp.float32), axis=1)
    p_cnt = jnp.sum(pred_oh.astype(jnp.float32), axis=1)
    g_cnt = jnp.sum(gt_oh.astype(jnp.float32), axis=1)
    n_valid = jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True)
    fp = p_cnt - tp
    fn = g_cnt - tp
    tn = n_valid - tp - fp - fn
    return tp, fp, fn, tn
