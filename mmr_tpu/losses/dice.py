"""Soft Dice loss with the reference's exact semantics.

Reproduces ``MMR_Seg_Unet/MMR_Core_ModelData/dice_loss.py:96-161``:
softmax over the class axis → one-hot target → per-(sample, class)
intersection/cardinality over spatial dims → ``(2·I + eps) / (card + eps)`` →
``mean(1 - dice)`` over batch *and* classes. ``eps`` defaults to 1.0 (the
reference default) and ``ignore_index`` truncates trailing class channels
(``input_soft[:, :ignore_index]``, ``dice_loss.py:134-136``).

Layout here is NHWC (TPU-native); class axis is last.
"""

from __future__ import annotations

import jax.numpy as jnp

from mmr_tpu.ops.onehot import one_hot


def soft_dice_score(
    probs: jnp.ndarray,
    target_onehot: jnp.ndarray,
    eps: float = 1.0,
    spatial_axes: tuple[int, ...] = (1, 2),
) -> jnp.ndarray:
    """Per-(sample, class) soft dice score from probabilities + one-hot target."""
    intersection = jnp.sum(probs * target_onehot, axis=spatial_axes)
    cardinality = jnp.sum(probs + target_onehot, axis=spatial_axes)
    return (2.0 * intersection + eps) / (cardinality + eps)


def dice_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    eps: float = 1.0,
    ignore_index: int | None = None,
) -> jnp.ndarray:
    """``logits``: (N, H, W, C) raw scores; ``target``: (N, H, W) int ids."""
    if logits.ndim != 4:
        raise ValueError(f"expected NHWC logits, got shape {logits.shape}")
    if logits.shape[:-1] != target.shape:
        raise ValueError(
            f"logits spatial shape {logits.shape[:-1]} != target shape {target.shape}"
        )
    num_classes = logits.shape[-1]
    probs = jnp.asarray(
        jnp.exp(logits.astype(jnp.float32) - jnp.max(logits, axis=-1, keepdims=True))
    )
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    tgt = one_hot(target, num_classes, dtype=probs.dtype)
    if ignore_index is not None:
        probs = probs[..., :ignore_index]
        tgt = tgt[..., :ignore_index]
    dice = soft_dice_score(probs, tgt, eps=eps)
    return jnp.mean(1.0 - dice)
