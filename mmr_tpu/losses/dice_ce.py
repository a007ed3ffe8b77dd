"""Combined Dice+CE losses — both blend conventions of the reference.

1. ``blended_ce_dice_loss`` — Path A's convex blend
   ``loss = f·dice + (1−f)·CE`` with ``f = dice_loss_factor``
   (``ModelTraining.py:594-603``; canonical config uses 0.5,
   ``train_sarrarp50.sh:15``). ``dice_loss_factor = -1`` disables dice.

2. ``dice_ce_loss`` — Path B's MONAI ``DiceCELoss(softmax=True)``
   (``Main_MMR_SegModel.py:578,709``): mean soft-dice loss with MONAI's
   smoothing constants (smooth_nr = smooth_dr = 1e-5, include_background=True)
   plus unweighted cross-entropy, summed (lambda_dice = lambda_ce = 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmr_tpu.losses.ce import cross_entropy_loss
from mmr_tpu.losses.dice import dice_loss
from mmr_tpu.ops.onehot import one_hot


def blended_ce_dice_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    dice_loss_factor: float = 0.5,
    eps: float = 1.0,
    ignore_index: int | None = None,
) -> jnp.ndarray:
    if dice_loss_factor == -1:
        return cross_entropy_loss(logits, target)
    return dice_loss_factor * dice_loss(logits, target, eps=eps, ignore_index=ignore_index) + (
        1.0 - dice_loss_factor
    ) * cross_entropy_loss(logits, target)


def dice_ce_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    lambda_dice: float = 1.0,
    lambda_ce: float = 1.0,
) -> jnp.ndarray:
    """MONAI ``DiceCELoss(softmax=True)`` semantics on NHWC logits / int target."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    tgt = one_hot(target, num_classes, dtype=probs.dtype)
    intersection = jnp.sum(probs * tgt, axis=(1, 2))
    denom = jnp.sum(probs, axis=(1, 2)) + jnp.sum(tgt, axis=(1, 2))
    dice = 1.0 - (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    return lambda_dice * jnp.mean(dice) + lambda_ce * cross_entropy_loss(logits, target)
