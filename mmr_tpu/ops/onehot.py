"""One-hot and RGB color-key codecs.

Rebuilds (TPU-side, vectorized) the reference's label machinery:
- kornia-style ``one_hot`` used by the dice loss (``dice_loss.py:33,128-136``),
- ``utils.generateLabel4CE`` RGB→class-id matching (``utils.py:342-383``),
- ``utils.reverseOneHot`` / ``generateOneHot`` ids→RGB / one-hot
  (``utils.py:386-477``).

The reference loops over classes per-image on CPU; here the codecs are single
vectorized comparisons that XLA fuses.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def one_hot(labels: jnp.ndarray, num_classes: int, dtype=jnp.float32, axis: int = -1) -> jnp.ndarray:
    """One-hot encode integer labels ``(..., H, W) -> (..., H, W, C)`` (NHWC).

    ``axis=1`` gives the reference's NCHW layout when needed for parity tests.
    """
    labels = labels.astype(jnp.int32)
    eye = (labels[..., None] == jnp.arange(num_classes, dtype=jnp.int32)).astype(dtype)
    if axis == -1:
        return eye
    return jnp.moveaxis(eye, -1, axis)


def rgb_to_ids(rgb: jnp.ndarray, key: np.ndarray) -> jnp.ndarray:
    """Map an RGB mask ``(..., H, W, 3)`` to class ids via a color key.

    ``key`` is ``(num_classes, 3)`` uint8 — the parsed
    ``sarrarp50SegClasses.json`` colors (``SegNetDataLoaderV1_SAR.py:77-95``).
    Pixels matching no key map to 0 (background), matching the reference's
    behaviour of leaving non-matching label pixels at zero (``utils.py:342-383``).
    """
    key = jnp.asarray(key, dtype=rgb.dtype)
    eq = (rgb[..., None, :] == key).all(-1)  # (..., H, W, C)
    ids = jnp.argmax(eq, axis=-1)
    any_match = eq.any(-1)
    return jnp.where(any_match, ids, 0).astype(jnp.int32)


def ids_to_rgb(ids: jnp.ndarray, key: np.ndarray) -> jnp.ndarray:
    """Map class ids ``(..., H, W)`` back to RGB ``(..., H, W, 3)``
    (reference ``reverseOneHot``, ``utils.py:386-427``)."""
    key = jnp.asarray(key, dtype=jnp.uint8)
    return jnp.take(key, ids.astype(jnp.int32), axis=0)
