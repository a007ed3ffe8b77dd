"""Padding / cropping math.

Host+device utilities mirroring:
- the UNet skip-alignment pad for odd sizes (``unet_parts.py:308-338``),
- the Zarr bbox crop with out-of-bounds zero padding
  (``Pre_Process.py:466-535`` ``crop_from_zarr``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pad_to(x: jnp.ndarray, target_hw: tuple[int, int], value: float = 0.0) -> jnp.ndarray:
    """Symmetrically pad NHWC spatial dims up to ``target_hw`` (UNet skip align:
    pad = diff//2 on the leading side, remainder trailing, like F.pad in
    ``unet_parts.py:325-330``)."""
    h, w = x.shape[-3], x.shape[-2]
    dh, dw = target_hw[0] - h, target_hw[1] - w
    if dh == 0 and dw == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[-3] = (dh // 2, dh - dh // 2)
    pads[-2] = (dw // 2, dw - dw // 2)
    return jnp.pad(x, pads, constant_values=value)


def window_slices(bbox_lo, patch, spatial):
    """The in-bounds source slices + leading pad widths for a
    ``center_pad_bbox_crop`` window (shared by the sync and async read
    paths)."""
    src, before = [], []
    for lo, p, s in zip(bbox_lo, patch, spatial):
        lo = int(lo)
        lo_c = min(max(lo, 0), s)
        hi_c = min(max(lo + p, 0), s)
        src.append(slice(lo_c, hi_c))
        before.append(max(0, lo_c - lo))
    return tuple(src), before


def assemble_window(cropped: np.ndarray, before, patch, n_lead: int,
                    pad_value=0.0) -> np.ndarray:
    pads = [(0, 0)] * n_lead + [
        (b, p - b - cropped.shape[n_lead + i])
        for i, (b, p) in enumerate(zip(before, patch))
    ]
    if any(pw != (0, 0) for pw in pads):
        cropped = np.pad(cropped, pads, constant_values=pad_value)
    return cropped


def center_pad_bbox_crop(arr, bbox_lo, patch, pad_value=0.0) -> np.ndarray:
    """Host-side crop of ``arr[..., *spatial]`` starting at ``bbox_lo`` with size
    ``patch``, zero-padding any out-of-bounds region; leading (channel) dims pass
    through. This is the lazy-read primitive: only the in-bounds window is read
    from the (Zarr/tensorstore) array — the ``crop_from_zarr`` contract
    (``Pre_Process.py:466-535``)."""
    patch = tuple(int(p) for p in patch)
    n_lead = arr.ndim - len(patch)
    spatial = arr.shape[n_lead:]
    src, before = window_slices(bbox_lo, patch, spatial)
    cropped = np.asarray(arr[(slice(None),) * n_lead + src])
    return assemble_window(cropped, before, patch, n_lead, pad_value)
