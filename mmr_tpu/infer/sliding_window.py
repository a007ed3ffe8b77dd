"""Sliding-window inference — MONAI ``sliding_window_inference`` capability
(used at ``Main_MMR_SegModel.py:1309-1317`` with roi = training patch,
``sw_batch_size`` windows per forward, overlap 0.5–0.75, Gaussian blending)
rebuilt TPU-first:

- the window grid is **static** per (image size, roi, overlap) — window
  extraction, the batched forwards and the weighted scatter-add all live in
  one jit, so full-frame prediction is one XLA program;
- windows are processed in fixed-size batches via ``lax.map`` over a
  pre-padded window stack (no dynamic shapes, no recompiles across frames of
  the same video resolution — SURVEY.md §7.3(4));
- blending uses MONAI's Gaussian importance map (σ = 0.125·roi, value-clipped
  to its minimum positive value) or constant weights;
- the window-batch axis is shardable over the data mesh: windows of one frame
  fan out across chips and the blended sum is reduced back (the reference's
  analog of "sequence parallelism", SURVEY.md §5.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _window_starts(image_size: int, roi: int, overlap: float) -> list[int]:
    """MONAI's dense_patch_slices start grid: interval = roi·(1-overlap),
    last window clamped flush with the image edge."""
    if roi >= image_size:
        return [0]
    interval = max(1, int(roi * (1.0 - overlap)))
    starts = [min(s, image_size - roi)
              for s in range(0, image_size - roi + interval, interval)]
    return sorted(set(starts))  # edge clamping can duplicate the last start


def gaussian_importance_map(roi: tuple[int, int], sigma_scale: float = 0.125) -> np.ndarray:
    """MONAI GaussianFilter-based importance map: centered 2-D Gaussian with
    σ = sigma_scale·roi, min-clipped to its smallest positive value."""
    h, w = roi
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    sy, sx = sigma_scale * h, sigma_scale * w
    yy = np.exp(-0.5 * ((np.arange(h) - cy) / sy) ** 2)
    xx = np.exp(-0.5 * ((np.arange(w) - cx) / sx) ** 2)
    m = np.outer(yy, xx).astype(np.float32)
    m = np.clip(m, m[m > 0].min(), None)
    return m


@functools.partial(
    jax.jit,
    static_argnames=("predictor", "roi", "sw_batch_size", "overlap", "mode",
                     "num_classes"),
)
def sliding_window_inference(
    inputs: jnp.ndarray,
    predictor,
    roi: tuple[int, int],
    num_classes: int,
    sw_batch_size: int = 24,
    overlap: float = 0.5,
    mode: str = "gaussian",  # | "constant"
) -> jnp.ndarray:
    """``inputs`` (N, H, W, C) → blended logits (N, H, W, num_classes).

    ``predictor``: jit-traceable ``(B, rh, rw, C) -> (B, rh, rw, num_classes)``.
    """
    n, h, w, c = inputs.shape
    rh, rw = roi
    rh, rw = min(rh, h), min(rw, w)
    ys = _window_starts(h, rh, overlap)
    xs = _window_starts(w, rw, overlap)
    coords = np.asarray([(y, x) for y in ys for x in xs], np.int32)  # (W, 2)
    n_windows = len(coords)

    if mode == "gaussian":
        imp_np = gaussian_importance_map((rh, rw))
    else:
        imp_np = np.ones((rh, rw), np.float32)
    imp = jnp.asarray(imp_np)
    # the blending denominator is input-independent on the static grid —
    # build it host-side once instead of scatter-accumulating per window
    # (halves the on-device blend traffic)
    wsum_np = np.zeros((h, w, 1), np.float32)
    for (y, x) in coords:
        wsum_np[y:y + rh, x:x + rw, 0] += imp_np
    inv_wsum = jnp.asarray(1.0 / np.maximum(wsum_np, 1e-8))

    # pad window count to a multiple of sw_batch_size (static)
    n_pad = -(-n_windows // sw_batch_size) * sw_batch_size
    coords_p = np.concatenate(
        [coords, np.tile(coords[-1:], (n_pad - n_windows, 1))], axis=0)
    pad_mask = jnp.asarray(
        (np.arange(n_pad) < n_windows).astype(np.float32))
    coords_j = jnp.asarray(coords_p).reshape(-1, sw_batch_size, 2)
    mask_j = pad_mask.reshape(-1, sw_batch_size)

    def one_image(img):
        def batch_step(out_sum, xs_):
            cbatch, valid = xs_

            def extract(cy_cx):
                return jax.lax.dynamic_slice(img, (cy_cx[0], cy_cx[1], 0), (rh, rw, c))

            windows = jax.vmap(extract)(cbatch)  # (B, rh, rw, C)
            logits = predictor(windows).astype(jnp.float32)

            def scatter(o, j):
                y, x = cbatch[j, 0], cbatch[j, 1]
                patch = logits[j] * (imp * valid[j])[..., None]
                o = jax.lax.dynamic_update_slice(
                    o, jax.lax.dynamic_slice(o, (y, x, 0), (rh, rw, num_classes)) + patch,
                    (y, x, 0))
                return o, None

            out_sum, _ = jax.lax.scan(
                scatter, out_sum, jnp.arange(sw_batch_size))
            return out_sum, None

        init = jnp.zeros((h, w, num_classes), jnp.float32)
        out_sum, _ = jax.lax.scan(batch_step, init, (coords_j, mask_j))
        return out_sum * inv_wsum

    return jax.vmap(one_image)(inputs)


def make_sliding_window_fn(model, variables, roi, num_classes,
                           sw_batch_size=24, overlap=0.5, mode="gaussian",
                           preprocess=None, mesh=None):
    """Bind a flax model into a frame-batch predictor
    ``(N, H, W, 3) -> (N, H, W, C)`` logits.

    With ``mesh``, the frame axis (the per-video temporal batch) is sharded
    over the data mesh axis — each chip blends its own frames' windows; no
    cross-chip reduction is needed (SURVEY.md §5.7's TPU mapping)."""

    def predictor(windows):
        return model.apply(variables, windows, train=False)

    def run(frames):
        if preprocess is not None:
            frames = preprocess(frames)
        return sliding_window_inference(
            frames, predictor, tuple(roi), num_classes,
            sw_batch_size=sw_batch_size, overlap=overlap, mode=mode)

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(run)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmr_tpu.core.mesh import DATA_AXIS

    shard_frames = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(run, in_shardings=(shard_frames,), out_shardings=shard_frames)
