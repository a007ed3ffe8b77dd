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
                     "num_classes", "compute_dtype", "fuse_blend"),
)
def sliding_window_inference(
    inputs: jnp.ndarray,
    predictor,
    roi: tuple[int, int],
    num_classes: int,
    sw_batch_size: int = 24,
    overlap: float = 0.5,
    mode: str = "gaussian",  # | "constant"
    compute_dtype=jnp.float32,
    fuse_blend: bool = False,
) -> jnp.ndarray:
    """``inputs`` (N, H, W, C) → blended logits (N, H, W, num_classes).

    ``predictor``: jit-traceable ``(B, rh, rw, C) -> (B, rh, rw, num_classes)``.

    ``compute_dtype``: storage dtype of the per-window logits surface and
    the blend products (the blend ACCUMULATES in f32 either way, and the
    output is f32). The r5 infer trace showed the window-logits surface —
    n·n_windows·rh·rw·nc, 1.57 GB f32 at the 6-frame full-HD default — is
    the dominant non-model cost; bf16 halves its round-trip. bf16 matches
    the reference's real-time surface, which runs the model AND MONAI's
    blending under fp16 autocast (``Main_MMR_SegModel.py:1274-1317``).

    ``fuse_blend``: scan over FRAMES instead of fixed-size window chunks —
    each iteration runs one frame's whole window grid through the predictor
    (model batch = n_windows, ``sw_batch_size`` ignored) and blends it into
    the output canvas immediately, so the all-frames logits stack never
    round-trips HBM and the blend consumes the predictor's output in place
    (the r5 infer trace charged ~18.5 ms/call to the logits
    unpack/relayout/stack chain between the chunk loop and the blend).
    Same math per window; results match the chunked path to f32 exactness
    for batch-independent (eval-mode) predictors."""
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

    # static-grid blend: every start offset is known at trace time, so the
    # per-window scatter is a statically-padded add — windows of one grid
    # row sum into an (rh, W) strip (pads in x), strips sum into the canvas
    # (pads in y).  XLA tree-reduces the adds; no sequential
    # dynamic_update_slice chain (the round-1 bottleneck, VERDICT #4).
    def blend(lg):
        wl = lg * imp[None, ..., None]
        out = jnp.zeros((h, w, num_classes), jnp.float32)
        for r, y in enumerate(ys):
            strip = jnp.zeros((rh, w, num_classes), jnp.float32)
            for k, x in enumerate(xs):
                strip = strip + jnp.pad(
                    wl[r * len(xs) + k], ((0, 0), (x, w - rw - x), (0, 0)))
            out = out + jnp.pad(strip, ((y, h - rh - y), (0, 0), (0, 0)))
        return out * inv_wsum

    # packed-canvas blend: when the predictor emits the head's raw PackedT
    # logits surface (``packed_logits=True`` on the packed UNet++ path), the
    # whole blend runs in the head's packed-lane layout — window cores are
    # weighted and scatter-added into a PACKED canvas (x offsets become
    # wb-block offsets; the grid must be p-aligned), and the blended canvas
    # unpacks ONCE via a free row-major bitcast + class slice. The per-window
    # from_packed transpose and every XLA relayout between the Mosaic head
    # output and the NHWC blend disappear (the r5 infer trace charged
    # ~11 ms/call to that chain even after fuse_blend).
    def _packed_aligned(g):
        return (g.h == rh and g.w == rw and w % g.p == 0
                and all(x % g.p == 0 for x in xs))

    def blend_packed_core(t):
        """Weighted scatter-add of one frame's window cores into a PACKED
        canvas (h, w//p, p·cp) f32 — the unpack (a free row-major bitcast
        + class slice) and the 1/Σw multiply happen OUTSIDE the frame scan,
        in one fused pass over the stacked canvases (doing them per frame
        made XLA relayout every frame's canvas twice, ~6 ms/call)."""
        g = t.geom
        cp = g.lanes(num_classes) // g.p
        core = t.data[:, 1:-1, 1:g.wb + 1, :]  # (B, rh, wb, p*cp) bf16
        # lane l holds (pixel l//cp, channel l%cp) of its block — weight
        # every channel of a pixel by that pixel's importance
        imp_l = jnp.asarray(
            np.repeat(imp_np.reshape(rh, g.wb, g.p), cp, axis=2))
        wl = core * imp_l  # f32 products
        wbc = w // g.p
        out = jnp.zeros((h, wbc, g.p * cp), jnp.float32)
        for r, y in enumerate(ys):
            strip = jnp.zeros((rh, wbc, g.p * cp), jnp.float32)
            for k, x in enumerate(xs):
                xb = x // g.p
                strip = strip + jnp.pad(
                    wl[r * len(xs) + k],
                    ((0, 0), (xb, wbc - g.wb - xb), (0, 0)))
            out = out + jnp.pad(strip, ((y, h - rh - y), (0, 0), (0, 0)))
        return out

    if fuse_blend:
        from mmr_tpu.models.packed_blocks import PackedT

        coords_j = jnp.asarray(coords)
        # abstract-eval the predictor once: a PackedT result (on a
        # p-aligned grid) switches the whole scan to the packed-canvas
        # blend — the decision is static, the model is not executed
        probe = jax.eval_shape(
            predictor, jax.ShapeDtypeStruct((n_windows, rh, rw, c),
                                            inputs.dtype))
        packed_mode = (isinstance(probe, PackedT)
                       and probe.geom_src is None
                       and _packed_aligned(probe.geom))

        def frame_body(_, i):
            def extract(v):
                return jax.lax.dynamic_slice(
                    inputs, (i, v[0], v[1], 0), (1, rh, rw, c))[0]

            windows = jax.vmap(extract)(coords_j)  # (n_windows, rh, rw, C)
            lg = predictor(windows)
            if packed_mode:
                return None, blend_packed_core(lg)
            if isinstance(lg, PackedT):  # misaligned grid: unpack per frame
                lg = lg.unpack()
            return None, blend(lg.astype(compute_dtype))

        # stacked scan output (ys) — XLA writes each frame's blend straight
        # into the preallocated result; no canvas carry
        _, canvas = jax.lax.scan(frame_body, None,
                                 jnp.arange(n, dtype=jnp.int32))
        if packed_mode:
            g = probe.geom
            cp = g.lanes(num_classes) // g.p
            # (n, h, w//p, p·cp) → (n, h, w, cp): contiguous row-major
            # bitcast; then ONE fused class-slice + 1/Σw pass
            canvas = canvas.reshape(n, h, w, cp)[..., :num_classes]
            canvas = canvas * inv_wsum
        return canvas

    # one flat (frame, y, x) window stream across ALL frames, padded to a
    # multiple of sw_batch_size — the model is never vmapped (frame-level
    # vmap would map over the Pallas kernels, which Mosaic rejects), and
    # batch padding amortizes across frames instead of per frame
    n_total = n * n_windows
    n_pad = -(-n_total // sw_batch_size) * sw_batch_size
    fyx = np.concatenate(
        [np.repeat(np.arange(n, dtype=np.int32), n_windows)[:, None],
         np.tile(coords, (n, 1))], axis=1)
    fyx = np.concatenate([fyx, np.tile(fyx[-1:], (n_pad - n_total, 1))])
    fyx_j = jnp.asarray(fyx).reshape(-1, sw_batch_size, 3)

    def fwd(cb):
        def extract(v):
            return jax.lax.dynamic_slice(
                inputs, (v[0], v[1], v[2], 0), (1, rh, rw, c))[0]

        windows = jax.vmap(extract)(cb)  # (B, rh, rw, C)
        return predictor(windows).astype(compute_dtype)

    if fyx_j.shape[0] == 1:
        logits = fwd(fyx_j[0])
    else:
        logits = jax.lax.map(fwd, fyx_j).reshape(n_pad, rh, rw, num_classes)
    logits = logits[:n_total].reshape(n, n_windows, rh, rw, num_classes)
    return jax.vmap(blend)(logits)


def make_sliding_window_fn(model, variables, roi, num_classes,
                           sw_batch_size=24, overlap=0.5, mode="gaussian",
                           preprocess=None, mesh=None,
                           compute_dtype=jnp.float32, fuse_blend=False,
                           packed_blend=False):
    """Bind a flax model into a frame-batch predictor
    ``(N, H, W, 3) -> (N, H, W, C)`` logits.

    With ``mesh``, the frame axis (the per-video temporal batch) is sharded
    over the data mesh axis — each chip blends its own frames' windows; no
    cross-chip reduction is needed (SURVEY.md §5.7's TPU mapping).

    ``compute_dtype=jnp.bfloat16`` stores the preprocessed frames and the
    window-logits surface in bf16 (f32 blend accumulation, f32 output) —
    the reference's fp16-autocast real-time configuration
    (``Main_MMR_SegModel.py:1274-1317``); halves the two dominant non-model
    memory streams of the full-HD path.

    ``packed_blend=True`` (implies ``fuse_blend``): ask the model for its
    raw packed-layout logits (``packed_logits=True`` — supported by the
    packed UNet++ path) and blend in that layout; the per-window unpack and
    its relayout copies never run. Falls back transparently when the model
    returns plain NHWC logits or the window grid is not p-aligned."""

    def predictor(windows):
        if packed_blend:
            return model.apply(variables, windows, train=False,
                               packed_logits=True)
        return model.apply(variables, windows, train=False)

    def run(frames):
        if frames.dtype == jnp.uint8:  # compact-transfer: k/255 on device
            frames = frames.astype(jnp.float32) / 255.0
        if preprocess is not None:
            frames = preprocess(frames)
        frames = frames.astype(compute_dtype)
        return sliding_window_inference(
            frames, predictor, tuple(roi), num_classes,
            sw_batch_size=sw_batch_size, overlap=overlap, mode=mode,
            compute_dtype=compute_dtype,
            fuse_blend=fuse_blend or packed_blend)

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(run)

    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmr_tpu.core.mesh import DATA_AXIS

    # shard_map (not sharding propagation): each chip runs the whole
    # window-stream pipeline on its local frames, so the flat (frame,
    # window) stream never mixes shards and no collective is needed
    run_local = shard_map(run, mesh=mesh, in_specs=(P(DATA_AXIS),),
                          out_specs=P(DATA_AXIS), check_rep=False)
    shard_frames = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(run_local, in_shardings=(shard_frames,),
                   out_shardings=shard_frames)
