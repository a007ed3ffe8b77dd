"""Sliding-window inference tests: blend correctness, grid math, MONAI-style
importance map."""

import numpy as np
import jax.numpy as jnp

from mmr_tpu.infer.sliding_window import (
    sliding_window_inference,
    gaussian_importance_map,
    _window_starts,
)


def test_window_starts_grid():
    # MONAI dense grid: interval = roi*(1-overlap), last window flush
    assert _window_starts(128, 64, 0.5) == [0, 32, 64]
    assert _window_starts(100, 64, 0.5) == [0, 32, 36]
    assert _window_starts(64, 64, 0.5) == [0]
    assert _window_starts(50, 64, 0.5) == [0]  # roi larger than image


def test_gaussian_importance_map():
    m = gaussian_importance_map((32, 48))
    assert m.shape == (32, 48)
    assert m.max() == m[15:17, 23:25].max()  # peak at center
    assert (m > 0).all()


def test_blending_reconstructs_identity(rng):
    """A predictor that returns its input must be reconstructed exactly —
    proof that overlap weights normalize to 1 everywhere."""
    x = rng.rand(2, 40, 56, 3).astype(np.float32)

    def identity_predictor(windows):
        return windows

    for mode in ("gaussian", "constant"):
        out = sliding_window_inference(
            jnp.asarray(x), identity_predictor, roi=(16, 16), num_classes=3,
            sw_batch_size=4, overlap=0.5, mode=mode)
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)


def test_roi_larger_than_image_single_window(rng):
    x = rng.rand(1, 24, 24, 3).astype(np.float32)
    calls = []

    def pred(w):
        calls.append(w.shape)
        return w * 2.0

    out = sliding_window_inference(jnp.asarray(x), pred, roi=(64, 64),
                                   num_classes=3, sw_batch_size=2)
    np.testing.assert_allclose(np.asarray(out), x * 2.0, atol=1e-5)
    assert calls[0][1:] == (24, 24, 3)  # roi clamped to image


def test_overlap_075(rng):
    x = rng.rand(1, 64, 64, 2).astype(np.float32)
    out = sliding_window_inference(
        jnp.asarray(x), lambda w: w, roi=(32, 32), num_classes=2,
        sw_batch_size=8, overlap=0.75)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)


def test_bf16_blend_matches_f32_within_bf16_noise(rng):
    """compute_dtype=bf16 (the production/evaluator default — the
    reference's fp16-autocast real-time surface) stores window logits in
    bf16 but still accumulates the blend in f32: the result tracks the f32
    blend within bf16 rounding, and the output dtype stays f32."""
    import jax.numpy as jnp

    x = rng.rand(2, 40, 56, 3).astype(np.float32)

    def pred(w):
        return w * 1.7 - 0.3

    out32 = sliding_window_inference(
        jnp.asarray(x), pred, roi=(16, 16), num_classes=3,
        sw_batch_size=4, overlap=0.5)
    out16 = sliding_window_inference(
        jnp.asarray(x), pred, roi=(16, 16), num_classes=3,
        sw_batch_size=4, overlap=0.5, compute_dtype=jnp.bfloat16)
    assert out16.dtype == jnp.float32
    a, b = np.asarray(out32), np.asarray(out16)
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 0.02


def test_fuse_blend_matches_chunked_path(rng):
    """fuse_blend=True (per-frame scan, blend consumes the predictor output
    in place) must reproduce the chunked path exactly for a batch-independent
    predictor — same windows, same importance weights, same f32 accumulate."""
    import jax.numpy as jnp

    x = rng.rand(3, 40, 56, 3).astype(np.float32)

    def pred(w):
        return w * 1.7 - 0.3

    for mode in ("gaussian", "constant"):
        base = sliding_window_inference(
            jnp.asarray(x), pred, roi=(16, 16), num_classes=3,
            sw_batch_size=4, overlap=0.5, mode=mode)
        fused = sliding_window_inference(
            jnp.asarray(x), pred, roi=(16, 16), num_classes=3,
            sw_batch_size=4, overlap=0.5, mode=mode, fuse_blend=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   atol=1e-6)
    # identity reconstruction through the fused path
    out = sliding_window_inference(
        jnp.asarray(x), lambda w: w, roi=(16, 16), num_classes=3,
        sw_batch_size=4, overlap=0.5, fuse_blend=True)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)


def test_packed_blend_matches_unpacked(rng):
    """A predictor that returns PackedT logits triggers the packed-canvas
    blend: weighted window cores scatter-add in the head's packed-lane
    layout and the canvas unpacks once via a free bitcast. Must equal the
    plain fuse_blend path on the SAME (bf16-quantized) logits."""
    import jax.numpy as jnp
    from mmr_tpu.models.packed_blocks import PackedT
    from mmr_tpu.ops.pallas import packed_chain as pc

    nc = 3
    x = rng.rand(2, 40, 56, nc).astype(np.float32)
    # roi 16x16, p=2 -> wb=8 (>=8, %8==0); all x starts on w=56 are even
    g = pc.RowGeom(16, 16, 2, 8, pc._round_up(10, 8))

    def raw(w):
        # bf16-quantize so both paths blend IDENTICAL logits
        return (w * 1.7 - 0.3).astype(jnp.bfloat16)

    def pred_plain(w):
        return raw(w)

    def pred_packed(w):
        return PackedT(pc.to_packed(raw(w).astype(jnp.float32), g), None,
                       nc, g)

    for mode in ("gaussian", "constant"):
        base = sliding_window_inference(
            jnp.asarray(x), pred_plain, roi=(16, 16), num_classes=nc,
            overlap=0.5, mode=mode, compute_dtype=jnp.bfloat16,
            fuse_blend=True)
        packed = sliding_window_inference(
            jnp.asarray(x), pred_packed, roi=(16, 16), num_classes=nc,
            overlap=0.5, mode=mode, fuse_blend=True)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                                   atol=1e-6)


def test_packed_blend_misaligned_grid_falls_back(rng):
    """w=46 is not a multiple of p=2 -> the packed branch must fall back to
    unpacking per window and still produce the correct blend."""
    import jax.numpy as jnp
    from mmr_tpu.models.packed_blocks import PackedT
    from mmr_tpu.ops.pallas import packed_chain as pc

    nc = 2
    x = rng.rand(1, 40, 45, nc).astype(np.float32)
    g = pc.RowGeom(16, 16, 2, 8, pc._round_up(10, 8))

    def pred_plain(w):
        return (w * 2.0).astype(jnp.bfloat16)

    def pred_packed(w):
        return PackedT(
            pc.to_packed((w * 2.0).astype(jnp.float32), g), None, nc, g)

    base = sliding_window_inference(
        jnp.asarray(x), pred_plain, roi=(16, 16), num_classes=nc,
        overlap=0.5, compute_dtype=jnp.bfloat16, fuse_blend=True)
    packed = sliding_window_inference(
        jnp.asarray(x), pred_packed, roi=(16, 16), num_classes=nc,
        overlap=0.5, fuse_blend=True)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                               atol=1e-6)


import pytest


@pytest.mark.slow
def test_packed_blend_full_model_matches(rng, monkeypatch):
    """End-to-end through make_sliding_window_fn: the packed UNet++ flagship
    with packed_blend=True (model emits raw PackedT head logits,
    packed-canvas blend) must match packed_blend=False (per-window unpack,
    NHWC blend) — same variables, same windows, same bf16 logits."""
    import jax
    import jax.numpy as jnp
    from mmr_tpu.models.decoders import UnetPlusPlusModel
    from mmr_tpu.ops.pallas import packed_chain as pc
    from mmr_tpu.infer.sliding_window import make_sliding_window_fn

    monkeypatch.setattr(pc, "_INTERPRET", True)
    model = UnetPlusPlusModel(num_classes=6,
                              encoder_name="tu-mobilenetv3_small_100",
                              packed=True, packed_frontend=True)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 128, 128, 3), jnp.float32),
                           train=False)
    frames = jnp.asarray(rng.rand(1, 256, 512, 3).astype(np.float32))
    kw = dict(sw_batch_size=9, overlap=0.5, compute_dtype=jnp.bfloat16)
    sw_ref = make_sliding_window_fn(model, variables, (128, 256), 6,
                                    fuse_blend=True, **kw)
    sw_pk = make_sliding_window_fn(model, variables, (128, 256), 6,
                                   packed_blend=True, **kw)
    a = np.asarray(sw_ref(frames))
    b = np.asarray(sw_pk(frames))
    np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-5)
