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
