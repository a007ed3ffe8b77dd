"""Unit tests for resize / one-hot / pad-crop primitives vs torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from mmr_tpu.ops.resize import resize_bilinear, resize_nearest, upsample2x
from mmr_tpu.ops.onehot import one_hot, rgb_to_ids, ids_to_rgb
from mmr_tpu.ops.padcrop import pad_to, center_pad_bbox_crop


@pytest.mark.parametrize("out_hw", [(26, 34), (64, 48), (7, 9)])
@pytest.mark.parametrize("align_corners", [True, False])
def test_bilinear_matches_torch(rng, out_hw, align_corners):
    x = rng.rand(2, 13, 17, 3).astype(np.float32)
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                      mode="bilinear", align_corners=align_corners)
        .permute(0, 2, 3, 1).numpy()
    )
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners))
    np.testing.assert_allclose(got, ref, atol=2e-6)


@pytest.mark.parametrize("out_hw", [(26, 34), (5, 7), (40, 40)])
def test_nearest_matches_torch(rng, out_hw):
    x = rng.rand(2, 13, 17, 3).astype(np.float32)
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest")
        .permute(0, 2, 3, 1).numpy()
    )
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    np.testing.assert_array_equal(got, ref)


def test_upsample2x_nearest_is_unet_quirk(rng):
    # unet_parts.py:262-266 — the "bilinear" UNet branch actually upsamples
    # with mode='nearest'
    x = rng.rand(1, 8, 8, 4).astype(np.float32)
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
        .permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_array_equal(np.asarray(upsample2x(jnp.asarray(x), "nearest")), ref)


def test_one_hot(rng):
    ids = rng.randint(0, 5, size=(2, 4, 4))
    oh = np.asarray(one_hot(jnp.asarray(ids), 5))
    assert oh.shape == (2, 4, 4, 5)
    np.testing.assert_array_equal(oh.argmax(-1), ids)
    np.testing.assert_array_equal(oh.sum(-1), np.ones_like(ids, dtype=np.float32))


def test_rgb_codec_roundtrip(rng):
    key = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [12, 34, 56]], np.uint8)
    ids = rng.randint(0, 4, size=(3, 6, 6))
    rgb = np.asarray(ids_to_rgb(jnp.asarray(ids), key))
    back = np.asarray(rgb_to_ids(jnp.asarray(rgb), key))
    np.testing.assert_array_equal(back, ids)


def test_rgb_unknown_color_maps_to_background():
    key = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    rgb = jnp.asarray(np.full((1, 2, 2, 3), 7, np.uint8))
    np.testing.assert_array_equal(np.asarray(rgb_to_ids(rgb, key)), 0)


def test_pad_to_matches_unet_skip_alignment(rng):
    # unet_parts.py:325-330: F.pad(x, [dw//2, dw-dw//2, dh//2, dh-dh//2])
    x = rng.rand(1, 5, 6, 2).astype(np.float32)
    got = np.asarray(pad_to(jnp.asarray(x), (8, 9)))
    ref = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), [1, 2, 1, 2]).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, ref)


def test_center_pad_bbox_crop_inbounds(rng):
    arr = rng.rand(3, 10, 12).astype(np.float32)
    out = center_pad_bbox_crop(arr, (2, 3), (4, 5))
    np.testing.assert_array_equal(out, arr[:, 2:6, 3:8])


def test_center_pad_bbox_crop_out_of_bounds(rng):
    arr = rng.rand(2, 6, 6).astype(np.float32)
    out = center_pad_bbox_crop(arr, (-2, 4), (4, 4), pad_value=0.0)
    assert out.shape == (2, 4, 4)
    np.testing.assert_array_equal(out[:, :2, :], 0.0)   # rows -2,-1 padded
    np.testing.assert_array_equal(out[:, :, 2:], 0.0)   # cols 6,7 padded
    np.testing.assert_array_equal(out[:, 2:, :2], arr[:, :2, 4:6])
