"""uint8-native augmentation path (``augment_train_batch_u8``) equivalence
vs the f32 reference path: same key → same randomness (shared 26-key stream),
warp-on-u8 + normalize-after == normalize + warp-on-f32 (per-channel affine
commutes; OOB cval=0 reconstructed from the in-bounds weight-sum map).

Reference semantics anchor: nnU-Net SpatialTransform on z-scored data with
border_mode_data='constant' (``Pre_Process.py:278-463``)."""

import numpy as np
import jax
import jax.numpy as jnp

from mmr_tpu.data.augment import (AugmentConfig, augment_train_batch,
                                  augment_train_batch_u8)
from mmr_tpu.models.factory import Preprocessing

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _data(b=4, ih=96, iw=128, c=3, seed=3):
    rng = np.random.RandomState(seed)
    img_u8 = rng.randint(0, 256, (b, ih, iw, c)).astype(np.uint8)
    masks = rng.randint(0, 10, (b, ih, iw)).astype(np.int32)
    return img_u8, masks


def _both(key, cfg, img_u8, masks):
    pre = Preprocessing(MEAN, STD)
    img_f = jnp.asarray(img_u8.astype(np.float32) / 255.0)
    ref_i, ref_m = augment_train_batch(key, pre(img_f), jnp.asarray(masks),
                                       cfg)
    new_i, new_m = augment_train_batch_u8(
        key, jnp.asarray(img_u8), jnp.asarray(masks.astype(np.uint8)), cfg,
        MEAN, STD)
    return (np.asarray(ref_i, np.float32), np.asarray(ref_m),
            np.asarray(new_i, np.float32), np.asarray(new_m))


def test_spatial_only_equivalence_both_branches():
    """Rotation/scaling/mirror only (intensity off): images agree to bf16
    sampling tolerance, masks agree exactly — across keys covering both the
    warp-fired and identity-crop branches. patch == input size forces
    out-of-bounds corners under rotation (exercises the weight-sum map)."""
    img_u8, masks = _data()
    cfg = AugmentConfig(patch_size=(96, 128), heavy=True,
                        gaussian_noise=False, gaussian_blur=False,
                        brightness=False, contrast=False,
                        low_resolution=False, gamma=False)
    fired = ident = 0
    for k in range(12):
        key = jax.random.key(k)
        ref_i, ref_m, new_i, new_m = _both(key, cfg, img_u8, masks)
        np.testing.assert_array_equal(ref_m.astype(np.int32),
                                      new_m.astype(np.int32))
        err = np.abs(ref_i - new_i)
        assert err.max() < 0.08, (k, err.max())
        assert err.mean() < 0.01, (k, err.mean())
        # replay the draw stream to know which cond branch ran
        ks = jax.random.split(key, 26)
        if bool(jax.random.bernoulli(ks[0], 0.2)) or \
                bool(jax.random.bernoulli(ks[2], 0.2)):
            fired += 1
        else:
            ident += 1
    assert fired >= 2 and ident >= 2, (fired, ident)


def test_full_chain_equivalence():
    """Full intensity chain + mirror: both paths share the bf16 chain code,
    so outputs track within accumulated-bf16 tolerance."""
    img_u8, masks = _data(seed=11)
    cfg = AugmentConfig(patch_size=(64, 96))
    for k in (0, 5):
        key = jax.random.key(k)
        ref_i, ref_m, new_i, new_m = _both(key, cfg, img_u8, masks)
        np.testing.assert_array_equal(ref_m.astype(np.int32),
                                      new_m.astype(np.int32))
        err = np.abs(ref_i - new_i)
        assert err.mean() < 0.02, (k, err.mean())
        assert np.quantile(err, 0.999) < 0.2, (k, np.quantile(err, 0.999))


def test_u8_mask_dtype_and_range():
    img_u8, masks = _data()
    cfg = AugmentConfig(patch_size=(64, 64))
    out_i, out_m = augment_train_batch_u8(
        jax.random.key(1), jnp.asarray(img_u8),
        jnp.asarray(masks.astype(np.uint8)), cfg, MEAN, STD)
    assert out_m.dtype == jnp.uint8
    assert out_i.dtype == jnp.bfloat16
    assert int(jnp.max(out_m)) <= 9


def test_train_step_uint8_fast_path(rng):
    """make_train_step takes the u8 route end-to-end (uint8 images+masks,
    Preprocessing, AugmentConfig) and trains a TinySeg net."""
    from mmr_tpu.losses import dice_ce_loss
    from mmr_tpu.train.optim import build_optimizer
    from mmr_tpu.train.state import TrainState
    from mmr_tpu.train.steps import make_train_step
    from tests.test_train import TinySeg

    model = TinySeg()
    imgs = rng.randint(0, 256, (2, 4, 32, 32, 3)).astype(np.uint8)
    masks_u8 = rng.randint(0, 3, (2, 4, 32, 32)).astype(np.uint8)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3)), train=True)
    opt = build_optimizer("adamw")
    state = TrainState.create(variables, opt)
    step = make_train_step(
        model, opt, dice_ce_loss, 3, n_accum=2,
        augment=AugmentConfig(patch_size=(32, 32), heavy=False),
        preprocess=Preprocessing(MEAN, STD))
    state, metrics = step(state, jnp.asarray(imgs), jnp.asarray(masks_u8),
                          jnp.float32(1e-3), jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
