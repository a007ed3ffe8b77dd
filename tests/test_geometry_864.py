"""Geometry smoke at the reference's big-patch regime: 864×1280.

PKG-INFO Examples 2–3 (`MMR_EN:DE_CODER/MMR_Segmentation.egg-info/PKG-INFO`)
train at patch size 864×1280 — the two configs behind the reference's best
published results (82.38% / 83.55% test mIoU). These tests run the packed
engine at that exact geometry on the CPU interpreter (VERDICT r3 'do this'
#6): the decoder rows land at 864×1280 … 54×80, which exercises packing
factors and row-tile heights (h=108, h=54; w=160 → p=4, w=80 → p=2) that no
other test reaches.

Heavy by necessity (one full-geometry compile each) — marked slow.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mmr_tpu.ops.pallas.packed_chain as pc

HW = (864, 1280)
CLASSES = 10


@pytest.fixture(autouse=True)
def interpret(monkeypatch):
    monkeypatch.setattr(pc, "_INTERPRET", True)


def _models():
    from mmr_tpu.models.decoders import UnetPlusPlusModel

    kw = dict(num_classes=CLASSES, encoder_name="tu-mobilenetv3_small_100")
    return (UnetPlusPlusModel(**kw, packed=False),
            UnetPlusPlusModel(**kw, packed=True, packed_frontend=True))


@pytest.mark.slow
def test_forward_equivalence_864x1280(rng):
    """Packed(+frontend) forward == XLA forward at the 864×1280 patch —
    catches any silently-wrong packing geometry (not just crashes)."""
    std, pk = _models()
    x = jnp.asarray(rng.rand(1, *HW, 3).astype(np.float32))
    variables = std.init(jax.random.key(0),
                         jnp.zeros((1, 128, 128, 3), jnp.float32),
                         train=False)
    y_std = np.asarray(std.apply(variables, x, train=False))
    y_pk = np.asarray(pk.apply(variables, x, train=False))
    agree = (y_pk.argmax(-1) == y_std.argmax(-1)).mean()
    assert agree > 0.99, f"argmax agreement {agree:.4f} at {HW}"


@pytest.mark.slow
def test_packed_train_step_864x1280(rng):
    """The full production train step (augment → packed fwd → DiceCE → bwd →
    clip → AdamW) runs at 864×1280 and produces a finite loss — the backward
    geometry (row tiles, tap folds) at the reference's big-patch regime."""
    from mmr_tpu.core.mesh import create_mesh, shard_batch
    from mmr_tpu.data.augment import AugmentConfig
    from mmr_tpu.losses import dice_ce_loss
    from mmr_tpu.models.factory import get_preprocessing
    from mmr_tpu.train.optim import build_optimizer
    from mmr_tpu.train.state import TrainState
    from mmr_tpu.train.steps import make_train_step

    _, model = _models()
    mesh = create_mesh(devices=np.array(jax.devices()[:1]))
    pre = get_preprocessing("tu-mobilenetv3_small_100")
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 128, 128, 3), jnp.float32),
                           train=False)
    optimizer = build_optimizer("adamw", clip_grad_norm=12.0,
                                weight_decay=1e-4)
    state = TrainState.create(variables, optimizer)
    step = make_train_step(model, optimizer, dice_ce_loss, CLASSES,
                           mesh=mesh, n_accum=1,
                           augment=AugmentConfig(patch_size=HW),
                           preprocess=pre)
    imgs = rng.randint(0, 256, (1, 1, *HW, 3)).astype(np.uint8)
    masks = rng.randint(0, CLASSES, (1, 1, *HW)).astype(np.uint8)
    d_imgs, d_masks = shard_batch(mesh, (imgs, masks), axis=1)
    state, met = step(state, d_imgs, d_masks, jnp.float32(1e-4),
                      jax.random.key(0))
    assert np.isfinite(float(np.asarray(met["loss"])))
    assert int(state.step) == 1


@pytest.mark.slow
def test_sliding_window_864x1280_roi(rng):
    """Full-HD sliding window with the Examples-2/3 roi (864×1280, ov 0.5 →
    a 2×2 window grid on 1080×1920) through the packed model."""
    from mmr_tpu.infer.sliding_window import make_sliding_window_fn

    _, pk = _models()
    variables = pk.init(jax.random.key(0),
                        jnp.zeros((1, 128, 128, 3), jnp.float32),
                        train=False)
    run = make_sliding_window_fn(pk, variables, roi=HW,
                                 num_classes=CLASSES, sw_batch_size=4)
    frames = jnp.asarray(rng.rand(1, 1080, 1920, 3).astype(np.float32))
    out = np.asarray(run(frames))
    assert out.shape == (1, 1080, 1920, CLASSES)
    assert np.isfinite(out).all()
