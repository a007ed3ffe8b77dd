"""Multi-device (emulated 8-chip CPU mesh) coverage: sharded sliding-window
inference and the driver's dryrun entry."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

from mmr_tpu.core.mesh import create_mesh, shard_batch
from mmr_tpu.infer.sliding_window import make_sliding_window_fn


class Tiny(nn.Module):
    classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(self.classes, (3, 3), padding=[(1, 1), (1, 1)])(x).astype(jnp.float32)


def test_sliding_window_sharded_matches_single(rng):
    mesh = create_mesh()
    assert mesh.devices.size == 8
    model = Tiny()
    vs = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    frames = rng.rand(8, 40, 48, 3).astype(np.float32)

    sw_single = make_sliding_window_fn(model, vs, (16, 16), 3, sw_batch_size=4)
    sw_sharded = make_sliding_window_fn(model, vs, (16, 16), 3, sw_batch_size=4,
                                        mesh=mesh)
    ref = np.asarray(sw_single(jnp.asarray(frames)))
    got = np.asarray(sw_sharded(shard_batch(mesh, frames)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally


def test_packed_train_step_sharded_matches_single(rng, monkeypatch):
    """The PACKED flagship train step (Pallas kernels, fused head+loss) on an
    8-device data-parallel mesh via shard_map == the single-device step:
    same loss/IoU metrics and updated params (VERDICT r2 item 2 — the benched
    configuration's multi-device correctness). BN moments psum (sync-BN),
    gradient pmean, interpret-mode kernels on the CPU mesh."""
    import mmr_tpu.ops.pallas.packed_chain as pc
    from mmr_tpu.losses import dice_ce_loss
    from mmr_tpu.models import create_model
    from mmr_tpu.train.optim import build_optimizer
    from mmr_tpu.train.state import TrainState
    from mmr_tpu.train.steps import make_train_step

    monkeypatch.setattr(pc, "_INTERPRET", True)
    mesh = create_mesh()
    assert mesh.devices.size == 8
    classes, hw, batch = 4, (64, 128), 8

    model, _ = create_model("UnetPlusPlus",
                            encoder_name="tu-mobilenetv3_small_100",
                            classes=classes, packed=True)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, *hw, 3), jnp.float32), train=False)
    optimizer = build_optimizer("adamw", clip_grad_norm=12.0,
                                weight_decay=1e-4)

    imgs = jnp.asarray(rng.rand(1, batch, *hw, 3).astype(np.float32))
    masks = jnp.asarray(rng.randint(0, classes, (1, batch, *hw)))

    # both states up front — the steps donate their state argument
    s1 = TrainState.create(jax.tree_util.tree_map(jnp.array, variables),
                           optimizer)
    s8 = TrainState.create(jax.tree_util.tree_map(jnp.array, variables),
                           optimizer)

    step_1 = make_train_step(model, optimizer, dice_ce_loss, classes,
                             mesh=None, n_accum=1)
    s1, m1 = step_1(s1, imgs, masks, jnp.float32(1e-3), jax.random.key(7))

    step_8 = make_train_step(model, optimizer, dice_ce_loss, classes,
                             mesh=mesh, n_accum=1)
    d_imgs, d_masks = shard_batch(mesh, (np.asarray(imgs), np.asarray(masks)),
                                  axis=1)
    s8, m8 = step_8(s8, d_imgs, d_masks, jnp.float32(1e-3), jax.random.key(7))

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=2e-3)
    # macro-IoU is argmax-derived — at random init a handful of knife-edge
    # pixels flip under the different (but equally valid) reduction order
    np.testing.assert_allclose(float(m8["iou"]), float(m1["iou"]), rtol=5e-2)
    # updated params identical up to reduction order
    for a, b in zip(jax.tree_util.tree_leaves(s8.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-3, rtol=5e-3)
    # BN running stats identical (sync-BN == global single-device stats)
    for a, b in zip(jax.tree_util.tree_leaves(s8.batch_stats),
                    jax.tree_util.tree_leaves(s1.batch_stats)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-3, rtol=1e-2)
