"""Golden-value regression tests (fixed seeds, tiny arrays — SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from mmr_tpu.losses import dice_loss, cross_entropy_loss, dice_ce_loss
from mmr_tpu.models.encoders.resnet import ResNetEncoder


def test_loss_golden_values():
    """Deterministic loss values for a fixed tiny input — catches silent
    semantic drift in the loss definitions."""
    rng = np.random.RandomState(42)
    logits = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 3, (1, 4, 4)))
    np.testing.assert_allclose(float(dice_loss(logits, target)),
                               0.6544225, rtol=1e-5)
    np.testing.assert_allclose(float(cross_entropy_loss(logits, target)),
                               1.3383371, rtol=1e-5)
    np.testing.assert_allclose(float(dice_ce_loss(logits, target)),
                               2.0770030, rtol=1e-5)


def test_resnet18_encoder_param_count():
    """Matches torchvision resnet18 minus fc/avgpool: 11,176,512 params."""
    enc = ResNetEncoder(stage_sizes=(2, 2, 2, 2), dtype=jnp.float32)
    vs = enc.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(vs["params"]))
    assert n == 11_176_512


def test_flagship_param_count_exact():
    """Default UNet++/MobileNetV3 must be smp-exact: 3,714,090 params
    (`MMR_EN:DE_CODER/README.md` architecture summary; model built at
    ``Main_MMR_SegModel.py:589``)."""
    from mmr_tpu.models import create_model

    m, _ = create_model("UnetPlusPlus", encoder_name="tu-mobilenetv3_small_100",
                        classes=10, dtype=jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)),
                train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(vs["params"]))
    assert n == 3_714_090, n


def test_smp_decoder_block_plan_golden():
    """Block-by-block params of the smp UnetPlusPlusDecoder plan vs the
    torchinfo table in `MMR_EN:DE_CODER/README.md` (DecoderBlock rows)."""
    from mmr_tpu.models.decoders import smp_unetpp_plan

    plan = smp_unetpp_plan((16, 16, 24, 48, 576), (256, 128, 64, 32, 16))
    count = {k: 9 * (i + s) * o + 2 * o + 9 * o * o + 2 * o
             for k, (i, s, o) in plan.items()}
    assert count[(0, 0)] == 2_028_544
    assert count[(1, 1)] == 20_832
    assert count[(2, 2)] == 8_128
    assert count[(3, 3)] == 6_976
    assert count[(0, 1)] == 498_176
    assert count[(1, 2)] == 10_432
    assert count[(2, 3)] == 9_280
    assert count[(0, 2)] == 138_496
    assert count[(1, 3)] == 11_584
    assert count[(0, 3)] == 46_208
    assert count[(0, 4)] == 6_976
    assert sum(count.values()) == 2_785_632
