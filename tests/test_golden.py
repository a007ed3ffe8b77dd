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


def test_flagship_param_count_regime():
    """Default UNet++/MobileNetV3 lands in the reference's ~3.7M regime
    (exact reference count 3,714,090; ours differs by decoder plan details)."""
    from mmr_tpu.models import create_model

    m, _ = create_model("UnetPlusPlus", encoder_name="tu-mobilenetv3_small_100",
                        classes=10, dtype=jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)),
                train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(vs["params"]))
    assert 2_500_000 < n < 5_000_000, n
