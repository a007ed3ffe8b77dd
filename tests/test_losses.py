"""Loss tests: closed-form cases + torch oracles (torch is CPU-only here and
used purely as a test oracle, never in the framework)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from mmr_tpu.losses import dice_loss, cross_entropy_loss, dice_ce_loss, blended_ce_dice_loss


def _torch_dice_reference(logits_nchw, target, eps=1.0, ignore_index=None):
    """Literal re-derivation of dice_loss.py:96-161 semantics."""
    input_soft = F.softmax(logits_nchw, dim=1)
    n_cls = logits_nchw.shape[1]
    t = F.one_hot(target.long(), n_cls).permute(0, 3, 1, 2).to(input_soft.dtype)
    if ignore_index is not None:
        input_soft = input_soft[:, :ignore_index]
        t = t[:, :ignore_index]
    dims = (2, 3)
    inter = torch.sum(input_soft * t, dims)
    card = torch.sum(input_soft + t, dims)
    dice = (2.0 * inter + eps) / (card + eps)
    return torch.mean(-dice + 1.0).item()


def test_dice_matches_reference_semantics(rng):
    logits = rng.randn(2, 8, 8, 5).astype(np.float32)
    target = rng.randint(0, 5, size=(2, 8, 8))
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    ref = _torch_dice_reference(torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(target))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_dice_ignore_index_truncates_classes(rng):
    logits = rng.randn(2, 8, 8, 5).astype(np.float32)
    target = rng.randint(0, 5, size=(2, 8, 8))
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(target), ignore_index=3))
    ref = _torch_dice_reference(
        torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(target), ignore_index=3
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_dice_perfect_prediction_low_loss():
    target = np.zeros((1, 16, 16), np.int32)
    target[:, :8] = 1
    logits = np.asarray(jnp.asarray(
        np.eye(2, dtype=np.float32)[target] * 50.0
    ))
    loss = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert loss < 0.01


def test_cross_entropy_matches_torch(rng):
    logits = rng.randn(3, 6, 6, 4).astype(np.float32)
    target = rng.randint(0, 4, size=(3, 6, 6))
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target)))
    ref = F.cross_entropy(torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(target).long()).item()
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_cross_entropy_ignore_index(rng):
    logits = rng.randn(2, 4, 4, 3).astype(np.float32)
    target = rng.randint(0, 3, size=(2, 4, 4))
    target[0, :2] = 255
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target), ignore_index=255))
    ref = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(target).long(), ignore_index=255
    ).item()
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_blended_loss_factor():
    """f=0 → pure CE; f=-1 → pure CE (disabled); ModelTraining.py:594-603."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 3, size=(1, 4, 4)))
    ce = float(cross_entropy_loss(logits, target))
    np.testing.assert_allclose(float(blended_ce_dice_loss(logits, target, 0.0)), ce, rtol=1e-6)
    np.testing.assert_allclose(float(blended_ce_dice_loss(logits, target, -1)), ce, rtol=1e-6)
    d = float(dice_loss(logits, target))
    np.testing.assert_allclose(
        float(blended_ce_dice_loss(logits, target, 0.5)), 0.5 * d + 0.5 * ce, rtol=1e-6
    )


def test_dice_ce_decreases_with_quality(rng):
    target = rng.randint(0, 3, size=(2, 8, 8))
    good = np.eye(3, dtype=np.float32)[target] * 10.0
    bad = rng.randn(2, 8, 8, 3).astype(np.float32)
    lg = float(dice_ce_loss(jnp.asarray(good), jnp.asarray(target)))
    lb = float(dice_ce_loss(jnp.asarray(bad), jnp.asarray(target)))
    assert lg < lb


def test_dice_ce_matches_monai_formula(rng):
    """Hand-computed MONAI DiceCELoss(softmax=True) on a tiny case."""
    logits = rng.randn(1, 2, 2, 2).astype(np.float32)
    target = np.array([[[0, 1], [1, 0]]])
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    probs = F.softmax(lt, 1)
    t = F.one_hot(torch.from_numpy(target).long(), 2).permute(0, 3, 1, 2).float()
    inter = (probs * t).sum((2, 3))
    denom = probs.sum((2, 3)) + t.sum((2, 3))
    dice = 1 - (2 * inter + 1e-5) / (denom + 1e-5)
    ce = F.cross_entropy(lt, torch.from_numpy(target).long())
    ref = dice.mean().item() + ce.item()
    got = float(dice_ce_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
