"""Training-dynamics parity vs a torch oracle (VERDICT r2 missing #3).

From ONE imported init, run N full train steps (f32, no augmentation, fixed
data) in our engine and in an independently-written torch loop implementing
the reference's exact step semantics — smp-exact UNet++ forward, MONAI
DiceCELoss(softmax=True), grad clip 12, AdamW — and assert the loss
trajectories and parameter updates agree. This is the evidence that
backward/BatchNorm/optimizer semantics (not just forward argmax) match the
reference (``Main_MMR_SegModel.py:696-727``; its committed loss trajectory
artifact is ``MMR_EN:DE_CODER/loss_dict.pkl``).

Known, negligible divergence: torch BatchNorm stores the UNBIASED variance in
``running_var`` while flax stores the biased one — a (n/(n-1) − 1) ≈ 2e-4
relative difference at these pixel counts; running stats do not enter the
train-mode forward, so trajectories are unaffected.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from mmr_tpu.losses.dice_ce import dice_ce_loss
from mmr_tpu.models.decoders import UnetPlusPlusModel
from mmr_tpu.models.pretrained import import_smp_unetpp_state_dict
from mmr_tpu.train.optim import build_optimizer
from mmr_tpu.train.state import TrainState
from mmr_tpu.train.steps import make_train_step

from tests.test_models import _TorchSmpUnetPP

F32 = jnp.float32
N_STEPS = 8
LR = 1e-4
WD = 1e-2
CLASSES = 6


def _dice_ce_torch(logits, target):
    """MONAI DiceCELoss(softmax=True) semantics, independent torch impl."""
    probs = logits.softmax(1)
    tgt = tF.one_hot(target, CLASSES).permute(0, 3, 1, 2).float()
    inter = (probs * tgt).sum((2, 3))
    denom = probs.sum((2, 3)) + tgt.sum((2, 3))
    dice = 1.0 - (2.0 * inter + 1e-5) / (denom + 1e-5)
    return dice.mean() + tF.cross_entropy(logits, target)


def test_train_dynamics_parity(rng):
    torch.manual_seed(11)
    oracle = _TorchSmpUnetPP(num_classes=CLASSES)
    for m in oracle.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    sd = {k: v.clone() for k, v in oracle.state_dict().items()}
    params0, stats0 = import_smp_unetpp_state_dict(sd, "resnet18")

    xs = [rng.rand(2, 64, 64, 3).astype(np.float32) for _ in range(2)]
    ys = [rng.randint(0, CLASSES, (2, 64, 64)).astype(np.int32)
          for _ in range(2)]

    # ---- torch loop: fwd → DiceCE → bwd → clip(12) → AdamW ----
    oracle.train()
    opt = torch.optim.AdamW(oracle.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    torch_losses = []
    for i in range(N_STEPS):
        x = torch.from_numpy(xs[i % 2]).permute(0, 3, 1, 2)
        y = torch.from_numpy(ys[i % 2]).long()
        logits = oracle(x)
        loss = _dice_ce_torch(logits, y)
        opt.zero_grad()
        loss.backward()
        tnn.utils.clip_grad_norm_(oracle.parameters(), 12.0)
        opt.step()
        torch_losses.append(float(loss))

    # ---- our engine: identical init, same step semantics ----
    model = UnetPlusPlusModel(num_classes=CLASSES, encoder_name="resnet18",
                              dtype=F32)
    optimizer = build_optimizer("adamw", clip_grad_norm=12.0,
                                weight_decay=WD)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params0),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats0)}
    state = TrainState.create(variables, optimizer)
    step = make_train_step(model, optimizer, dice_ce_loss, CLASSES,
                           mesh=None, n_accum=1, compute_iou=False)
    our_losses = []
    for i in range(N_STEPS):
        state, metrics = step(
            state, jnp.asarray(xs[i % 2])[None], jnp.asarray(ys[i % 2])[None],
            jnp.float32(LR), jax.random.key(0))
        our_losses.append(float(metrics["loss"]))

    # loss trajectories track step by step
    np.testing.assert_allclose(our_losses, torch_losses, rtol=5e-3)
    # the trajectories actually went somewhere (not a frozen model)
    assert torch_losses[-1] < torch_losses[0]

    # ---- backward semantics: step-1 gradients agree leaf by leaf ----
    # (the tight check — Adam-normalized *updates* amplify f32 forward noise
    # ~200x on small-|g| elements, see below)
    oracle2 = _TorchSmpUnetPP(num_classes=CLASSES)
    oracle2.load_state_dict(sd)
    oracle2.train()
    logits2 = oracle2(torch.from_numpy(xs[0]).permute(0, 3, 1, 2))
    loss2 = _dice_ce_torch(logits2, torch.from_numpy(ys[0]).long())
    loss2.backward()
    gsd = dict(sd)
    for k, p in oracle2.named_parameters():
        gsd[k] = p.grad.detach().clone()
    g_t, _ = import_smp_unetpp_state_dict(gsd, "resnet18")

    model0 = UnetPlusPlusModel(num_classes=CLASSES, encoder_name="resnet18",
                               dtype=F32)

    def loss_fn(params):
        out, _ = model0.apply(
            {"params": params,
             "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats0)},
            jnp.asarray(xs[0]), train=True, mutable=["batch_stats"])
        return dice_ce_loss(out, jnp.asarray(ys[0]))

    g_o = jax.grad(loss_fn)(jax.tree_util.tree_map(jnp.asarray, params0))

    def key_of(path):
        return tuple(getattr(p, "key", None) for p in path)

    gt_by = {key_of(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g_t)}
    for path, go in jax.tree_util.tree_leaves_with_path(g_o):
        k = key_of(path)
        gt = np.asarray(gt_by[k], np.float64)
        go = np.asarray(go, np.float64)
        rel = np.linalg.norm(go - gt) / (np.linalg.norm(gt) + 1e-12)
        assert rel < 1e-2, (k, float(rel))

    # parameter UPDATES (p_final − p_init) agree leaf by leaf
    params_t, _ = import_smp_unetpp_state_dict(
        {k: v.detach().clone() for k, v in oracle.state_dict().items()},
        "resnet18")
    flat0 = jax.tree_util.tree_leaves_with_path(params0)
    ours_by_key = {key_of(p): v
                   for p, v in jax.tree_util.tree_leaves_with_path(state.params)}
    t_by_key = {key_of(p): v
                for p, v in jax.tree_util.tree_leaves_with_path(params_t)}
    bad = []
    for path, p0 in flat0:
        k = key_of(path)
        d_t = np.asarray(t_by_key[k], np.float64) - np.asarray(p0, np.float64)
        d_o = np.asarray(ours_by_key[k], np.float64) - np.asarray(p0, np.float64)
        denom = np.linalg.norm(d_t) + 1e-12
        rel = np.linalg.norm(d_o - d_t) / denom
        # Adam's per-element normalization m/(sqrt(v)+eps) makes the UPDATE
        # direction sign-like wherever |g| is small, so the ~1e-3 f32
        # forward-noise between the two frameworks (measured: step-1
        # gradients agree to <1e-2, most <1e-3 — asserted above) partially
        # decorrelates those elements; the per-leaf update deviation after
        # N steps is therefore bounded loosely. A torch-vs-torch rerun with
        # epsilon-perturbed inputs shows the same ~0.2 spread.
        if rel > 0.5:
            bad.append((k, float(rel)))
    assert not bad, bad[:10]
