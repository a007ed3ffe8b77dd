"""Jitted, mesh-sharded train/eval steps.

TPU-native equivalents of the reference's per-batch loops
(``ModelTraining.py:566-664``, ``Main_MMR_SegModel.py:641-765``):

- one XLA program per optimizer step: forward (bf16) → loss → backward →
  grad-accumulation → global-norm clip (12, ``Main_MMR_SegModel.py:724``) →
  optimizer update — no host round-trips inside the step;
- gradient accumulation as a ``lax.scan`` over microbatches inside the same
  jit (the reference steps the optimizer every ``grad_accumulate_step``
  batches, ``:718-727``; here one device step consumes
  ``micro_batch × n_accum`` samples and is mathematically equivalent:
  averaged grads, one clip, one update);
- data parallelism by sharding the batch axis of inputs over the ``data``
  mesh axis; params/optimizer state are replicated. XLA inserts the gradient
  all-reduce (SURVEY.md §2.4's TPU decision);
- per-batch metrics (loss, macro-IoU as at ``Main_MMR_SegModel.py:712``)
  computed on device, returned as scalars.

The LR is a dynamic argument (see ``optim.py``) so per-epoch schedules never
recompile. Augmentation happens inside the step (same program) when an
``AugmentConfig`` is given — HBM-resident end to end.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmr_tpu.core.mesh import DATA_AXIS
from mmr_tpu.data.augment import (AugmentConfig, augment_train_batch,
                                  augment_train_batch_u8)
from mmr_tpu.metrics.confusion import segmentation_stats
from mmr_tpu.models.factory import Preprocessing
from mmr_tpu.metrics.iou import iou_score
from mmr_tpu.train.state import TrainState


def _batch_iou(logits, masks, num_classes):
    """Per-batch macro IoU (``Main_MMR_SegModel.py:712``). The per-class
    stats are batch-summed BEFORE the nonlinear safe-divide — and, under a
    shard_map, psum'd over the data axis first, so the sharded value equals
    the global-batch value (a pmean of per-shard macro IoUs would not:
    a class absent on one shard scores zero_division=1.0 there)."""
    from mmr_tpu.core.mesh import psum_if_sharded

    preds = jnp.argmax(logits, axis=-1)
    tp, fp, fn, tn = segmentation_stats(preds, masks, num_classes)
    stats = psum_if_sharded(
        jnp.stack([tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0)]))
    return iou_score(stats[0][None], stats[1][None], stats[2][None],
                     stats[3][None], reduction="macro")


def make_train_step(
    model,
    optimizer,
    loss_fn: Callable,
    num_classes: int,
    mesh: Mesh | None = None,
    n_accum: int = 1,
    augment: AugmentConfig | Callable | None = None,
    preprocess: Callable | None = None,
    compute_iou: bool = True,
    fused_head_loss: bool | None = None,
):
    """Returns ``step(state, images, masks, lr, rng) -> (state, metrics)``.

    images: (n_accum, B, H, W, C) f32 in [0,1]; masks: (n_accum, B, H, W) int
    — one stacked microbatch per accumulation step (the reference's
    ``grad_accumulate_step`` DataLoader batches), with the **B** axis sharded
    over the data mesh so every microbatch spans all devices.

    ``fused_head_loss`` (default: auto) routes packed models with the exact
    default-semantics ``dice_ce_loss`` through the fused head+loss kernel
    (``packed_chain.fused_head_loss``): loss + per-batch macro IoU come from
    tiny in-kernel partials and the NHWC logits / d(logits) never exist.
    """
    from mmr_tpu.losses.dice_ce import dice_ce_loss as _default_dice_ce

    if fused_head_loss is None:
        fused_head_loss = (loss_fn is _default_dice_ce
                           and getattr(model, "packed", False))

    def loss_and_updates(params, batch_stats, images, masks, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if batch_stats else []
        # with_conf=False drops the in-kernel argmax/confusion tracking; the
        # reference-faithful default keeps it on (Main_MMR_SegModel.py:712
        # computes a per-batch IoU every train step)
        kw = ({"labels": masks, "with_conf": compute_iou}
              if fused_head_loss else {})
        out = model.apply(variables, images, train=True,
                          rngs={"dropout": rng}, mutable=mutable, **kw)
        res, new_stats = (out if mutable else (out, {}))
        if mutable:
            new_stats = new_stats["batch_stats"]
        if isinstance(res, dict):  # fused head+loss partials
            from mmr_tpu.ops.pallas.packed_chain import assemble_dice_ce
            loss, conf_c = assemble_dice_ce(
                res["spec"], res["stats"], res["conf"], res["n_pixels"])
            if compute_iou:
                from mmr_tpu.core.mesh import psum_if_sharded

                conf_c = psum_if_sharded(conf_c)  # global confusion under DP
                tp = jnp.diagonal(conf_c)
                fp = conf_c.sum(axis=1) - tp
                fn = conf_c.sum(axis=0) - tp
                tn = conf_c.sum() - tp - fp - fn
                iou = iou_score(tp[None], fp[None], fn[None], tn[None],
                                reduction="macro")
            else:  # honor the flag's contract in the fused branch too
                iou = jnp.float32(0)
            return loss, (new_stats, None, iou)
        loss = loss_fn(res, masks)
        iou = (_batch_iou(res, masks, num_classes) if compute_iou
               else jnp.float32(0))
        return loss, (new_stats, None, iou)

    grad_fn = jax.value_and_grad(loss_and_updates, has_aux=True)

    def step(state: TrainState, images, masks, lr, rng, in_shard_map=False):
        if in_shard_map:
            # independent per-shard randomness (augment draws, dropout)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        rngs = jax.random.split(rng, 2 * n_accum).reshape(n_accum, 2)

        def one_micro(stats, img, msk, r):
            if (img.dtype == jnp.uint8 and isinstance(augment, AugmentConfig)
                    and not augment.per_sample_spatial
                    and isinstance(preprocess, Preprocessing)):
                # uint8-native fast path: the spatial warp/crop gathers run
                # on the raw uint8 bytes and the per-channel affine
                # normalization folds in after the warp — semantically
                # identical to /255 → preprocess → augment (equivalence-
                # tested in tests/test_augment_u8.py)
                img, msk = augment_train_batch_u8(
                    r[0], img, msk, augment, preprocess.mean, preprocess.std)
            else:
                if img.dtype == jnp.uint8:  # compact transfer: k/255 floats
                    img = img.astype(jnp.float32) / 255.0
                if preprocess is not None:
                    img = preprocess(img)
                if augment is not None:
                    if isinstance(augment, AugmentConfig):
                        img, msk = augment_train_batch(r[0], img, msk, augment)
                    else:  # custom callable, e.g. the Path-A pipeline
                        img, msk = augment(r[0], img, msk)
            return grad_fn(state.params, stats, img, msk, r[1])

        if n_accum == 1:
            # no accumulation: call the microbatch directly — the scan's
            # zeros-init + add + divide passes over the full gradient tree
            # (~45 MB of pure glue traffic per step) disappear
            (loss_sum, (new_stats, _, iou_sum)), grads = one_micro(
                state.batch_stats, images[0], masks[0], rngs[0])
        else:
            def accum_body(carry, xs):
                stats, grad_sum, loss_sum, iou_sum = carry
                img, msk, r = xs
                (loss, (new_stats, _, iou)), grads = one_micro(
                    stats, img, msk, r)
                grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
                return (new_stats, grad_sum, loss_sum + loss,
                        iou_sum + iou), None

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=jnp.float32), state.params)
            (new_stats, grad_sum, loss_sum, iou_sum), _ = jax.lax.scan(
                accum_body,
                (state.batch_stats, zero_grads, jnp.float32(0),
                 jnp.float32(0)),
                (images, masks, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / n_accum, grad_sum)
        if in_shard_map:
            # DP gradient all-reduce (explicit here; GSPMD inserts it
            # implicitly on the unpacked path)
            grads = jax.lax.pmean(grads, DATA_AXIS)
        new_params, new_opt_state = optimizer.apply_updates(
            state.params, state.opt_state, grads, lr)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats,
            opt_state=new_opt_state, step=state.step + 1)
        metrics = {"loss": loss_sum / n_accum, "iou": iou_sum / n_accum}
        if in_shard_map:
            metrics = jax.lax.pmean(metrics, DATA_AXIS)
        return new_state, metrics

    if mesh is None or mesh.devices.size == 1:
        # Single-device: sharding annotations buy nothing — plain jit.
        return jax.jit(step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    shard_micro = NamedSharding(mesh, P(None, DATA_AXIS))  # (n_accum, B, ...)
    if getattr(model, "packed", False):
        # Packed models: GSPMD cannot partition the Pallas calls — run the
        # whole step under shard_map (each device executes the kernels on its
        # local batch shard; grads/metrics pmean'd, BN moments psum'd inside
        # the modules via core.mesh.all_reduce_moments → sync-BN identical to
        # the GSPMD path's global statistics).
        from jax.experimental.shard_map import shard_map

        body = functools.partial(step, in_shard_map=True)
        sm = shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(None, DATA_AXIS), P(None, DATA_AXIS), P(), P()),
            out_specs=(P(), P()),
            check_rep=False)
        return jax.jit(sm, donate_argnums=(0,))
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(repl, shard_micro, shard_micro, repl, repl),
        out_shardings=(repl, repl),
    )


def make_eval_step(
    model,
    loss_fn: Callable,
    num_classes: int,
    mesh: Mesh | None = None,
    preprocess: Callable | None = None,
    return_logits: bool = False,
):
    """Returns ``eval_step(state, images, masks) -> metrics`` (loss, macro IoU,
    per-class tp/fp/fn for streaming aggregation)."""

    def step(state: TrainState, images, masks, in_shard_map=False):
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        if preprocess is not None:
            images = preprocess(images)
        logits = model.apply(state.variables, images, train=False)
        loss = loss_fn(logits, masks)
        preds = jnp.argmax(logits, axis=-1)
        tp, fp, fn, tn = segmentation_stats(preds, masks, num_classes)
        tpc, fpc, fnc, tnc = tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0)
        if in_shard_map:
            # global per-class stats BEFORE the nonlinear IoU divide — the
            # sharded macro IoU must equal the single-device value (pmean of
            # per-shard macro IoUs would inflate classes absent on a shard
            # to zero_division=1.0)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            tpc, fpc, fnc, tnc = (jax.lax.psum(v, DATA_AXIS)
                                  for v in (tpc, fpc, fnc, tnc))
        metrics = {
            "loss": loss,
            "iou": iou_score(tpc[None], fpc[None], fnc[None], tnc[None],
                             reduction="macro"),
            "tp": tpc, "fp": fpc, "fn": fnc,
        }
        if return_logits:
            metrics["logits"] = logits
        return metrics

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(step)

    if getattr(model, "packed", False):
        # shard_map for the same reason as the train step (Pallas calls)
        from jax.experimental.shard_map import shard_map

        out_specs = {"loss": P(), "iou": P(), "tp": P(), "fp": P(),
                     "fn": P()}
        if return_logits:
            out_specs["logits"] = P(DATA_AXIS)
        sm = shard_map(functools.partial(step, in_shard_map=True), mesh=mesh,
                       in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                       out_specs=out_specs, check_rep=False)
        return jax.jit(sm)

    repl = NamedSharding(mesh, P())
    shard_b = NamedSharding(mesh, P(DATA_AXIS))
    out_sh = repl if not return_logits else None
    return jax.jit(step, in_shardings=(repl, shard_b, shard_b),
                   out_shardings=out_sh)
