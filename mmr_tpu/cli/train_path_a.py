"""Path-A argparse trainer — the ``ModelTraining.py`` surface rebuilt.

Same flag names as the reference CLI (``ModelTraining.py:59-133``; canonical
values in ``ConfigModelUnetPlus/train_sarrarp50.sh:4-28``): model zoo strings
(``segnet | unet | resnet18 | resnet34 | smp_UNet++ | smp_unet18 |
smp_DeepLabV3+ | smp_MANet``), CE+Dice blended loss (``--dice_loss_factor``),
Adam/AdamW/SGD (+``--differential_lr``), StepLR (``--lr_steps``,
``--step_gamma``), best-F1 checkpointing, heavy metrics (binary dice +
Hausdorff) on epoch 1 and every 25th (``ModelTraining.py:420-444,622-654``),
loss/accuracy curve PNGs and final-epoch sample triptychs.

Example:
    python -m mmr_tpu.cli.train_path_a --data_dir <root> --dataset sarrarp50 \
        --model smp_UNet++ --epochs 20 --trainBatchSize 8 --lr 1e-3 \
        --optimizer Adam --wd 1e-5 --dice_loss_factor 0.5 \
        --resizedHeight 256 --resizedWidth 256 --save_dir runs/a
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="MMR-TPU Path-A trainer")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--json_path", type=str, default="",
                   help="class-definition JSON (defaults to built-in sarrarp50)")
    p.add_argument("--dataset", type=str, default="sarrarp50")
    p.add_argument("--model", type=str, default="segnet")
    p.add_argument("--batchnorm_momentum", type=float, default=0.1)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--start-epoch", dest="start_epoch", type=int, default=0)
    p.add_argument("--trainBatchSize", type=int, default=8)
    p.add_argument("--valBatchSize", type=int, default=4)
    p.add_argument("--lr", "--learning-rate", type=float, default=1e-3)
    p.add_argument("--optimizer", type=str, default="Adam")
    p.add_argument("--wd", type=float, default=1e-5)
    p.add_argument("--dice_loss_factor", type=float, default=0.5)
    p.add_argument("--lr_steps", type=int, default=2)
    p.add_argument("--step_gamma", type=float, default=0.1)
    p.add_argument("--resnetModel", type=int, default=18)
    p.add_argument("--differential_lr", type=str, default="False")
    p.add_argument("--resizedHeight", type=int, default=256)
    p.add_argument("--resizedWidth", type=int, default=256)
    p.add_argument("--cropSize", type=int, default=256)
    p.add_argument("--display_samples", type=str, default="False")
    p.add_argument("--save_samples", type=str, default="True")
    p.add_argument("--full_res_validation", type=str, default="False")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--save_dir", type=str, default="save_temp")
    p.add_argument("--seed", type=int, default=6210)
    p.add_argument("--heavy_metric_interval", type=int, default=25)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mmr_tpu.core.mesh import create_mesh, shard_batch
    from mmr_tpu.core.prng import RngStream, seed_everything
    from mmr_tpu.data.augment import augment_path_a_batch
    from mmr_tpu.data.classes import load_class_json, sarrarp50_key, sarrarp50_names
    from mmr_tpu.data.png_dataset import PngFolderDataset
    from mmr_tpu.losses import blended_ce_dice_loss
    from mmr_tpu.metrics.evaluate import Evaluate
    from mmr_tpu.metrics.dice import binary_dice
    from mmr_tpu.metrics.hausdorff import capped_hausdorff
    from mmr_tpu.models import create_model
    from mmr_tpu.monitor import get_logger, save_losses, save_accuracy_curves, save_triptychs
    from mmr_tpu.train.checkpoint import CheckpointManager
    from mmr_tpu.train.optim import build_optimizer
    from mmr_tpu.train.schedules import step_lr
    from mmr_tpu.train.state import TrainState
    from mmr_tpu.train.steps import make_train_step, make_eval_step

    strbool = lambda s: str(s).lower() in ("true", "1", "yes")
    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    logger = get_logger(save_dir)
    root_key = seed_everything(args.seed)
    rng = RngStream(root_key)

    if args.json_path:
        key, names = load_class_json(args.json_path)
    else:
        key, names = sarrarp50_key(), sarrarp50_names()
    num_classes = len(key)
    logger.info(f"{num_classes} classes: {names}")

    hw = (args.resizedHeight, args.resizedWidth)
    train_ds = PngFolderDataset(args.data_dir, "train", hw, args.cropSize, num_classes)
    val_split = "val" if (Path(args.data_dir) / "val").is_dir() else "test"
    val_ds = PngFolderDataset(args.data_dir, val_split, hw, args.cropSize, num_classes,
                              full_res=strbool(args.full_res_validation))
    logger.info(f"train {len(train_ds)} images, {val_split} {len(val_ds)} images")

    arch = args.model if args.model.lower() not in ("resnet18", "resnet34") \
        else f"resnet{args.resnetModel}"
    # segnet's baked softmax (segnet.py:220) stays off for CE training —
    # that is the factory's training default
    model, _ = create_model(arch, classes=num_classes)
    mesh = create_mesh()
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init({"params": rng.named("init"),
                                "dropout": rng.named("drop")},
                               jnp.zeros((1, *hw, 3), jnp.float32), train=False)
    optimizer = build_optimizer(
        args.optimizer, differential_lr=strbool(args.differential_lr),
        weight_decay=args.wd,
        momentum=0.9 if args.optimizer.lower() == "sgd" else 0.0)
    state = TrainState.create(jax.tree_util.tree_map(jnp.asarray, variables), optimizer)
    sched = step_lr(args.lr, args.epochs, args.lr_steps, args.step_gamma)
    loss_fn = functools.partial(blended_ce_dice_loss,
                                dice_loss_factor=args.dice_loss_factor)
    train_step = make_train_step(model, optimizer, loss_fn, num_classes,
                                 mesh=mesh, n_accum=1,
                                 augment=augment_path_a_batch_wrapper())
    eval_step = make_eval_step(model, loss_fn, num_classes, mesh=mesh)
    predict = jax.jit(lambda variables, x: jnp.argmax(
        model.apply(variables, x, train=False), -1))
    ckpts = CheckpointManager(save_dir / "checkpoints")

    if args.resume:
        # Path-A resume semantics (ModelTraining.py:308-337): --resume is a
        # checkpoint *path* (possibly from a different run — the
        # transfer-learning use case); weights load tolerantly, the
        # classification head keeps its fresh init (the reference keeps
        # conv_last from the current model), and start_epoch adopts the
        # checkpoint's stored epoch unless the user set --start-epoch.
        from mmr_tpu.train.checkpoint import load_checkpoint_path

        try:
            state, meta = load_checkpoint_path(args.resume, state)
        except FileNotFoundError:
            print(f"=> no checkpoint found at '{args.resume}'")
            meta = None
        if meta is not None:
            logger.info(f"=> loaded checkpoint '{args.resume}' "
                        f"(epoch {meta.get('epoch', '?')})")
            if meta.get("skipped"):
                logger.info(f"   skipped {len(meta['skipped'])} non-matching "
                            f"entries: {meta['skipped'][:5]}...")
            if args.start_epoch == 0 and meta.get("epoch"):
                args.start_epoch = int(meta["epoch"])
            fresh = model.init({"params": rng.named("reinit")},
                               jnp.zeros((1, *hw, 3), jnp.float32), train=False)
            params = jax.device_get(state.params)
            for head in ("outc", "conv_last", "head", "dec5"):
                if head in params:
                    params[head] = jax.device_get(fresh["params"])[head]
                    logger.info(f"re-initialized head {head!r} for resume")
            state = state.replace(
                params=jax.tree_util.tree_map(jnp.asarray, params))

    history = {"epoch": [], "train_loss": [], "val_loss": [],
               "train_iou": [], "val_iou": []}
    for epoch in range(args.start_epoch + 1, args.epochs + 1):
        lr = sched(epoch - 1)
        tr_losses, tr_ious = [], []
        for i, (imgs, masks) in enumerate(
                train_ds.epoch(args.trainBatchSize, seed=args.seed + epoch)):
            b_img, b_msk = shard_batch(mesh, (imgs[None], masks[None]), axis=1)
            state, met = train_step(state, b_img, b_msk, jnp.float32(lr),
                                    rng.step("train", epoch, i))
            tr_losses.append(met["loss"])
            tr_ious.append(met["iou"])

        ev = Evaluate(num_classes)
        va_losses = []
        last_batch = None
        for imgs, masks in val_ds.epoch(args.valBatchSize, shuffle=False):
            b_img, b_msk = shard_batch(mesh, (imgs, masks))
            met = eval_step(state, b_img, b_msk)
            va_losses.append(float(met["loss"]))
            ev.tp += np.asarray(met["tp"], np.float64)
            ev.fp += np.asarray(met["fp"], np.float64)
            ev.fn += np.asarray(met["fn"], np.float64)
            last_batch = (imgs, masks)

        per_class_iou, miou = ev.iou()
        p, r, f1 = ev.precision_recall_f1()
        tl = float(np.mean([float(x) for x in tr_losses]))
        vl = float(np.mean(va_losses))
        history["epoch"].append(epoch)
        history["train_loss"].append(tl)
        history["val_loss"].append(vl)
        history["train_iou"].append(float(np.mean([float(x) for x in tr_ious])))
        history["val_iou"].append(miou)
        logger.info(f"epoch {epoch}/{args.epochs} lr {lr:.2e} "
                    f"train loss {tl:.4f} val loss {vl:.4f} "
                    f"mIoU {miou:.4f} mF1 {float(f1.mean()):.4f}")

        # Heavy metrics cadence: epoch 1 and every 25th
        # (ModelTraining.py:420-444,622-654). Reference per-image semantics:
        # dice over the *joint* one-hot stack of all classes — which for
        # one-hot pairs reduces to pixel agreement, 2·|∩|/(HW+HW) — plus the
        # per-class Hausdorff distances (∞→1000) summed per image. Computed
        # over the full validation set, host-side, off the step path.
        if epoch == 1 or epoch % args.heavy_metric_interval == 0:
            tot_dice, tot_haus, n_img = 0.0, 0.0, 0
            for imgs, masks in val_ds.epoch(args.valBatchSize, shuffle=False):
                b_img, _ = shard_batch(mesh, (imgs, masks))
                preds = np.asarray(predict(state.variables, b_img))
                for p, m in zip(preds, np.asarray(masks)):
                    tot_dice += float(binary_dice(
                        np.eye(num_classes, dtype=bool)[p],
                        np.eye(num_classes, dtype=bool)[m]))
                    tot_haus += sum(capped_hausdorff(p == c, m == c)
                                    for c in range(num_classes))
                    n_img += 1
            logger.info(
                f"  heavy metrics over {n_img} val images: "
                f"mean dice {tot_dice / max(n_img, 1):.4f} "
                f"mean hausdorff {tot_haus / max(n_img, 1):.1f}")

        if ckpts.save_best_by_f1(state, epoch, float(f1.mean())):
            logger.info(f"  new best mean F1 {float(f1.mean()):.4f} — checkpointed")

        if epoch == args.epochs and strbool(args.save_samples) and last_batch is not None:
            imgs, masks = last_batch
            logits = model.apply(state.variables, jnp.asarray(imgs), train=False)
            save_triptychs(imgs, masks, np.asarray(jnp.argmax(logits, -1)),
                           save_dir / f"epoch_{epoch}_samples.png")

    save_losses(history["train_loss"], history["val_loss"], save_dir,
                loss_name="CE+Dice")
    save_accuracy_curves(history, save_dir)
    logger.info("done")
    return 0


def augment_path_a_batch_wrapper():
    """Adapt the (key, img, gt, mask) Path-A augment to the train-step's
    (key, images, masks) hook; the RGB gt is derived from ids when needed
    for display, not during training."""
    import jax.numpy as jnp
    from mmr_tpu.data.augment import augment_path_a_batch

    def fn(key, images, masks):
        gts = jnp.zeros_like(images)
        ai, _, am = augment_path_a_batch(key, images, gts, masks)
        return ai, am

    return fn


if __name__ == "__main__":
    sys.exit(main())
