"""Path-A standalone evaluator CLI — the ``ModelEval.py`` surface
(``ModelEval.py:52-89`` argparse; ``:363-458`` validate loop; ``:259-304``
class-wise metric printout): load a checkpoint, run whole-image forwards over
a PNG-folder split, report loss + per-class IoU/P/R/F1 (+ saved triptychs)."""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(description="MMR-TPU Path-A checkpoint evaluation")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--json_path", type=str, default="")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--model", type=str, default="smp_UNet++")
    p.add_argument("--resnetModel", type=int, default=18)
    p.add_argument("--checkpoint_dir", type=str, required=True,
                   help="directory holding the orbax checkpoint (best_f1/...)")
    p.add_argument("--which", type=str, default="best_f1")
    p.add_argument("--valBatchSize", type=int, default=4)
    p.add_argument("--resizedHeight", type=int, default=256)
    p.add_argument("--resizedWidth", type=int, default=256)
    p.add_argument("--dice_loss_factor", type=float, default=0.5)
    p.add_argument("--save_dir", type=str, default="")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmr_tpu.data.classes import load_class_json, sarrarp50_key, sarrarp50_names
    from mmr_tpu.data.png_dataset import PngFolderDataset
    from mmr_tpu.infer.evaluator import evaluate_checkpoint
    from mmr_tpu.losses import blended_ce_dice_loss
    from mmr_tpu.models import create_model
    from mmr_tpu.monitor import save_triptychs
    from mmr_tpu.train.checkpoint import CheckpointManager
    from mmr_tpu.train.optim import build_optimizer
    from mmr_tpu.train.state import TrainState

    if args.json_path:
        key, names = load_class_json(args.json_path)
    else:
        key, names = sarrarp50_key(), sarrarp50_names()
    num_classes = len(key)

    hw = (args.resizedHeight, args.resizedWidth)
    ds = PngFolderDataset(args.data_dir, args.split, hw, -1, num_classes)
    arch = args.model if args.model.lower() not in ("resnet18", "resnet34") \
        else f"resnet{args.resnetModel}"
    model, _ = create_model(arch, classes=num_classes)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init({"params": jax.random.key(0)},
                               jnp.zeros((1, *hw, 3), jnp.float32), train=False)
    opt = build_optimizer("adam")
    state = TrainState.create(variables, opt)
    cm = CheckpointManager(args.checkpoint_dir)
    state, meta = cm.load(state, args.which, weights_only=True)
    print(f"Loaded {args.which} checkpoint: {meta}")

    loss_fn = functools.partial(blended_ce_dice_loss,
                                dice_loss_factor=args.dice_loss_factor)
    report = evaluate_checkpoint(
        model, state.variables, ds.epoch(args.valBatchSize, shuffle=False),
        num_classes, loss_fn=loss_fn)

    if args.save_dir:
        imgs, masks = next(ds.epoch(args.valBatchSize, shuffle=False))
        logits = model.apply(state.variables, jnp.asarray(imgs), train=False)
        save_triptychs(imgs, masks, np.asarray(jnp.argmax(logits, -1)),
                       Path(args.save_dir) / "eval_samples.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
