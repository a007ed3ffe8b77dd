"""Prediction visualizer — the reference's visualization surfaces:
``MMR_Seg_Unet/Visualization_Segment_Prediction.py`` (hot-colormap triptychs,
class legend, model summary) and the notebooks' ``CustomVisualizer``
(per-frame sliding-window prediction over a video store, overlap 0.25).

Usage:
    python -m mmr_tpu.cli.visualize <results_path> <zarr_store_or_dataset> \
        [--frames 0 5 10] [--overlap 0.25] [--legend]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(description="MMR-TPU prediction visualizer")
    p.add_argument("results_path", type=str,
                   help="training results dir (config.yaml + checkpoints)")
    p.add_argument("data_path", type=str, help="a .zarr store or a dataset dir")
    p.add_argument("--frames", type=int, nargs="*", default=[0])
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--which", type=str, default="best_model")
    p.add_argument("--legend", action="store_true",
                   help="also render the class-color legend")
    p.add_argument("--out", type=str, default="")
    args = p.parse_args(argv)

    import numpy as np
    import jax.numpy as jnp
    import yaml

    from mmr_tpu.data.classes import sarrarp50_names
    from mmr_tpu.data.video_dataset import VideoFrameDataset
    from mmr_tpu.data.zarr_io import list_dataset_stores
    from mmr_tpu.infer.sliding_window import make_sliding_window_fn
    from mmr_tpu.models.factory import get_preprocessing
    from mmr_tpu.monitor.plots import save_triptychs
    from mmr_tpu.train.engine import Trainer

    results = Path(args.results_path)
    config = yaml.safe_load((results / "config.yaml").read_text())
    config["results_path"] = str(results)
    trainer = Trainer(config)
    trainer.init_state()
    trainer.state, meta = trainer.checkpoints.load(trainer.state, args.which)
    print(f"Loaded {args.which} (epoch {meta['epoch']})")

    data = Path(args.data_path)
    stores = [data] if data.suffix == ".zarr" else list_dataset_stores(data)
    vd = VideoFrameDataset(stores[:1], infer_batch_size=1)
    pre = get_preprocessing(trainer.encoder_name) if trainer.encoder_name else None
    sw = make_sliding_window_fn(
        trainer.model, trainer.state.variables, config["patch_size"],
        trainer.n_classes, sw_batch_size=int(config.get("sw_batch_size", 24)),
        overlap=args.overlap, preprocess=pre)

    out_dir = Path(args.out) if args.out else results / "visualizations"
    out_dir.mkdir(parents=True, exist_ok=True)
    imgs, gts, preds = [], [], []
    for t in args.frames:
        item = vd[min(t, len(vd) - 1)]
        logits = sw(jnp.asarray(item["image"]))
        imgs.append(item["image"][0])
        gts.append(item["mask"][0])
        preds.append(np.asarray(jnp.argmax(logits, -1))[0])
    out = save_triptychs(np.stack(imgs), np.stack(gts), np.stack(preds),
                         out_dir / "prediction_triptychs.png",
                         max_samples=len(imgs))
    print(f"Wrote {out}")

    if args.legend:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib import cm

        names = sarrarp50_names()[: trainer.n_classes]
        fig, ax = plt.subplots(figsize=(4, 0.5 * len(names)))
        for i, name in enumerate(names):
            color = cm.hot(i / max(len(names) - 1, 1))
            ax.barh(i, 1, color=color)
            ax.text(1.05, i, f"{i}: {name}", va="center")
        ax.set_xlim(0, 2)
        ax.axis("off")
        fig.tight_layout()
        fig.savefig(out_dir / "class_legend.png", dpi=120)
        print(f"Wrote {out_dir / 'class_legend.png'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
