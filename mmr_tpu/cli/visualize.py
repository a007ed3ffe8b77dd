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
    p.add_argument("--architecture", action="store_true",
                   help="print a layer summary and render the encoder/"
                        "decoder block diagram "
                        "(Visualization_Segment_Prediction.py:233-305)")
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

    if args.architecture:
        out = save_architecture_diagram(trainer, out_dir)
        print(f"Wrote {out}")
    return 0


def save_architecture_diagram(trainer, out_dir: Path) -> Path:
    """Layer summary printout + encoder/decoder block diagram — the
    reference's architecture-visualization surface
    (``Visualization_Segment_Prediction.py:233-305``: torchsummary +
    matplotlib component boxes)."""
    import jax
    import matplotlib
    import numpy as np

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mmr_tpu.monitor.monitor import model_summary

    print("Model Architecture Summary:")
    print("=" * 50)
    print(model_summary(trainer.model, trainer.state.variables))
    arch = type(trainer.model).__name__
    enc = getattr(trainer.model, "encoder_name", None)
    n_params = sum(int(np.prod(v.shape)) for v in
                   jax.tree_util.tree_leaves(trainer.state.params))

    fig, ax = plt.subplots(figsize=(12, 6))
    comps = [
        (f"Input Image\n(H, W, 3)", (1, 4), "#FFE5B4"),
        (f"Encoder\n{enc or 'built-in'}", (3, 4), "#87CEEB"),
        (f"Decoder\n{arch}", (5, 4), "#98FB98"),
        (f"Output\n(H, W, {trainer.n_classes})", (7, 4), "#FFB6C1"),
        ("Skip Connections", (4, 2.5), "#DDA0DD"),
        (f"{n_params:,} parameters", (4, 1.2), "#F0E68C"),
    ]
    for name, (cx, cy), color in comps:
        ax.add_patch(plt.Rectangle((cx - 0.6, cy - 0.4), 1.2, 0.8,
                                   facecolor=color, edgecolor="black",
                                   linewidth=2))
        ax.text(cx, cy, name, ha="center", va="center", fontsize=10,
                fontweight="bold")
    for (x0, y0), (x1, y1) in [((1.6, 4), (2.4, 4)), ((3.6, 4), (4.4, 4)),
                               ((5.6, 4), (6.4, 4)), ((3.4, 3.7), (4, 2.9)),
                               ((4, 2.9), (4.8, 3.7))]:
        ax.annotate("", xy=(x1, y1), xytext=(x0, y0),
                    arrowprops=dict(arrowstyle="->", lw=2))
    ax.set_xlim(0, 8)
    ax.set_ylim(0, 5.5)
    ax.axis("off")
    ax.set_title(f"{arch} architecture")
    fig.tight_layout()
    out = out_dir / "architecture_diagram.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


if __name__ == "__main__":
    sys.exit(main())
