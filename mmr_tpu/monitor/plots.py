"""Plot artifacts — parity with the reference's observability surface:

- ``loss.png`` train/val curves (``common_utils.py:40-104`` ``save_losses``)
- accuracy/F1 curve PNGs (``ModelTraining.py:500-523``)
- 6-panel ``training_dashboard.png`` (``Main_MMR_SegModel.py:379-480``):
  loss, IoU, LR, epoch time, device memory, samples/s
- sample triptychs [input | prediction | GT] (``utils.py:220-295``
  ``displaySamples``; ``Main_MMR_SegModel.py:1003-1074`` ``save_plots``)
"""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def save_losses(train_losses, val_losses, out_dir: str | Path,
                loss_name: str = "DiceCELoss", log_scale: bool = False) -> Path:
    out = Path(out_dir) / "loss.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 5))
    xs = np.arange(1, len(train_losses) + 1)
    ax.plot(xs, train_losses, label=f"Train {loss_name}")
    if val_losses:
        ax.plot(xs[: len(val_losses)], val_losses, label=f"Val {loss_name}")
    if log_scale:
        ax.set_yscale("log")
    ax.set_xlabel("Epoch")
    ax.set_ylabel(loss_name)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def save_accuracy_curves(history: dict, out_dir: str | Path) -> Path:
    """Path-A style accuracy (IoU/F1) curves (ModelTraining.py:500-523)."""
    out = Path(out_dir) / "accuracy.png"
    fig, ax = plt.subplots(figsize=(8, 5))
    if history.get("train_iou"):
        ax.plot(history["epoch"], history["train_iou"], label="Train IoU")
    if history.get("val_iou"):
        ax.plot(history["epoch"], history["val_iou"], label="Val IoU")
    ax.set_xlabel("Epoch")
    ax.set_ylabel("IoU")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def save_dashboard(history: dict, out_dir: str | Path) -> Path:
    out = Path(out_dir) / "training_dashboard.png"
    fig, axes = plt.subplots(2, 3, figsize=(16, 9))
    ep = history.get("epoch", [])
    panels = [
        ("Loss", [("train_loss", "train"), ("val_loss", "val")], None),
        ("IoU", [("train_iou", "train"), ("val_iou", "val")], None),
        ("Learning rate", [("lr", "lr")], "log"),
        ("Epoch time (s)", [("epoch_time_s", "time")], None),
        ("Device memory (MB)", [("device_mem_mb", "HBM")], None),
        ("Throughput (samples/s)", [("samples_per_sec", "samples/s")], None),
    ]
    for ax, (title, series, yscale) in zip(axes.flat, panels):
        for key, label in series:
            if history.get(key):
                ax.plot(ep, history[key], label=label)
        ax.set_title(title)
        ax.grid(alpha=0.3)
        if yscale:
            ax.set_yscale(yscale)
        if len(series) > 1:
            ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    return out


def save_triptychs(images, masks, preds, out_path: str | Path,
                   max_samples: int = 4) -> Path:
    """[input | ground truth | prediction] rows (``save_plots`` /
    ``displaySamples`` capability). ``images`` (N,H,W,3) in [0,1]; ``masks``/
    ``preds`` (N,H,W) int ids — rendered with the 'hot'-style colormap the
    reference uses for visualization (Visualization_Segment_Prediction.py)."""
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    n = min(len(images), max_samples)
    fig, axes = plt.subplots(n, 3, figsize=(12, 4 * n), squeeze=False)
    vmax = max(int(np.max(masks)), int(np.max(preds)), 1)
    for i in range(n):
        img = np.clip(np.asarray(images[i], np.float32), 0, 1)
        axes[i][0].imshow(img)
        axes[i][0].set_title("input")
        axes[i][1].imshow(np.asarray(masks[i]), cmap="hot", vmin=0, vmax=vmax)
        axes[i][1].set_title("ground truth")
        axes[i][2].imshow(np.asarray(preds[i]), cmap="hot", vmin=0, vmax=vmax)
        axes[i][2].set_title("prediction")
        for ax in axes[i]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
