"""Inference drivers.

- :func:`run_inference` — Path B's ``SegModel.run_inference``
  (``Main_MMR_SegModel.py:1205-1367``): load best checkpoint, bf16 model
  (the TPU analog of ``.half()+channels_last``, ``:1243-1244``), numbered
  ``test_plots_i`` output dir with a config snapshot (``:1249-1256``),
  sliding-window prediction over whole-video frame batches, per-video FPS and
  per-class IoU with the background-drop ``preds-1/masks-1/ignore=-1`` trick
  (``:1320-1326``), per-video triptych, overall per-class + AVG report
  (``:1354-1367``).

- :func:`evaluate_checkpoint` — Path A's ``ModelEval.py`` capability:
  whole-image forward over a dataset, loss + streaming Evaluate metrics,
  class-wise IoU/P/R/F1 printout (``ModelEval.py:259-304,363-458``).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from mmr_tpu.config.config import create_config
from mmr_tpu.data.video_dataset import VideoFrameDataset
from mmr_tpu.infer.sliding_window import make_sliding_window_fn
from mmr_tpu.metrics.confusion import segmentation_stats
from mmr_tpu.metrics.evaluate import Evaluate
from mmr_tpu.metrics.iou import iou_score
from mmr_tpu.monitor.plots import save_triptychs


def _next_test_plots_dir(results_path: Path) -> Path:
    i = 0
    while (results_path / f"test_plots_{i}").exists():
        i += 1
    out = results_path / f"test_plots_{i}"
    out.mkdir(parents=True)
    return out


def _report(per_frame_iou: np.ndarray, indent: str) -> float:
    mean_per_class = per_frame_iou.mean(axis=0)
    parts = [f"C{i + 1}: {v * 100:.2f}" for i, v in enumerate(mean_per_class)]
    parts.append(f"AVG: {mean_per_class.mean() * 100:.2f}")
    print(f"{indent}IoU scores per class: ")
    print(f"{indent}    " + " - ".join(parts))
    return float(mean_per_class.mean())


def run_inference(
    model,
    variables,
    dataset: VideoFrameDataset,
    config: dict,
    preprocess=None,
    save_plots: bool = True,
) -> dict:
    results_path = Path(config["results_path"])
    n_classes = int(config["n_classes"])
    plot_dir = _next_test_plots_dir(results_path) if save_plots else None
    if plot_dir is not None:
        create_config(config, plot_dir)

    import jax.numpy as jnp

    # bf16 window surface by default: the reference's real-time path runs
    # the model AND MONAI's blending under fp16 autocast
    # (Main_MMR_SegModel.py:1274-1317); f32 blend accumulation either way.
    # fuse_blend by default: per-frame scan blends each frame's window grid
    # straight off the predictor output (measured +0.6 fps full-HD — the
    # all-frames logits stack never round-trips HBM); sw_chunked opts back
    # into the fixed-sw_batch chunk loop. packed_blend when the model can
    # emit its raw packed-layout head logits (packed UNet++): the blend
    # runs in that layout and the per-window unpack/relayout chain never
    # executes; it degrades gracefully (type/alignment fallbacks inside).
    from mmr_tpu.models.decoders import UnetPlusPlusModel

    packed_blend = (isinstance(model, UnetPlusPlusModel)
                    and getattr(model, "packed", False)
                    and not config.get("sw_chunked"))
    sw = make_sliding_window_fn(
        model, variables, config["patch_size"], n_classes + 1,
        sw_batch_size=int(config.get("sw_batch_size", 24)),
        overlap=float(config.get("sw_overlap", 0.5)),
        preprocess=preprocess,
        compute_dtype=(jnp.float32 if config.get("sw_fp32_blend")
                       else jnp.bfloat16),
        fuse_blend=not config.get("sw_chunked"),
        packed_blend=packed_blend)

    all_iou, video_stats = [], {}
    current: list[np.ndarray] = []
    seen: list[str] = []
    video_start = time.time()
    n_frames = 0
    plot_item = None
    start = time.time()

    def flush_video(name: str):
        nonlocal current, video_start, n_frames, plot_item
        dt = time.time() - video_start
        fps = n_frames / dt if dt > 0 else 0.0
        print(f"    Inference time: {time.strftime('%H:%M:%S', time.gmtime(dt))} ({fps:.2f} fps)")
        vid_iou = np.concatenate(current, axis=0)
        all_iou.append(vid_iou)
        mean_iou = _report(vid_iou, "        ")
        video_stats[name] = {"fps": fps, "mean_iou": mean_iou}
        if plot_item is not None and plot_dir is not None:
            save_triptychs(*plot_item[:3], plot_dir / f"{plot_item[3]}.png")
        current, n_frames, plot_item = [], 0, None
        video_start = time.time()

    import jax

    @jax.jit
    def _metrics(logits, masks_dev):
        # argmax + background-excluded per-frame per-class IoU (the −1 shift
        # trick) entirely on device — only the (T, C) IoU table and the
        # argmax preds of the ONE plotted item per video come back to host
        preds = jnp.argmax(logits, axis=-1)
        tp, fp, fn, tn = segmentation_stats(
            preds.astype(jnp.int32) - 1, masks_dev.astype(jnp.int32) - 1,
            n_classes, ignore_index=-1)
        return preds, iou_score(tp, fp, fn, tn)

    nT = dataset.infer_batch_size
    for item in dataset:
        name = item["id"]
        if not seen or name != seen[-1]:
            if seen:
                flush_video(seen[-1])
            seen.append(name)
            print(f"Processing video: {name}")
        img, masks = item["image"], item["mask"]
        n_valid = img.shape[0]
        if n_valid < nT:
            # pad the video's tail chunk to the full temporal batch (repeat
            # the last frame) — a shorter batch would retrace + recompile
            # the whole sliding-window program (minutes over the tunnel);
            # the pad rows are sliced off the host-side IoU table below
            pad_n = nT - n_valid
            img = np.concatenate([img, np.repeat(img[-1:], pad_n, 0)], 0)
            masks = np.concatenate([masks, np.repeat(masks[-1:], pad_n, 0)],
                                   0)
        # images upload in the STORE dtype (uint8 for compact stores: 1
        # byte/px over the ~0.04 GB/s tunnel; sw divides by 255 on device)
        frames = jnp.asarray(img)
        logits = sw(frames)
        preds_d, iou_tbl = _metrics(logits,
                                    jnp.asarray(masks.astype(np.uint8)))
        current.append(np.asarray(iou_tbl)[:n_valid])
        n_frames += n_valid
        if plot_item is None:
            plot_item = (np.asarray(img[:n_valid], np.float32)
                         / (255.0 if img.dtype == np.uint8 else 1.0),
                         masks[:n_valid].astype(np.int32),
                         np.asarray(preds_d)[:n_valid],
                         f"{name}_{item['t0']}-{item['t1']}")
    if seen:
        flush_video(seen[-1])

    total = time.time() - start
    print(f"\nTotal inference time: {time.strftime('%H:%M:%S', time.gmtime(total))}")
    overall = np.concatenate(all_iou, axis=0) if all_iou else np.zeros((0, n_classes))
    print("Overall IoU scores per class: ")
    overall_mean = _report(overall, "") if len(overall) else 0.0
    return {
        "overall_mean_iou": overall_mean,
        "per_class_iou": overall.mean(axis=0).tolist() if len(overall) else [],
        "videos": video_stats,
        "total_time_s": total,
    }


def evaluate_checkpoint(model, variables, batches, num_classes: int,
                        loss_fn=None, preprocess=None) -> dict:
    """Path-A standalone evaluation: whole-image forwards + streaming metrics.

    ``batches``: iterable of (images NHWC f32, masks NHW int).
    """
    ev = Evaluate(num_classes)
    losses = []
    for images, masks in batches:
        imgs = jnp.asarray(images)
        if preprocess is not None:
            imgs = preprocess(imgs)
        logits = model.apply(variables, imgs, train=False)
        if loss_fn is not None:
            losses.append(float(loss_fn(logits, jnp.asarray(masks))))
        ev.add_batch(logits, jnp.asarray(masks))
    per_class_iou, miou = ev.iou()
    p, r, f1 = ev.precision_recall_f1()
    print("Class-wise metrics:")
    for c in range(num_classes):
        print(f"  class {c}: IoU {per_class_iou[c]:.4f} P {p[c]:.4f} "
              f"R {r[c]:.4f} F1 {f1[c]:.4f}")
    print(f"Mean IoU: {miou:.4f}  Mean F1: {float(f1.mean()):.4f}")
    return {
        "loss": float(np.mean(losses)) if losses else None,
        "iou_per_class": per_class_iou.tolist(),
        "mean_iou": miou,
        "precision": p.tolist(),
        "recall": r.tolist(),
        "f1": f1.tolist(),
        "mean_f1": float(f1.mean()),
    }
