"""Training monitor — parity with Path B's ``TrainingMonitor``
(``Main_MMR_SegModel.py:116-480``) on TPU:

- timestamped dual console/file log ``[ts] [LEVEL]`` (``:177-201``)
- device memory via ``jax.local_devices()[i].memory_stats()`` (the TPU
  equivalent of ``torch.cuda.memory_allocated/reserved``, ``:203-234``)
- host CPU%% via psutil (``:236-251``)
- per-epoch history incl. throughput (samples/s) and ETA (``:293-359``)
- ``training_metrics.json`` export (``:361-377``)
- dashboard PNG via :mod:`mmr_tpu.monitor.plots` (``:379-480``)

Also provides Path A's ``get_logger`` file logger (``utils.py:185-216``).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import psutil


def get_logger(log_dir: str | Path, name: str = "train") -> logging.Logger:
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger(f"mmr_tpu.{name}.{log_dir}")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fh = logging.FileHandler(log_dir / f"{name}.log")
        fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(fh)
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(sh)
    return logger


def device_memory_stats() -> dict:
    """Per-device HBM usage in MB (empty off-TPU)."""
    import jax

    out = {}
    for i, d in enumerate(jax.local_devices()):
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[f"device{i}_bytes_in_use_mb"] = stats.get("bytes_in_use", 0) / 1e6
            out[f"device{i}_peak_bytes_mb"] = stats.get("peak_bytes_in_use", 0) / 1e6
    return out


class TrainingMonitor:
    def __init__(self, results_path: str | Path, n_epochs: int):
        self.results_path = Path(results_path)
        self.results_path.mkdir(parents=True, exist_ok=True)
        self.n_epochs = n_epochs
        self.log_file = self.results_path / f"training_log_{time.strftime('%Y%m%d_%H%M%S')}.log"
        self.history: dict[str, list] = {
            "epoch": [], "train_loss": [], "val_loss": [], "train_iou": [],
            "val_iou": [], "lr": [], "epoch_time_s": [], "samples_per_sec": [],
            "cpu_percent": [], "device_mem_mb": [], "eta_min": [],
        }
        self._train_start = None
        self._epoch_start = None

    def log_message(self, message: str, level: str = "INFO") -> None:
        line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] [{level}] {message}"
        print(line, flush=True)
        with open(self.log_file, "a") as f:
            f.write(line + "\n")

    def start_training(self) -> None:
        self._train_start = time.time()
        self.log_message(f"Training started — {self.n_epochs} epochs planned")

    def start_epoch(self, epoch: int) -> None:
        self._epoch_start = time.time()

    def end_epoch(self, epoch: int, train_loss: float, val_loss: float,
                  train_iou: float, val_iou: float, lr: float,
                  samples_seen: int) -> None:
        dt = time.time() - (self._epoch_start or time.time())
        done = len(self.history["epoch"]) + 1
        eta = (self.n_epochs - done) * (
            (time.time() - self._train_start) / done if self._train_start else dt)
        mem = device_memory_stats()
        mem_mb = max(mem.values()) if mem else 0.0
        self.history["epoch"].append(epoch)
        self.history["train_loss"].append(float(train_loss))
        self.history["val_loss"].append(float(val_loss))
        self.history["train_iou"].append(float(train_iou))
        self.history["val_iou"].append(float(val_iou))
        self.history["lr"].append(float(lr))
        self.history["epoch_time_s"].append(dt)
        self.history["samples_per_sec"].append(samples_seen / dt if dt > 0 else 0.0)
        self.history["cpu_percent"].append(psutil.cpu_percent())
        self.history["device_mem_mb"].append(mem_mb)
        self.history["eta_min"].append(eta / 60.0)
        self.log_message(
            f"Epoch {epoch}/{self.n_epochs} — train {train_loss:.4f} "
            f"val {val_loss:.4f} | IoU train {train_iou:.4f} val {val_iou:.4f} "
            f"| lr {lr:.2e} | {dt:.1f}s ({self.history['samples_per_sec'][-1]:.1f} samples/s) "
            f"| HBM {mem_mb:.0f}MB | ETA {eta / 60:.1f}min")

    def save_metrics(self) -> Path:
        out = self.results_path / "training_metrics.json"
        out.write_text(json.dumps(self.history, indent=2))
        return out


# ------------------------------------------------------------ profiler trace

class ProfilerTrace:
    """Flag-gated ``jax.profiler`` capture — the TPU-native equivalent of the
    reference's resource sampling (``Main_MMR_SegModel.py:203-251``;
    SURVEY.md §5.1). Captures device op-level traces for a few steps into
    ``<results>/profile`` (TensorBoard format).

    Usage (Trainer wires this when ``config['profile_epochs']`` is set):

        tracer = ProfilerTrace(results_path, epochs=(1,))
        tracer.maybe_start(epoch); ...train...; tracer.maybe_stop(epoch)
    """

    def __init__(self, results_path, epochs=(1,), enabled: bool = True):
        from pathlib import Path as _P

        self.dir = _P(results_path) / "profile"
        self.epochs = set(int(e) for e in epochs)
        self.enabled = bool(enabled) and bool(self.epochs)
        self._active = False

    def maybe_start(self, epoch: int) -> bool:
        if not self.enabled or epoch not in self.epochs or self._active:
            return False
        import jax

        self.dir.mkdir(parents=True, exist_ok=True)
        jax.profiler.start_trace(str(self.dir))
        self._active = True
        return True

    def maybe_stop(self, epoch: int) -> bool:
        if not self._active:
            return False
        import jax

        jax.profiler.stop_trace()
        self._active = False
        return True


def model_summary(model, variables, input_shape=(1, 64, 64, 3)) -> str:
    """Layer-wise parameter table — the reference's torchinfo/torchsummary
    surface (``Main_MMR_SegModel.py:1130-1132``,
    ``Visualization_Segment_Prediction.py:237-244``): per-module param counts
    plus the total, from the variables tree."""
    import numpy as np
    import jax

    rows = []

    def walk(tree, prefix, depth):
        total = 0
        children = []
        for k, v in sorted(tree.items()):
            if isinstance(v, dict):
                sub = walk(v, f"{prefix}/{k}" if prefix else k, depth + 1)
                total += sub
            else:
                total += int(np.prod(np.shape(v)))
        if depth <= 2 and prefix:
            rows.append((prefix, total))
        return total

    total = walk(variables.get("params", variables), "", 0)
    width = max([len(r[0]) for r in rows] + [20])
    lines = ["=" * (width + 16),
             f"{'Layer':<{width}}  {'Param #':>12}",
             "=" * (width + 16)]
    for name, n in rows:
        if "/" not in name:  # top-level modules after their children
            lines.append(f"{name:<{width}}  {n:>12,}")
    lines.append("=" * (width + 16))
    lines.append(f"{'Total params':<{width}}  {total:>12,}")
    lines.append("=" * (width + 16))
    return "\n".join(lines)
