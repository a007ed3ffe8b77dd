"""Checkpoint / resume — both reference schemes (SURVEY.md §5.4).

Path B (``Main_MMR_SegModel.py:892-1001``):
  ``checkpoints/last_model`` written every epoch, ``checkpoints/best_model``
  replaced when validation loss improves (the previous best's stored
  ``validation_loss`` is consulted, ``:945-952``). Contents: model params +
  batch stats + optimizer state + epoch + validation_loss (+ the scheduler's
  epoch, which for us is just the epoch).

Path A (``ModelTraining.py:477-489,825-845``):
  single file ``{model}_{dataset}_bs{..}_lr{..}_e{..}_checkpoint`` holding
  ``{'epoch','state_dict','optimizer'}``, written only when mean-F1 improves.

Native storage is **orbax** (async-capable, sharded-array aware — the
TPU-native choice); a ``.pth`` exporter (torch container with flattened
tensors) is provided so reference-style tooling can open our checkpoints.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path


import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from mmr_tpu.train.state import TrainState


class CheckpointManager:
    """last/best checkpoint policy over an orbax checkpointer."""

    def __init__(self, directory: str | Path):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------ save
    def _write(self, name: str, state: TrainState, meta: dict) -> None:
        path = (self.dir / name).resolve()
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path, jax.device_get(state))
        self._ckptr.wait_until_finished()
        (self.dir / f"{name}.json").write_text(json.dumps(meta))

    def save(self, state: TrainState, epoch: int, validation_loss: float) -> bool:
        """Save ``last_model`` always; promote to ``best_model`` when val loss
        improves (reference best-selection logic, ``:945-952``). Returns True
        when a new best was written."""
        meta = {"epoch": int(epoch), "validation_loss": float(validation_loss)}
        self._write("last_model", state, meta)
        best_meta_path = self.dir / "best_model.json"
        prev = json.loads(best_meta_path.read_text()) if best_meta_path.exists() else None
        if prev is None or validation_loss < prev["validation_loss"]:
            self._write("best_model", state, meta)
            return True
        return False

    def save_best_by_f1(self, state: TrainState, epoch: int, mean_f1: float) -> bool:
        """Path-A policy: checkpoint only when mean F1 improves
        (``ModelTraining.py:477-489``)."""
        meta_path = self.dir / "best_f1.json"
        prev = json.loads(meta_path.read_text()) if meta_path.exists() else None
        if prev is None or mean_f1 > prev["mean_f1"]:
            path = (self.dir / "best_f1").resolve()
            if path.exists():
                shutil.rmtree(path)
            self._ckptr.save(path, jax.device_get(state))
            self._ckptr.wait_until_finished()
            meta_path.write_text(json.dumps({"epoch": int(epoch), "mean_f1": float(mean_f1)}))
            return True
        return False

    # ------------------------------------------------------------------ load
    def load(self, template: TrainState, which: str = "last_model",
             weights_only: bool = False) -> tuple[TrainState, dict]:
        """``weights_only=True`` restores just params/batch_stats — for
        evaluation/inference the optimizer used at train time (and hence the
        opt-state pytree structure) need not match the eval template
        (mirrors the reference's tolerance of raw state dicts,
        ``ModelEval.py:206-226``)."""
        path = (self.dir / which).resolve()
        meta = json.loads((self.dir / f"{which}.json").read_text())
        if weights_only:
            # restore the raw saved tree (no structural template) and graft
            # just the weights — the eval-side optimizer need not match
            raw = self._ckptr.restore(path)
            return template.replace(params=raw["params"],
                                    batch_stats=raw["batch_stats"]), meta
        try:
            state = self._ckptr.restore(path, jax.device_get(template))
        except (ValueError, TypeError) as e:
            # optimizer-state format drift (e.g. resuming a run saved with
            # the per-leaf optax AdamW chain into the flat-buffer FusedAdamW
            # template, or vice versa): restore weights + step, reset the
            # moments — same outcome as the reference's strict=False torch
            # load when the optimizer state_dict doesn't match
            import logging
            logging.getLogger("mmr_tpu").warning(
                "checkpoint %s has an incompatible optimizer-state format "
                "(%s); restoring weights and resetting optimizer moments",
                path, type(e).__name__)
            raw = self._ckptr.restore(path)
            state = template.replace(
                params=raw["params"], batch_stats=raw["batch_stats"],
                step=jnp.asarray(raw.get("step", template.step)))
        return state, meta

    def exists(self, which: str = "last_model") -> bool:
        return (self.dir / which).exists()


def load_checkpoint_path(path: str | Path, template: TrainState,
                         weights_only: bool = True) -> tuple[TrainState, dict]:
    """Load a checkpoint from an explicit *path* — the reference's Path-A
    ``--resume <file>`` semantics (``ModelTraining.py:308-337``: the flag is a
    checkpoint file, possibly from a different run). Accepts:

    - a ``.pth`` torch checkpoint (exported by us or reference-shaped) —
      loaded tolerantly (missing/mismatched entries keep template values,
      like the reference's ``strict=False`` + key filtering);
    - an orbax checkpoint directory written by :class:`CheckpointManager`
      (``best_f1`` / ``last_model`` / ``best_model``), with its sidecar
      ``<name>.json`` meta when present;
    - a run directory containing ``checkpoints/`` — resolves to ``best_f1``
      or ``last_model`` inside it.

    Returns ``(state, meta)``; ``meta`` may contain ``epoch``.
    """
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"no checkpoint found at '{p}'")
    if p.is_file():
        return import_torch_checkpoint(p, template, strict=False)
    if (p / "checkpoints").is_dir():
        mgr = CheckpointManager(p / "checkpoints")
        for name in ("best_f1", "best_model", "last_model"):
            if mgr.exists(name):
                return mgr.load(template, name, weights_only=weights_only)
        raise FileNotFoundError(f"{p}/checkpoints holds no known checkpoint")
    # an orbax checkpoint directory itself
    mgr = CheckpointManager(p.parent)
    meta_file = p.parent / f"{p.name}.json"
    if meta_file.exists():
        return mgr.load(template, p.name, weights_only=weights_only)
    raw = mgr._ckptr.restore(p.resolve())
    return template.replace(params=raw["params"],
                            batch_stats=raw.get("batch_stats")), {}


# ------------------------------------------------------------- torch export

def export_torch_checkpoint(path: str | Path, state: TrainState, epoch: int,
                            validation_loss: float | None = None) -> None:
    """Write a ``.pth`` readable by ``torch.load`` with the reference's key
    layout (``Main_MMR_SegModel.py:919-943``): ``epoch``,
    ``network_state_dict`` (flattened ``a.b.c`` → tensor), ``validation_loss``.
    Conv kernels are transposed to torch (O, I, H, W) layout."""
    import torch

    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, dict):
                walk(v, name)
            else:
                arr = np.asarray(jax.device_get(v))
                if name.endswith(".kernel") and arr.ndim == 4:
                    arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
                flat[name] = torch.from_numpy(np.ascontiguousarray(arr))

    walk(jax.device_get(state.params), "")
    ckpt = {"epoch": int(epoch), "network_state_dict": flat}
    if state.batch_stats:
        stats = {}

        def walk_s(tree, prefix):
            for k, v in tree.items():
                name = f"{prefix}.{k}" if prefix else str(k)
                if isinstance(v, dict):
                    walk_s(v, name)
                else:
                    stats[name] = torch.from_numpy(np.ascontiguousarray(np.asarray(jax.device_get(v))))

        walk_s(jax.device_get(state.batch_stats), "")
        ckpt["batch_stats"] = stats
    if validation_loss is not None:
        ckpt["validation_loss"] = float(validation_loss)
    torch.save(ckpt, str(path))


def import_torch_checkpoint(path: str | Path, template: TrainState,
                            strict: bool = True) -> tuple[TrainState, dict]:
    """Load a ``.pth`` written by :func:`export_torch_checkpoint` (or any
    torch checkpoint with the same dotted-name layout) back into a
    :class:`TrainState`. Mirrors the reference's tolerance for both wrapped
    and raw state dicts (``ModelEval.py:206-226``). Kernels convert
    OIHW → HWIO; optimizer state stays from the template (the reference's
    Path-A ``--resume`` likewise restarts optimizer moments when shapes
    change). ``strict=False`` keeps template values for missing or
    shape-mismatched entries (the reference resume's key filtering +
    ``load_state_dict(strict=False)``, ``ModelTraining.py:314-335``);
    skipped names are returned in ``meta['skipped']``."""
    import torch

    raw = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "network_state_dict" in raw:
        sd = raw["network_state_dict"]
        stats_sd = raw.get("batch_stats", {})
        meta = {k: raw[k] for k in ("epoch", "validation_loss") if k in raw}
    else:  # raw state dict
        sd, stats_sd, meta = raw, {}, {}
    skipped: list[str] = []

    def fill(tree, flat, prefix=""):
        out = {}
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, dict):
                out[k] = fill(v, flat, name)
            else:
                if name not in flat:
                    if strict:
                        raise KeyError(f"checkpoint missing parameter {name!r}")
                    skipped.append(name)
                    out[k] = np.asarray(v)
                    continue
                arr = flat[name].numpy()
                if name.endswith(".kernel") and arr.ndim == 4:
                    arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
                if tuple(arr.shape) != tuple(v.shape):
                    if strict:
                        raise ValueError(
                            f"shape mismatch for {name}: checkpoint {arr.shape} "
                            f"vs model {tuple(v.shape)}")
                    skipped.append(name)
                    out[k] = np.asarray(v)
                    continue
                out[k] = np.asarray(arr, dtype=np.asarray(v).dtype)
        return out

    params = fill(jax.device_get(template.params), sd)
    batch_stats = template.batch_stats
    if stats_sd and template.batch_stats:
        batch_stats = fill(jax.device_get(template.batch_stats), stats_sd)
    if skipped:
        meta = dict(meta, skipped=skipped)
    return template.replace(params=params, batch_stats=batch_stats), meta
