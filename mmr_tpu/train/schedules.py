"""Learning-rate schedules with torch semantics, stepped **per epoch** (both
reference paths call ``scheduler.step()`` once per epoch:
``ModelTraining.py:446``, ``Main_MMR_SegModel.py:1189-1193``).

- StepLR: ``lr = base · gamma^(epoch // step_size)`` with
  ``step_size = epochs // (lr_steps + 1)`` (``ModelTraining.py:386-391``)
- PolynomialLR: ``lr = base · (1 − epoch/total_iters)^power`` (torch
  semantics; Path B default power 0.9, ``common_utils.py:200-204``)
- constant / cosine also available.

A schedule is a function ``epoch -> lr`` consumed by the optimizer through
``optax.inject_hyperparams``; the trainer passes the current epoch.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def step_lr(base_lr: float, epochs: int, lr_steps: int, gamma: float = 0.1) -> Callable[[int], float]:
    if lr_steps <= 0:
        raise ValueError("lr_steps must be > 0 (ModelTraining.py:386-391)")
    step_size = max(1, int(epochs // (lr_steps + 1)))

    def sched(epoch: int) -> float:
        return float(base_lr * gamma ** (int(epoch) // step_size))

    return sched


def polynomial_lr(base_lr: float, total_iters: int, power: float = 0.9) -> Callable[[int], float]:
    def sched(epoch: int) -> float:
        e = min(int(epoch), total_iters)
        return float(base_lr * (1.0 - e / total_iters) ** power) if total_iters > 0 else base_lr

    return sched


def cosine_lr(base_lr: float, total_epochs: int, min_lr: float = 0.0) -> Callable[[int], float]:
    def sched(epoch: int) -> float:
        e = min(int(epoch), total_epochs)
        return float(min_lr + 0.5 * (base_lr - min_lr) * (1 + np.cos(np.pi * e / max(total_epochs, 1))))

    return sched


def constant_lr(base_lr: float) -> Callable[[int], float]:
    return lambda epoch: float(base_lr)


def build_lr_schedule(config: dict, base_lr: float, n_epochs: int) -> Callable[[int], float]:
    """From the config.yaml ``lr_scheduler`` group (torch names,
    ``common_utils.py:200-204``) or Path-A flags."""
    if not config:
        return constant_lr(base_lr)
    name = config.get("name", "PolynomialLR")
    if name == "PolynomialLR":
        return polynomial_lr(base_lr, int(config.get("total_iters", n_epochs)),
                             float(config.get("power", 0.9)))
    if name == "StepLR":
        if "step_size" in config:
            step = int(config["step_size"])

            def sched(epoch: int) -> float:
                return float(base_lr * float(config.get("gamma", 0.1)) ** (int(epoch) // step))

            return sched
        return step_lr(base_lr, n_epochs, int(config.get("lr_steps", 2)),
                       float(config.get("gamma", 0.1)))
    if name == "CosineAnnealingLR":
        return cosine_lr(base_lr, int(config.get("T_max", n_epochs)),
                         float(config.get("eta_min", 0.0)))
    if name in ("none", "None", "ConstantLR"):
        return constant_lr(base_lr)
    raise ValueError(f"unknown lr scheduler {name!r}")
