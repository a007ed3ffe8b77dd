"""Optimizers with torch-equivalent update rules (optax chains).

Covers the reference's optimizer surface:
- Path A: Adam (torch-style coupled L2 via grad += wd·param), AdamW
  (decoupled), SGD momentum 0.9 (``ModelTraining.py:362-383``), plus
  **differential LR**: encoder params at ``lr``, the rest at ``0.1·lr``
  (``ModelTraining.py:375-383``).
- Path B: any torch optimizer name from config.yaml (``Main_MMR_SegModel.py:
  859-890``) — the names used in practice (Adam/AdamW/SGD/RMSprop) are mapped.

TPU/XLA design: the returned transformation is **learning-rate-free**; the
train step multiplies the update direction by ``-lr`` (and the per-leaf
differential-LR factor) passed as a dynamic scalar. LR changes per epoch never
retrace or recompile the step. AdamW's decoupled decay is handled the same way
(decay folded into the direction using the per-leaf factor so that
``param -= lr·(adam_dir + wd·param)``, exactly torch AdamW).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class Optimizer:
    """LR-free direction transform + per-leaf LR multipliers."""

    tx: optax.GradientTransformation
    lr_mult: Callable[[Any], Any]  # params -> pytree of per-leaf multipliers

    def init(self, params):
        return self.tx.init(params)

    def apply_updates(self, params, opt_state, grads, lr):
        direction, new_state = self.tx.update(grads, opt_state, params)
        mult = self.lr_mult(params)
        new_params = jax.tree_util.tree_map(
            lambda p, d, m: (p - lr * m * d).astype(p.dtype), params, direction, mult)
        return new_params, new_state


def _direction_chain(name: str, **kw) -> optax.GradientTransformation:
    """Ascent-direction chain (to be scaled by -lr outside)."""
    name = name.lower()
    wd = float(kw.get("weight_decay", 0.0) or 0.0)
    betas = tuple(kw.get("betas", (0.9, 0.999)))
    eps = float(kw.get("eps", 1e-8))
    if name == "adam":
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))  # torch Adam: coupled L2
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        return optax.chain(*chain)
    if name == "adamw":
        # torch AdamW: param -= lr·(adam_dir + wd·param) — decay decoupled from
        # moments but still scaled by lr → append decay AFTER the moments.
        wd = float(kw.get("weight_decay", 1e-2))
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(wd),
        )
    if name == "sgd":
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        momentum = float(kw.get("momentum", 0.9) or 0.0)
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=False))
        return optax.chain(*chain) if chain else optax.identity()
    if name == "rmsprop":
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_rms(decay=float(kw.get("alpha", 0.99)), eps=eps))
        return optax.chain(*chain)
    raise ValueError(f"unknown optimizer {name!r}")


def build_optimizer(
    name: str,
    clip_grad_norm: float | None = None,
    differential_lr: bool = False,
    encoder_path: str = "encoder",
    **kw,
) -> Optimizer:
    chain = []
    if clip_grad_norm:
        chain.append(optax.clip_by_global_norm(float(clip_grad_norm)))
    chain.append(_direction_chain(name, **kw))
    tx = optax.chain(*chain)

    if differential_lr:
        def lr_mult(params):
            # encoder params at 1.0·lr, everything else at 0.1·lr
            # (ModelTraining.py:375-383)
            return jax.tree_util.tree_map_with_path(
                lambda path, _: jnp.float32(
                    1.0 if any(getattr(p, "key", None) == encoder_path for p in path)
                    else 0.1),
                params,
            )
    else:
        def lr_mult(params):
            return jax.tree_util.tree_map(lambda _: jnp.float32(1.0), params)

    return Optimizer(tx=tx, lr_mult=lr_mult)
