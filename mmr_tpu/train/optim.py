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


@dataclasses.dataclass(frozen=True)
class FusedAdamW:
    """Flat-buffer clip+AdamW: the whole update runs as ONE global-norm
    reduction plus ONE fused elementwise pass over a single concatenated
    f32 vector, instead of O(n_leaves) tiny per-leaf kernels (~340 leaves ×
    {square-sum, scale, mu, nu, direction, decay, apply} — measured ~2 ms of
    pure dispatch/ramp overhead per step on the bench chip, docs/PERF.md).

    Update rule is exactly the optax chain ``clip_by_global_norm →
    scale_by_adam → add_decayed_weights`` (torch AdamW semantics: decay
    decoupled from the moments, still scaled by lr —
    ``Main_MMR_SegModel.py:859-890`` builds torch.optim.AdamW), equivalence-
    tested against the optax chain in tests/test_train.py. LR-free like
    :class:`Optimizer`: the caller scales the direction by -lr (per-epoch LR
    changes never recompile), and ``differential_lr`` folds the reference's
    0.1× non-encoder factor (``ModelTraining.py:375-383``) into a static
    per-element multiplier vector."""

    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 1e-2
    clip: float | None = None
    differential_lr: bool = False
    encoder_path: str = "encoder"

    def _mult_flat(self, params):
        if not self.differential_lr:
            return None
        parts = jax.tree_util.tree_map_with_path(
            lambda path, p: jnp.full(
                (p.size,),
                1.0 if any(getattr(q, "key", None) == self.encoder_path
                           for q in path) else 0.1, jnp.float32),
            params)
        return jnp.concatenate(jax.tree_util.tree_leaves(parts))

    def init(self, params):
        n = sum(p.size for p in jax.tree_util.tree_leaves(params))
        # mu and nu must be DISTINCT buffers: the jitted train step donates
        # the whole state, and donating one aliased buffer twice is a runtime
        # error on every backend ("Attempt to donate the same buffer twice")
        return {"mu": jnp.zeros((n,), jnp.float32),
                "nu": jnp.zeros((n,), jnp.float32),
                "count": jnp.zeros((), jnp.int32)}

    def apply_updates(self, params, opt_state, grads, lr):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        g_leaves = treedef.flatten_up_to(grads)
        g = jnp.concatenate([x.ravel().astype(jnp.float32)
                             for x in g_leaves])
        p = jnp.concatenate([x.ravel().astype(jnp.float32) for x in leaves])
        if self.clip:
            gn = jnp.sqrt(jnp.sum(g * g))
            g = g * jnp.minimum(1.0, self.clip / jnp.maximum(gn, 1e-12))
        c = opt_state["count"] + 1
        mu = self.b1 * opt_state["mu"] + (1.0 - self.b1) * g
        nu = self.b2 * opt_state["nu"] + (1.0 - self.b2) * g * g
        cf = c.astype(jnp.float32)
        mhat = mu / (1.0 - self.b1 ** cf)
        nhat = nu / (1.0 - self.b2 ** cf)
        d = mhat / (jnp.sqrt(nhat) + self.eps) + self.weight_decay * p
        mult = self._mult_flat(params)
        if mult is not None:
            d = d * mult
        newp = p - lr * d
        outs, off = [], 0
        for x in leaves:
            outs.append(jax.lax.slice(newp, (off,), (off + x.size,))
                        .reshape(x.shape).astype(x.dtype))
            off += x.size
        return (jax.tree_util.tree_unflatten(treedef, outs),
                {"mu": mu, "nu": nu, "count": c})


def build_optimizer(
    name: str,
    clip_grad_norm: float | None = None,
    differential_lr: bool = False,
    encoder_path: str = "encoder",
    fused: bool | None = None,
    **kw,
) -> Optimizer | FusedAdamW:
    if fused is None:
        fused = name.lower() == "adamw"
    if fused and name.lower() == "adamw":
        betas = tuple(kw.get("betas", (0.9, 0.999)))
        return FusedAdamW(
            b1=betas[0], b2=betas[1], eps=float(kw.get("eps", 1e-8)),
            weight_decay=float(kw.get("weight_decay", 1e-2)),
            clip=float(clip_grad_norm) if clip_grad_norm else None,
            differential_lr=differential_lr, encoder_path=encoder_path)
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
