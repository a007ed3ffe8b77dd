"""Mixed-precision policy: bf16 compute, f32 params/optimizer state.

The reference uses CUDA AMP (``GradScaler``/``autocast``,
``MMR_EN:DE_CODER/MMR_Segmentation/Main_MMR_SegModel.py:107,696,715``) and fp16
+ channels_last at inference (``Main_MMR_SegModel.py:1243-1244``). On TPU the
idiomatic equivalent is bfloat16 compute with float32 parameters and no loss
scaling (bf16 has f32's exponent range), and NHWC is already XLA:TPU's native
layout — both captured by this policy object.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32  # logits/loss in f32 for stable softmax

    def cast_compute(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_output(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.output_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_PRECISION = Precision()
FP32_PRECISION = Precision(compute_dtype=jnp.float32)


def resolve(name: str | None) -> Precision:
    """Map config strings (``bf16``/``fp32``/``amp``/``fp16``) to a policy."""
    if name in (None, "bf16", "bfloat16", "amp", "fp16", "half", "mixed"):
        return DEFAULT_PRECISION
    if name in ("fp32", "float32", "full"):
        return FP32_PRECISION
    raise ValueError(f"unknown precision {name!r}")
