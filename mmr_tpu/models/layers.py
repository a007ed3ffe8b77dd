"""Shared flax.linen building blocks (NHWC, mixed-precision aware).

Conventions:
- All modules take/return NHWC; compute dtype is configurable (bf16 default
  via the model wrappers), params always f32.
- BatchNorm follows torch semantics (momentum 0.1 torch == 0.9 flax;
  eps 1e-5) so imported torch running stats behave identically.
- ``train`` flag switches BN batch-stats updates and dropout.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "relu6": nn.relu6,
    "hardswish": hard_swish,
    "silu": nn.silu,
    "gelu": nn.gelu,
    "identity": lambda x: x,
}


class Conv3x3(nn.Module):
    """3x3 stride-1 SAME conv with ``nn.Conv``-identical params (kernel HWIO,
    optional bias) that routes through the packed-lane Pallas kernel on TPU
    (``ops/pallas/conv3x3_packed.py``) when the autotuned dispatch table says
    it beats XLA's im2col lowering. Checkpoint-compatible with ``nn.Conv``."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from mmr_tpu.ops.pallas.conv3x3_packed import conv3x3p_bias_act

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), jnp.float32)
        else:
            bias = jnp.zeros((self.features,), jnp.float32)
        if self.is_initializing():
            # registration-only: init may run on a host device where the
            # TPU kernel can't lower; values are irrelevant to param shapes
            return jnp.zeros(x.shape[:-1] + (self.features,), self.dtype)
        return conv3x3p_bias_act(x.astype(self.dtype), kernel, bias,
                                 False, self.use_bias)


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + activation — the reference's ubiquitous
    Conv→BN→ReLU unit (e.g. ``unet_parts.py:93-103``), fused by XLA on TPU."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: str | int = 1
    groups: int = 1
    act: str = "relu"
    use_bn: bool = True
    bn_momentum: float = 0.1  # torch convention
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        if (self.kernel == (3, 3) and self.strides == (1, 1)
                and self.groups == 1 and pad == [(1, 1), (1, 1)]):
            x = Conv3x3(self.features, use_bias=self.use_bias or not self.use_bn,
                        dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding=pad,
                feature_group_count=self.groups,
                use_bias=self.use_bias or not self.use_bn,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        if self.use_bn:
            # FusedBatchNorm: single-pass statistics + data-axis sync under
            # shard_map (the packed multi-device path); param-identical to
            # nn.BatchNorm
            x = FusedBatchNorm(
                use_running_average=not train,
                momentum=1.0 - self.bn_momentum,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        return ACTIVATIONS[self.act](x)


class FusedBatchNorm(nn.Module):
    """``nn.BatchNorm``-compatible (identical params/variables/semantics) but
    computes the batch statistics as ONE fused pass — sum and sum-of-squares
    reduced together, var = E[x²] − E[x]² (biased, like flax) — instead of
    flax's two dependent reductions (mean, then mean(|x−mean|²)), halving the
    BN-statistics HBM traffic of XLA-path conv stacks (the r2 trace's
    ~5.5 ms of convert_reduce time on the mbv3 encoder). The normalization is
    folded to one per-channel affine."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            from mmr_tpu.core.mesh import all_reduce_moments

            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            n = x.size // c
            sums = jnp.stack([jnp.sum(xf, axis=axes),
                              jnp.sum(xf * xf, axis=axes)])
            sums, n = all_reduce_moments(sums, n)  # sync-BN under shard_map
            mean = sums[0] / n
            var = jnp.maximum(sums[1] / n - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value \
                    + (1 - m) * jax.lax.stop_gradient(mean)
                ra_var.value = m * ra_var.value \
                    + (1 - m) * jax.lax.stop_gradient(var)
        s = scale * jax.lax.rsqrt(var + self.epsilon)
        t = bias - mean * s
        return x * s.astype(self.dtype) + t.astype(self.dtype)


class SqueezeExcite(nn.Module):
    """MobileNetV3-style SE block: global-avg-pool → reduce conv → relu →
    expand conv → hard-sigmoid gate."""

    reduced: int
    gate: str = "hard_sigmoid"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv_reduce")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv_expand")(s)
        gate = hard_sigmoid(s) if self.gate == "hard_sigmoid" else nn.sigmoid(s)
        return x * gate


class ConvTransposeBN(nn.Module):
    """ConvTranspose2D + BN + activation (SegNet decoder unit,
    ``segnet.py:185-221``)."""

    features: int
    kernel: tuple[int, int] = (4, 4)
    strides: tuple[int, int] = (2, 2)
    padding: int = 1
    act: str = "relu"
    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose2d(k, s, p) output: (in-1)*s - 2p + k.
        # flax ConvTranspose pads differently; replicate torch by using
        # padding=((k-1-p, k-1-p), ...) on the dilated input.
        # torch out = (H-1)*s - 2p + k; with lax.conv_transpose the dilated
        # input ((H-1)*s + 1) is padded (lo, hi) then VALID-convolved, so
        # lo = hi = k - 1 - p reproduces torch's shape arithmetic exactly.
        k, p = self.kernel[0], self.padding
        q = k - 1 - p
        x = nn.ConvTranspose(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=[(q, q), (q, q)],
            dtype=self.dtype,
            param_dtype=jnp.float32,
            use_bias=False,
            name="conv",
        )(x)
        x = FusedBatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.bn_momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return ACTIVATIONS[self.act](x)


class Dropout2d(nn.Module):
    """Channel-wise (spatial) dropout, torch ``nn.Dropout2d`` semantics."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask_shape = (x.shape[0], 1, 1, x.shape[-1])
        import jax

        mask = jax.random.bernoulli(rng, keep, mask_shape).astype(x.dtype)
        return x * mask / keep
