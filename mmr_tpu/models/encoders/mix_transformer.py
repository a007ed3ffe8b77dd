"""MixVisionTransformer (Segformer) encoder — the ``mit_b*`` capability.

PKG-INFO Example 2 trains ``Segformer + mit_b2`` to 82.38% test mIoU. This is
the SegFormer hierarchical encoder: overlapping patch embeddings, efficient
self-attention with spatial-reduction (sr_ratio 8/4/2/1), Mix-FFN with a
depthwise conv. 4 stages at strides 4/8/16/32 (first pyramid level is None).

TPU notes: attention runs as batched matmuls on the MXU; sequence lengths are
static per input shape; layouts stay NHWC until each stage flattens to
(B, H·W, C).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class EfficientAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw: tuple[int, int]):
        b, n, c = x.shape
        h, w = hw
        heads = self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="q")(x)
        kv_in = x
        if self.sr_ratio > 1:
            xs = x.reshape(b, h, w, c)
            xs = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio), dtype=self.dtype,
                         param_dtype=jnp.float32, name="sr")(xs)
            kv_in = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                                 name="sr_norm")(xs.reshape(b, -1, c))
        k = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="k")(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="v")(kv_in)

        def split(t):
            return t.reshape(b, -1, heads, c // heads).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scale = (c // heads) ** -0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    expand: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw: tuple[int, int]):
        b, n, c = x.shape
        h, w = hw
        hidden = self.dim * self.expand
        y = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        y = y.reshape(b, h, w, hidden)
        y = nn.Conv(hidden, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=hidden,
                    dtype=self.dtype, param_dtype=jnp.float32, name="dwconv")(y)
        y = nn.gelu(y.reshape(b, n, hidden), approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(y)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        x = x + EfficientAttention(self.dim, self.num_heads, self.sr_ratio,
                                   dtype=self.dtype, name="attn")(ln("norm1")(x), hw)
        x = x + MixFFN(self.dim, dtype=self.dtype, name="mlp")(ln("norm2")(x), hw)
        return x


class MixVisionTransformerEncoder(nn.Module):
    dims: tuple[int, ...] = (64, 128, 320, 512)
    depths: tuple[int, ...] = (3, 4, 6, 3)
    num_heads: tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: tuple[int, ...] = (8, 4, 2, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        feats = [None]
        patch = [(7, 4, 3), (3, 2, 1), (3, 2, 1), (3, 2, 1)]  # (kernel, stride, pad)
        for i, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            k, s, p = patch[i]
            x = nn.Conv(dim, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"patch_embed{i + 1}")(x)
            b, h, w, c = x.shape
            t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"patch_norm{i + 1}")(x.reshape(b, h * w, c))
            for blk in range(depth):
                t = MiTBlock(dim, self.num_heads[i], self.sr_ratios[i],
                             dtype=self.dtype, name=f"stage{i + 1}_block{blk}")(t, (h, w))
            t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"norm{i + 1}")(t)
            x = t.reshape(b, h, w, c)
            feats.append(x)
        return feats  # [None, s4, s8, s16, s32]
