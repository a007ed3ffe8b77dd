"""ConvNeXt / ConvNeXt-V2 encoder (timm ``tu-convnext*`` capability).

The reference's best published result uses ``Unet + tu-convnextv2_tiny``
(83.55% test mIoU, PKG-INFO Example 3). ConvNeXt is a 4-stage pyramid
(strides 4/8/16/32) — there is no stride-2 feature, so the pyramid's first
level is ``None`` and decoders skip that concat (same contract smp uses for
4-reduction timm encoders).

V2 replaces LayerScale with GRN (global response normalization) in the MLP.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXt-V2)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x * nx.astype(x.dtype)) + beta + x.astype(jnp.float32)).astype(x.dtype)


class ConvNeXtBlock(nn.Module):
    dim: int
    use_grn: bool = False
    ls_init: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=self.dim,
                    dtype=self.dtype, param_dtype=jnp.float32, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        if self.use_grn:
            y = GRN(4 * self.dim, name="grn")(y)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="pwconv2")(y)
        if not self.use_grn:
            gamma = self.param("gamma", nn.initializers.constant(self.ls_init), (self.dim,))
            y = y * gamma.astype(y.dtype)
        return x + y


class ConvNeXtEncoder(nn.Module):
    depths: tuple[int, ...] = (3, 3, 9, 3)
    dims: tuple[int, ...] = (96, 192, 384, 768)
    use_grn: bool = False  # True → ConvNeXt-V2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BN/dropout in the encoder trunk
        feats = [None]  # no stride-2 feature
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="stem_norm")(x)
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"downsample_norm{i}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"downsample_conv{i}")(x)
            for b in range(depth):
                x = ConvNeXtBlock(dim, use_grn=self.use_grn, dtype=self.dtype,
                                  name=f"stage{i}_block{b}")(x)
            feats.append(x)
        return feats  # [None, s4, s8, s16, s32]
