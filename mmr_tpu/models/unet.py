"""Classic U-Net (the Path-A hand-written model).

Capability parity with ``MMR_Seg_Unet/MMR_Core_ModelData/UArchModel/unet.py``
(255 LoC) + ``unet_parts.py`` (418 LoC):

- 4-down/4-up, 64→1024 channels; ``factor=2`` halves deep channels when
  ``bilinear=True`` (``unet.py:144-169``)
- DoubleConv = (Conv3×3 → BN → ReLU) ×2 (``unet_parts.py:93-103``); the
  bilinear branch uses mid_channels = in//2 (``unet_parts.py:27``)
- Down = MaxPool2 + DoubleConv (``unet_parts.py:171-175``)
- Up = upsample ×2 → pad-to-skip (odd sizes) → concat [skip, up] → DoubleConv
  (``unet_parts.py:308-338``); **quirk preserved**: the "bilinear" branch
  actually upsamples with ``mode='nearest'`` (``unet_parts.py:262-266``) —
  exposed via ``upsample_mode`` (default reproduces the quirk; set
  ``"bilinear"`` for a true bilinear variant)
- non-bilinear branch uses ConvTranspose2d(k=2, s=2) (``unet_parts.py:30``)
- OutConv 1×1 head (``unet_parts.py:392-401``)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mmr_tpu.models.layers import ConvBN
from mmr_tpu.ops.padcrop import pad_to
from mmr_tpu.ops.resize import upsample2x


class DoubleConv(nn.Module):
    out_ch: int
    mid_ch: int | None = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_ch or self.out_ch
        x = ConvBN(mid, dtype=self.dtype, name="conv1")(x, train)
        return ConvBN(self.out_ch, dtype=self.dtype, name="conv2")(x, train)


class UNet(nn.Module):
    num_classes: int
    in_channels: int = 3
    bilinear: bool = True
    upsample_mode: str = "nearest"  # the reference quirk; "bilinear" available
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        factor = 2 if self.bilinear else 1
        x1 = DoubleConv(64, dtype=self.dtype, name="inc")(x, train)

        def down(y, ch, name):
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
            return DoubleConv(ch, dtype=self.dtype, name=name)(y, train)

        x2 = down(x1, 128, "down1")
        x3 = down(x2, 256, "down2")
        x4 = down(x3, 512, "down3")
        x5 = down(x4, 1024 // factor, "down4")

        def up(y, skip, out_ch, name):
            in_ch = y.shape[-1] + skip.shape[-1]
            if self.bilinear:
                y = upsample2x(y, self.upsample_mode)
                mid = in_ch // 2
            else:
                y = nn.ConvTranspose(y.shape[-1] // 2, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, param_dtype=jnp.float32,
                                     name=f"{name}_upconv")(y)
                mid = None
            y = pad_to(y, (skip.shape[-3], skip.shape[-2]))
            y = jnp.concatenate([skip, y], axis=-1)  # [x2, x1] order, unet_parts.py:94
            return DoubleConv(out_ch, mid, dtype=self.dtype, name=f"{name}_conv")(y, train)

        y = up(x5, x4, 512 // factor, "up1")
        y = up(y, x3, 256 // factor, "up2")
        y = up(y, x2, 128 // factor, "up3")
        y = up(y, x1, 64, "up4")
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="outc")(y)
        return logits.astype(jnp.float32)
