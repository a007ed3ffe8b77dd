"""ResNet-UNet: pretrained-ResNet encoder + upsample-concat decoder with a
full-resolution side path.

Capability parity with ``MMR_Seg_Unet/MMR_Core_ModelData/UArchModel/
resnet_unet.py`` (303 LoC):

- torchvision resnet18/34 sliced into layer0–4 (``resnet_unet.py:152-190``)
  — here :class:`~mmr_tpu.models.encoders.resnet.ResNetEncoder` (ImageNet
  weights loadable via the torch importer)
- per-stage 1×1 conv+ReLU adapters (``:170-190``)
- decoder: bilinear ×2 upsample with ``align_corners=True`` (``:195``) →
  concat → 3×3 conv+ReLU (``:198-201``)
- full-resolution side path ``conv_original_size0/1/2`` fused before the 1×1
  head (``:203-213``, forward ``:244-298``)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mmr_tpu.models.encoders.resnet import ResNetEncoder
from mmr_tpu.ops.resize import upsample2x


class ConvRelu(nn.Module):
    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=[(p, p), (p, p)], dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        return nn.relu(x)


class ResNetUNet(nn.Module):
    num_classes: int
    in_channels: int = 3
    depth: int = 18  # 18 | 34
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_sizes = (2, 2, 2, 2) if self.depth == 18 else (3, 4, 6, 3)
        cr = lambda ch, k, name: ConvRelu(ch, k, dtype=self.dtype, name=name)

        x_orig = cr(64, 3, "conv_original_size0")(x)
        x_orig = cr(64, 3, "conv_original_size1")(x_orig)

        l0, l1, l2, l3, l4 = ResNetEncoder(stage_sizes, dtype=self.dtype,
                                           name="encoder")(x, train)

        up = lambda y: upsample2x(y, "bilinear", align_corners=True)
        y = up(cr(512, 1, "layer4_1x1")(l4))
        y = jnp.concatenate([y, cr(256, 1, "layer3_1x1")(l3)], axis=-1)
        y = cr(512, 3, "conv_up3")(y)
        y = up(y)
        y = jnp.concatenate([y, cr(128, 1, "layer2_1x1")(l2)], axis=-1)
        y = cr(256, 3, "conv_up2")(y)
        y = up(y)
        y = jnp.concatenate([y, cr(64, 1, "layer1_1x1")(l1)], axis=-1)
        y = cr(256, 3, "conv_up1")(y)
        y = up(y)
        y = jnp.concatenate([y, cr(64, 1, "layer0_1x1")(l0)], axis=-1)
        y = cr(128, 3, "conv_up0")(y)
        y = up(y)
        y = jnp.concatenate([y, x_orig], axis=-1)
        y = cr(64, 3, "conv_original_size2")(y)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="conv_last")(y)
        return logits.astype(jnp.float32)
