"""ResNet-18/34 feature-pyramid encoder (NHWC, flax).

The capability of torchvision ``resnet18/34`` as used by the reference's
ResNetUNet (``resnet_unet.py:152-190``) and smp's resnet encoders
(``ModelTraining.py:247-278``): 7×7/2 stem → maxpool/2 → four BasicBlock
stages. Returns features after stem-relu (s2), layer1 (s4), layer2 (s8),
layer3 (s16), layer4 (s32). Weight layout is import-compatible with
torchvision state dicts via ``mmr_tpu.models.import_torch``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dilation: int = 1  # smp make_dilated: every conv gets stride 1 + dilation
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[((k // 2) * d, (k // 2) * d)] * 2,
            kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)

        identity = x
        y = nn.relu(bn("bn1")(conv(self.features, 3, self.strides, "conv1")(x)))
        y = bn("bn2")(conv(self.features, 3, 1, "conv2")(y))
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = bn("downsample_bn")(
                conv(self.features, 1, self.strides, "downsample_conv")(x))
        return nn.relu(y + identity)


class ResNetEncoder(nn.Module):
    stage_sizes: tuple[int, ...] = (2, 2, 2, 2)
    # smp ``EncoderMixin.make_dilated(output_stride=16)`` capability
    # (``smp/encoders/_base.py``): every conv of the LAST stage is mutated to
    # stride 1 / dilation 2 / padding (k//2)*2, so f5 stays at stride 16 —
    # required by DeepLabV3+ (``ModelTraining.py:263-269`` builds it with the
    # default ``encoder_output_stride=16``).
    output_stride: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn1")(x)
        f1 = nn.relu(x)  # stride 2, 64ch — torchvision 'relu' output

        x = nn.max_pool(f1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = []
        last = len(self.stage_sizes) - 1
        for i, (n_blocks, ch) in enumerate(zip(self.stage_sizes, (64, 128, 256, 512))):
            dilated = self.output_stride == 16 and i == last
            for b in range(n_blocks):
                stride = 2 if (b == 0 and i > 0 and not dilated) else 1
                x = BasicBlock(ch, stride, dilation=2 if dilated else 1,
                               dtype=self.dtype, name=f"layer{i + 1}_{b}")(x, train)
            feats.append(x)
        return [f1] + feats  # strides 2, 4, 8, 16, 32 (16 dilated at os=16)
