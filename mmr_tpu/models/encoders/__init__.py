"""Encoder registry — the generic-encoder capability of the reference's
Path B (``smp.create_model(**config['model'])``, ``Main_MMR_SegModel.py:589``):
swap encoders without touching the training loop.

Every encoder is a flax module returning a 5-level NHWC feature pyramid
``[f1 (s2), f2 (s4), f3 (s8), f4 (s16), f5 (s32)]`` plus declared channel
counts, and ships its preprocessing statistics (per-encoder ImageNet
normalization, the ``smp.get_preprocessing_fn`` semantics used at
``Pre_Process.py:626``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from mmr_tpu.models.encoders.resnet import ResNetEncoder
from mmr_tpu.models.encoders.mobilenetv3 import MobileNetV3SmallEncoder
from mmr_tpu.models.encoders.convnext import ConvNeXtEncoder
from mmr_tpu.models.encoders.mix_transformer import MixVisionTransformerEncoder

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class EncoderSpec:
    build: Callable  # (dtype) -> nn.Module
    channels: tuple[int, ...]  # channels of [f1..f5]
    mean: tuple[float, float, float] = IMAGENET_MEAN
    std: tuple[float, float, float] = IMAGENET_STD


ENCODERS: dict[str, EncoderSpec] = {
    "resnet18": EncoderSpec(
        build=lambda dtype, name, **kw: ResNetEncoder(stage_sizes=(2, 2, 2, 2), dtype=dtype, name=name, **kw),
        channels=(64, 64, 128, 256, 512),
    ),
    "resnet34": EncoderSpec(
        build=lambda dtype, name, **kw: ResNetEncoder(stage_sizes=(3, 4, 6, 3), dtype=dtype, name=name, **kw),
        channels=(64, 64, 128, 256, 512),
    ),
    # timm-universal naming used by the reference config
    # (common_utils.py:236: 'tu-mobilenetv3_small_100')
    "tu-mobilenetv3_small_100": EncoderSpec(
        build=lambda dtype, name, **kw: MobileNetV3SmallEncoder(dtype=dtype, name=name, **kw),
        channels=(16, 16, 24, 48, 576),
    ),
    "mobilenetv3_small_100": EncoderSpec(
        build=lambda dtype, name, **kw: MobileNetV3SmallEncoder(dtype=dtype, name=name, **kw),
        channels=(16, 16, 24, 48, 576),
    ),
    # PKG-INFO Example 3 encoder family (tu-convnextv2_tiny)
    "tu-convnextv2_tiny": EncoderSpec(
        build=lambda dtype, name: ConvNeXtEncoder(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), use_grn=True, dtype=dtype, name=name),
        channels=(0, 96, 192, 384, 768),
    ),
    "tu-convnext_tiny": EncoderSpec(
        build=lambda dtype, name: ConvNeXtEncoder(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), use_grn=False, dtype=dtype, name=name),
        channels=(0, 96, 192, 384, 768),
    ),
    # PKG-INFO Example 2 encoder (Segformer mit_b2)
    "mit_b0": EncoderSpec(
        build=lambda dtype, name: MixVisionTransformerEncoder(
            dims=(32, 64, 160, 256), depths=(2, 2, 2, 2), dtype=dtype, name=name),
        channels=(0, 32, 64, 160, 256),
    ),
    "mit_b2": EncoderSpec(
        build=lambda dtype, name: MixVisionTransformerEncoder(
            dims=(64, 128, 320, 512), depths=(3, 4, 6, 3), dtype=dtype, name=name),
        channels=(0, 64, 128, 320, 512),
    ),
}


def get_encoder(name: str) -> EncoderSpec:
    if name not in ENCODERS:
        raise ValueError(f"unknown encoder {name!r}; available: {sorted(ENCODERS)}")
    return ENCODERS[name]
