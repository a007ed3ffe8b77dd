"""Model factory — both naming surfaces of the reference.

1. smp-style (Path B ``smp.create_model(**config['model'])``,
   ``Main_MMR_SegModel.py:589``): ``create_model(arch='UnetPlusPlus',
   encoder_name='tu-mobilenetv3_small_100', encoder_weights='imagenet',
   in_channels=3, classes=10)``.
2. Path-A zoo strings (``ModelTraining.py:238-280``): ``segnet``, ``unet``,
   ``resnet18`` / ``resnet34``, ``smp_UNet++``, ``smp_unet18``,
   ``smp_DeepLabV3+``, ``smp_MANet`` — accepted directly as ``arch``.

Also provides per-encoder input preprocessing (the
``smp.encoders.get_preprocessing_fn`` capability used at
``Pre_Process.py:626``): ImageNet mean/std normalization of [0,1] RGB.

``encoder_weights='imagenet'`` resolves through
:mod:`mmr_tpu.models.pretrained` (offline weight store + torch-checkpoint
importer); when no weights are available locally the model falls back to
random init with a warning (this image has no network egress).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from mmr_tpu.models.decoders import (
    DeepLabV3PlusModel,
    MAnetModel,
    SegformerModel,
    UnetDecoderModel,
    UnetPlusPlusModel,
)
from mmr_tpu.models.encoders import get_encoder
from mmr_tpu.models.resnet_unet import ResNetUNet
from mmr_tpu.models.segnet import SegNet
from mmr_tpu.models.unet import UNet

log = logging.getLogger(__name__)

_SMP_ARCHES = {
    "unet": UnetDecoderModel,
    "unetplusplus": UnetPlusPlusModel,
    "unet++": UnetPlusPlusModel,
    "deeplabv3plus": DeepLabV3PlusModel,
    "deeplabv3+": DeepLabV3PlusModel,
    "manet": MAnetModel,
    "segformer": SegformerModel,
}

# Path-A zoo string → (builder, fixed encoder)
_PATH_A_ZOO: dict[str, Callable[..., Any]] = {
    "segnet": lambda classes, dtype, **kw: SegNet(classes, apply_softmax=kw.pop("apply_softmax", False), dtype=dtype),
    "unet": lambda classes, dtype, **kw: UNet(classes, dtype=dtype, **kw),
    "resnet18": lambda classes, dtype, **kw: ResNetUNet(classes, depth=18, dtype=dtype),
    "resnet34": lambda classes, dtype, **kw: ResNetUNet(classes, depth=34, dtype=dtype),
    "smp_unet++": lambda classes, dtype, **kw: UnetPlusPlusModel(classes, encoder_name=kw.pop("encoder_name", "resnet18"), dtype=dtype),
    "smp_unet18": lambda classes, dtype, **kw: UnetDecoderModel(classes, encoder_name="resnet18", dtype=dtype),
    "smp_deeplabv3+": lambda classes, dtype, **kw: DeepLabV3PlusModel(classes, encoder_name="resnet18", dtype=dtype),
    "smp_manet": lambda classes, dtype, **kw: MAnetModel(classes, encoder_name="resnet18", dtype=dtype),
}

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class Preprocessing:
    mean: tuple[float, float, float]
    std: tuple[float, float, float]

    def __call__(self, x):
        mean = jnp.asarray(self.mean, dtype=jnp.float32)
        std = jnp.asarray(self.std, dtype=jnp.float32)
        return (x - mean) / std


def get_preprocessing(encoder_name: str | None = None) -> Preprocessing:
    if encoder_name is None:
        return Preprocessing(tuple(IMAGENET_MEAN), tuple(IMAGENET_STD))
    spec = get_encoder(encoder_name)
    return Preprocessing(spec.mean, spec.std)


def list_models() -> dict[str, list[str]]:
    from mmr_tpu.models.encoders import ENCODERS

    return {
        "archs": sorted(set(_SMP_ARCHES)),
        "path_a": sorted(_PATH_A_ZOO),
        "encoders": sorted(ENCODERS),
    }


def create_model(
    arch: str,
    encoder_name: str | None = None,
    encoder_weights: str | None = None,
    in_channels: int = 3,
    classes: int = 10,
    dtype=jnp.bfloat16,
    **kwargs,
):
    """Build a flax segmentation model.

    Returns ``(module, init_hook)`` where ``init_hook(variables)`` loads
    pretrained encoder weights into freshly initialized variables (identity
    when ``encoder_weights`` is None or unavailable).
    """
    key = arch.lower().replace("-", "").replace(" ", "")
    # "unet" is ambiguous: Path A's hand-written UNet (no encoder arg,
    # ModelTraining.py:255-258) vs smp's generic Unet. An explicit
    # encoder_name selects the generic family.
    use_path_a = key in _PATH_A_ZOO and not (key in _SMP_ARCHES and encoder_name)
    if use_path_a:
        path_a_kwargs = dict(kwargs)
        if encoder_name and key.startswith("smp_"):
            path_a_kwargs["encoder_name"] = encoder_name
        module = _PATH_A_ZOO[key](classes, dtype, **path_a_kwargs)
        enc = getattr(module, "encoder_name", None)
    elif key in _SMP_ARCHES:
        cls = _SMP_ARCHES[key]
        build_kwargs = dict(kwargs)
        if encoder_name:
            build_kwargs["encoder_name"] = encoder_name
        module = cls(classes, dtype=dtype, **build_kwargs)
        enc = module.encoder_name
    else:
        raise ValueError(
            f"unknown arch {arch!r}; known: {sorted(_SMP_ARCHES) + sorted(_PATH_A_ZOO)}"
        )

    def init_hook(variables):
        if encoder_weights in (None, "", "none", "None"):
            return variables
        from mmr_tpu.models.pretrained import load_encoder_weights

        try:
            return load_encoder_weights(variables, enc, encoder_weights)
        except FileNotFoundError:
            log.warning(
                "pretrained weights %r for encoder %r not found locally; "
                "using random init", encoder_weights, enc,
            )
            return variables

    return module, init_hook
