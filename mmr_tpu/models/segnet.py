"""SegNet-style strided encoder/decoder (no skips), the Path-A ``segnet.py``.

Capability parity with ``MMR_Seg_Unet/MMR_Core_ModelData/UArchModel/segnet.py``:

- Encoder: 5 convs — 4×4 stride-2 pad-1 (3→64→128→256→512) then 4×4 stride-1
  pad-0 (512→1024), each + BN (configurable momentum) + ReLU
  (``segnet.py:87-117``)
- Decoder: mirrored ConvTranspose2d stack (1024→512 k4 s1 p0, then 512→256→
  128→64→classes k4 s2 p1) with BN and Dropout2d on the first three blocks
  (``segnet.py:185-221``)
- The reference bakes ``nn.Softmax(dim=1)`` into the decoder output
  (``segnet.py:220``, flagged in-code as a CE-training hazard) — preserved
  behind ``apply_softmax`` (default True for parity; trainers pass False to
  get logits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmr_tpu.models.layers import ConvBN, ConvTransposeBN, Dropout2d


class SegNet(nn.Module):
    num_classes: int
    in_channels: int = 3
    bn_momentum: float = 0.1
    drop_rate: float = 0.5
    apply_softmax: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # ---- encoder (segnet.py:87-117) ----
        enc = lambda ch, s, p, name: ConvBN(
            ch, kernel=(4, 4), strides=(s, s), padding=p, act="relu",
            bn_momentum=self.bn_momentum, dtype=self.dtype, name=name)
        x = enc(64, 2, 1, "enc1")(x, train)
        x = enc(128, 2, 1, "enc2")(x, train)
        x = enc(256, 2, 1, "enc3")(x, train)
        x = enc(512, 2, 1, "enc4")(x, train)
        x = enc(1024, 1, 0, "enc5")(x, train)

        # ---- decoder (segnet.py:185-221) ----
        x = ConvTransposeBN(512, (4, 4), (1, 1), 0, bn_momentum=self.bn_momentum,
                            dtype=self.dtype, name="dec1")(x, train)
        x = Dropout2d(self.drop_rate, name="drop1")(x, train)
        x = ConvTransposeBN(256, (4, 4), (2, 2), 1, bn_momentum=self.bn_momentum,
                            dtype=self.dtype, name="dec2")(x, train)
        x = Dropout2d(self.drop_rate, name="drop2")(x, train)
        x = ConvTransposeBN(128, (4, 4), (2, 2), 1, bn_momentum=self.bn_momentum,
                            dtype=self.dtype, name="dec3")(x, train)
        x = Dropout2d(self.drop_rate, name="drop3")(x, train)
        x = ConvTransposeBN(64, (4, 4), (2, 2), 1, bn_momentum=self.bn_momentum,
                            dtype=self.dtype, name="dec4")(x, train)
        x = ConvTransposeBN(self.num_classes, (4, 4), (2, 2), 1, act="identity",
                            bn_momentum=self.bn_momentum, dtype=self.dtype,
                            name="dec5")(x, train)
        x = x.astype(jnp.float32)
        if self.apply_softmax:
            x = jax.nn.softmax(x, axis=-1)
        return x
