"""MobileNetV3-Small encoder (timm ``mobilenetv3_small_100`` topology).

The reference's default encoder (``common_utils.py:236``:
``tu-mobilenetv3_small_100`` with ImageNet weights; 3,714,090-param UNet++
total per ``MMR_EN:DE_CODER/README.md``). Feature pyramid channels
(16, 16, 24, 48, 96) at strides (2, 4, 8, 16, 32), matching timm
``features_only=True`` outputs so timm checkpoints can be imported.

Block plan (timm arch_def for mobilenetv3_small_100):
  stem: 3×3/2 → 16, hardswish
  stage0: DS  k3 s2 c16 SE relu
  stage1: IR  k3 s2 e4.5 c24 relu ; IR k3 s1 e3.67 c24 relu
  stage2: IR  k5 s2 e4 c40 SE hs  ; 2× IR k5 s1 e6 c40 SE hs
  stage3: 2× IR k5 s1 e3 c48 SE hs
  stage4: IR  k5 s2 e6 c96 SE hs  ; 2× IR k5 s1 e6 c96 SE hs
SE reduction is 1/4 of expansion channels (divisible by 8), hard-sigmoid gate.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mmr_tpu.models.layers import FusedBatchNorm, SqueezeExcite, hard_swish


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    exp_ch: int
    out_ch: int
    kernel: int = 3
    strides: int = 1
    use_se: bool = False
    act: str = "hardswish"  # 'relu' | 'hardswish'
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu if self.act == "relu" else hard_swish
        bn = lambda name: FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        in_ch = x.shape[-1]
        shortcut = x

        y = x
        if self.exp_ch != in_ch:
            y = nn.Conv(self.exp_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_pw")(y)
            y = act(bn("bn1")(y))
        k, p = self.kernel, self.kernel // 2
        y = nn.Conv(self.exp_ch, (k, k), strides=(self.strides, self.strides),
                    padding=[(p, p), (p, p)], feature_group_count=self.exp_ch,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_dw")(y)
        y = act(bn("bn2")(y))
        if self.use_se:
            y = SqueezeExcite(_make_divisible(self.exp_ch / 4), dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_pwl")(y)
        y = bn("bn3")(y)
        if self.strides == 1 and in_ch == self.out_ch:
            y = y + shortcut
        return y


class DepthwiseSeparable(nn.Module):
    """timm 'ds' block: depthwise k3 → SE → pointwise (no expansion)."""

    out_ch: int
    kernel: int = 3
    strides: int = 1
    use_se: bool = True
    act: str = "relu"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu if self.act == "relu" else hard_swish
        bn = lambda name: FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        in_ch = x.shape[-1]
        shortcut = x
        k, p = self.kernel, self.kernel // 2
        y = nn.Conv(in_ch, (k, k), strides=(self.strides, self.strides),
                    padding=[(p, p), (p, p)], feature_group_count=in_ch,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_dw")(x)
        y = act(bn("bn1")(y))
        if self.use_se:
            y = SqueezeExcite(_make_divisible(in_ch / 4), dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_pw")(y)
        y = bn("bn2")(y)
        if self.strides == 1 and in_ch == self.out_ch:
            y = y + shortcut
        return y


class MobileNetV3SmallEncoder(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    # Run the stem + b0_0 front-end as packed-halo fused kernels
    # (models/packed_encoder.py) and return f1/f2 as PackedT (raw +
    # pending-prologue) — only valid when the consumer is the packed
    # UNet++ decoder. Identical parameter tree either way.
    packed_frontend: bool = False
    # the consumer's (decoder's) row geometry for the f2 scale: b0_0's
    # pointwise GEMM emits f2 directly at this geometry so the skip is
    # consumed raw with zero repacks (decoders.unetpp_row_geoms). None →
    # the unconstrained best_geom (pre-round-5 behavior).
    f2_geom: object = None
    # same for the f3 scale (consumed by the packed b1 blocks' delivery)
    f3_geom: object = None
    # run the b1 IR pair (expand/dw/project, k3, no SE) packed too.
    # MEASURED NEGATIVE on the flagship (docs/PERF.md round-5 "packed b1"):
    # the diagonal-expanded dw taps do cp(=128 at p2)× the real depthwise
    # MACs on the MXU — 3.4 ms/step of kernels + ~1.5 ms GEMM glue vs the
    # ~2.0 ms XLA family they replace (284.2 → 278.5 f/s end to end).
    # Correctness-proven machinery kept behind this flag.
    packed_b1: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        ir = lambda *a, **kw: InvertedResidual(*a, dtype=self.dtype, **kw)
        f3 = None
        if self.packed_frontend:
            from mmr_tpu.models.packed_encoder import (PackedDSBlock,
                                                       PackedIRBlock,
                                                       down_geom,
                                                       packed_stem)

            f1 = packed_stem(self, x, train)  # s2, 16 (PackedT, hswish pend.)
            f2 = PackedDSBlock(16, dtype=self.dtype, g_out=self.f2_geom,
                               name="b0_0")(f1, train)
            g2 = f2.geom
            # b1 packed feasibility: the stride-2 dw needs p to halve
            # cleanly, and b1_1's stride-1 dw tap matrices (9·L²·2 bytes at
            # lanes(88)) must stay kernel-friendly (≤4 MB; p=8's 10.6 MB
            # taps crowd out the row tiles)
            g_d2 = (down_geom(g2) if g2.p % 2 == 0 and g2.h % 2 == 0
                    and g2.w % 2 == 0 else None)
            g_f3 = self.f3_geom
            if g_f3 is None or g_d2 is None or not (
                    g_f3.h == g_d2.h and g_f3.w == g_d2.w
                    and g_f3.p % g_d2.p == 0
                    and g_f3.p // g_d2.p in (1, 2)
                    and g_f3.wb * (g_f3.p // g_d2.p) == g_d2.wb):
                g_f3 = g_d2
            use_b1 = (self.packed_b1 and g_d2 is not None
                      and g_d2.p >= 2
                      and 9 * g_f3.lanes(88) ** 2 * 2 <= 4 * 1024 * 1024)
            if use_b1:
                t = PackedIRBlock(72, 24, strides=2, g_out=g_f3,
                                  dtype=self.dtype, name="b1_0")(f2, train)
                f3 = PackedIRBlock(88, 24, strides=1, dtype=self.dtype,
                                   name="b1_1")(t, train)  # s8, 24 (PackedT)
                x3 = f3.unpack().astype(self.dtype)  # NHWC for b2_0
            else:
                x2 = f2.unpack().astype(self.dtype)  # NHWC for the XLA tail
        else:
            x = nn.Conv(16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_stem")(x)
            f1 = hard_swish(bn("bn1")(x))  # s2, 16
            f2 = DepthwiseSeparable(16, 3, 2, True, "relu", dtype=self.dtype,
                                    name="b0_0")(f1, train)  # s4, 16
            x2 = f2

        if f3 is None:
            x = ir(72, 24, 3, 2, False, "relu", name="b1_0")(x2, train)
            f3 = ir(88, 24, 3, 1, False, "relu", name="b1_1")(x, train)
            x3 = f3  # s8, 24

        x = ir(96, 40, 5, 2, True, "hardswish", name="b2_0")(x3, train)
        x = ir(240, 40, 5, 1, True, "hardswish", name="b2_1")(x, train)
        x = ir(240, 40, 5, 1, True, "hardswish", name="b2_2")(x, train)
        x = ir(120, 48, 5, 1, True, "hardswish", name="b3_0")(x, train)
        f4 = ir(144, 48, 5, 1, True, "hardswish", name="b3_1")(x, train)  # s16, 48

        x = ir(288, 96, 5, 2, True, "hardswish", name="b4_0")(f4, train)
        x = ir(576, 96, 5, 1, True, "hardswish", name="b4_1")(x, train)
        x = ir(576, 96, 5, 1, True, "hardswish", name="b4_2")(x, train)  # s32, 96

        # timm blocks[5]: ConvBnAct 1x1 96->576 hardswish — part of
        # features_only, so the stride-32 feature timm (and hence smp's
        # TimmUniversalEncoder / the 3,714,090-param UNet++) exposes is
        # 576-channel (`MMR_EN:DE_CODER/README.md` architecture summary)
        x = nn.Conv(576, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="b5_0_conv")(x)
        f5 = hard_swish(bn("b5_0_bn1")(x))

        return [f1, f2, f3, f4, f5]
