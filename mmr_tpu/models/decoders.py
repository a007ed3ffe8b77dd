"""Generic encoder–decoder segmentation models (the smp-capability layer).

The reference's Path B is built on ``segmentation_models_pytorch``:
``smp.create_model(**config['model'])`` (``Main_MMR_SegModel.py:589``) with a
default of UNet++ + MobileNetV3-small (``common_utils.py:236``), and Path A
hard-codes smp UNet++/Unet/DeepLabV3+/MANet with resnet18
(``ModelTraining.py:247-278``). These are that capability rebuilt natively:
each model = registry encoder → decoder → segmentation head, all NHWC/bf16.

Decoder channel plan follows the smp convention (256, 128, 64, 32, 16) so
model sizes land in the same regime (default UNet++/MobileNetV3 ≈ 3.7M params,
``MMR_EN:DE_CODER/README.md`` architecture summary).
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn

from mmr_tpu.models.layers import ConvBN
from mmr_tpu.ops.resize import upsample2x, resize_bilinear


class DecoderBlock(nn.Module):
    """×2 nearest upsample → concat skip → (Conv3×3-BN-ReLU) ×2."""

    out_ch: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skips: list | None = None, train: bool = False):
        x = upsample2x(x, "nearest")
        cat = [x]
        if skips:
            for s in skips:
                if s is not None:
                    cat.append(s)
        if len(cat) > 1:
            x = jnp.concatenate(cat, axis=-1)
        x = ConvBN(self.out_ch, dtype=self.dtype, name="conv1")(x, train)
        return ConvBN(self.out_ch, dtype=self.dtype, name="conv2")(x, train)


class SegmentationHead(nn.Module):
    """3×3 conv head (+ optional fixed upsampling), smp SegmentationHead
    semantics."""

    num_classes: int
    upsampling: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from mmr_tpu.models.layers import Conv3x3

        x = Conv3x3(self.num_classes, dtype=self.dtype, name="conv")(x)
        if self.upsampling > 1:
            x = resize_bilinear(
                x, (x.shape[-3] * self.upsampling, x.shape[-2] * self.upsampling))
        return x.astype(jnp.float32)


class _EncoderMixin:
    def _encode(self, x, train):
        from mmr_tpu.models.encoders import get_encoder

        spec = get_encoder(self.encoder_name)
        return spec.build(self.dtype, "encoder")(x, train)


class UnetDecoderModel(nn.Module, _EncoderMixin):
    """Plain U-Net decoder over a pyramid encoder (smp ``Unet`` capability)."""

    num_classes: int
    encoder_name: str = "resnet18"
    decoder_channels: tuple[int, ...] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self._encode(x, train)  # [f1(s2) .. f5(s32)], f1 may be None
        skips = feats[:-1][::-1] + [None]  # [f4, f3, f2, f1, None]
        y = feats[-1]
        for i, ch in enumerate(self.decoder_channels):
            y = DecoderBlock(ch, dtype=self.dtype, name=f"block{i}")(
                y, [skips[i]] if skips[i] is not None else None, train)
        return SegmentationHead(self.num_classes, dtype=self.dtype, name="head")(y)


class UnetPlusPlusModel(nn.Module, _EncoderMixin):
    """UNet++ — nested dense skip connections (+ optional deep supervision).

    The reference's default architecture (``ModelTraining.py:248-254``,
    ``common_utils.py:236``; UNet++ paper: Zhou et al., 1807.10165 /
    1912.05074). Grid nodes X[i][j]: row i = pyramid level (stride 2^{i+1}),
    column j = dense-skip depth; X[i][j] consumes all same-row predecessors
    plus the ×2-upsampled X[i+1][j-1]. Output path: X[0][depth] → final
    no-skip up-block to stride 1 → head. ``deep_supervision`` averages heads
    over X[0][1..depth] (each upsampled to full res).
    """

    num_classes: int
    encoder_name: str = "tu-mobilenetv3_small_100"
    decoder_channels: tuple[int, ...] = (256, 128, 64, 32, 16)
    deep_supervision: bool = False
    # packed=True runs the decoder in the packed-halo fused-kernel dataflow
    # (ops/pallas/packed_chain.py) — same math, same param tree, TPU-only
    packed: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self._encode(x, train)
        if self.packed:
            return self._packed_decoder(feats, x, train)
        # usable rows: levels that exist (ConvNeXt/MiT have feats[0] is None)
        first = 0 if feats[0] is not None else 1
        rows = feats[first:]                       # X[i][0] = rows[i]
        depth = len(rows) - 1                      # dense columns per top row
        # row output channels, finest→coarsest, from the smp-style plan:
        # e.g. depth 4 rows get (32, 64, 128, 256)
        row_ch = list(self.decoder_channels[:-1][::-1])[: len(rows) - 1]

        grid: dict[tuple[int, int], jnp.ndarray] = {}
        for i in range(len(rows)):
            grid[(i, 0)] = rows[i]
        for j in range(1, depth + 1):
            for i in range(0, depth + 1 - j):
                below = upsample2x(grid[(i + 1, j - 1)], "nearest")
                same_row = [grid[(i, k)] for k in range(j)]
                y = jnp.concatenate(same_row + [below], axis=-1)
                y = ConvBN(row_ch[i], dtype=self.dtype, name=f"x_{i}_{j}_conv1")(y, train)
                y = ConvBN(row_ch[i], dtype=self.dtype, name=f"x_{i}_{j}_conv2")(y, train)
                grid[(i, j)] = y

        stride0 = 2 ** (first + 1)  # stride of row 0 (2, or 4 for 4-level encoders)

        def to_logits(node, j):
            y = DecoderBlock(self.decoder_channels[-1], dtype=self.dtype,
                             name=f"final_block_{j}")(node, None, train)
            head = SegmentationHead(self.num_classes, upsampling=stride0 // 2,
                                    dtype=self.dtype, name=f"head_{j}")
            return head(y)

        if self.deep_supervision:
            # all heads always exist in the param tree; train averages them,
            # eval uses only the deepest (standard UNet++ deep supervision)
            outs = [to_logits(grid[(0, j)], j) for j in range(1, depth + 1)]
            return jnp.mean(jnp.stack(outs), axis=0) if train else outs[-1]
        return to_logits(grid[(0, depth)], depth)

    def _packed_decoder(self, feats, x, train):
        """The same UNet++ grid in the packed-halo dataflow: identical param
        names (x_i_j_conv{1,2}/conv+bn, final_block_j, head_j) so
        checkpoints interchange with the standard path."""
        from mmr_tpu.models.packed_blocks import (
            PackedConvBN, pack_plain, upsample_packed)

        assert not self.deep_supervision, "packed path: deep_supervision off"
        first = 0 if feats[0] is not None else 1
        rows = feats[first:]
        depth = len(rows) - 1
        row_ch = list(self.decoder_channels[:-1][::-1])[: len(rows) - 1]
        stride0 = 2 ** (first + 1)
        assert stride0 == 2, "packed path supports 5-level encoders"

        row_main = row_ch + [rows[-1].shape[-1]]
        grid = {(i, 0): pack_plain(rows[i], row_main[i])
                for i in range(len(rows))}
        for j in range(1, depth + 1):
            for i in range(0, depth + 1 - j):
                below = upsample_packed(grid[(i + 1, j - 1)],
                                        grid[(i, 0)].geom)
                inputs = [grid[(i, k)] for k in range(j)] + [below]
                y = PackedConvBN(row_ch[i], name=f"x_{i}_{j}_conv1")(
                    inputs, train)
                y = PackedConvBN(row_ch[i], name=f"x_{i}_{j}_conv2")(
                    [y], train)
                grid[(i, j)] = y

        class _FinalBlock(nn.Module):
            out_ch: int

            @nn.compact
            def __call__(self, t, train=False):
                from mmr_tpu.ops.pallas.packed_chain import row_geom

                g = row_geom(t.geom.h * 2, t.geom.w * 2, self.out_ch)
                t = upsample_packed(t, g)
                t = PackedConvBN(self.out_ch, name="conv1")([t], train)
                return PackedConvBN(self.out_ch, name="conv2")([t], train)

        y = _FinalBlock(self.decoder_channels[-1],
                        name=f"final_block_{depth}")(grid[(0, depth)], train)
        logits = PackedConvBN(self.num_classes, use_bn=False,
                              name=f"head_{depth}")([y], train)
        return logits.unpack().astype(jnp.float32)


class SegformerModel(nn.Module, _EncoderMixin):
    """Segformer: MiT (or any pyramid) encoder + all-MLP decode head
    (PKG-INFO Example 2 capability: ``--model_arch Segformer
    --model_encoder_name mit_b2``). Each pyramid level is linearly projected
    to ``embed_dim``, upsampled to stride 4, concatenated, fused, headed."""

    num_classes: int
    encoder_name: str = "mit_b2"
    embed_dim: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = [f for f in self._encode(x, train) if f is not None][-4:]
        target_hw = (feats[0].shape[-3], feats[0].shape[-2])
        proj = []
        for i, f in enumerate(feats):
            y = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"linear_c{i + 1}")(f)
            if (y.shape[-3], y.shape[-2]) != target_hw:
                y = resize_bilinear(y, target_hw)
            proj.append(y)
        y = jnp.concatenate(proj[::-1], axis=-1)
        y = ConvBN(self.embed_dim, kernel=(1, 1), padding=0, dtype=self.dtype,
                   name="fuse")(y, train)
        up = x.shape[-3] // y.shape[-3]
        return SegmentationHead(self.num_classes, upsampling=up, dtype=self.dtype,
                                name="head")(y)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (DeepLabV3+)."""

    out_ch: int = 256
    rates: tuple[int, ...] = (12, 24, 36)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = [ConvBN(self.out_ch, kernel=(1, 1), padding=0, dtype=self.dtype,
                           name="conv1x1")(x, train)]
        for r in self.rates:
            y = nn.Conv(self.out_ch, (3, 3), padding=[(r, r), (r, r)],
                        kernel_dilation=(r, r), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"atrous{r}_conv")(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"atrous{r}_bn")(y)
            branches.append(nn.relu(y))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBN(self.out_ch, kernel=(1, 1), padding=0, dtype=self.dtype,
                        name="pool_conv")(pooled, train)
        pooled = jnp.broadcast_to(pooled, x.shape[:-1] + (self.out_ch,))
        y = jnp.concatenate(branches + [pooled], axis=-1)
        return ConvBN(self.out_ch, kernel=(1, 1), padding=0, dtype=self.dtype,
                      name="project")(y, train)


class DeepLabV3PlusModel(nn.Module, _EncoderMixin):
    """DeepLabV3+ (smp ``smp_DeepLabV3+`` capability,
    ``ModelTraining.py:263-269``): ASPP on the deepest feature, ×4 upsample,
    concat with a 48-ch projection of the stride-4 feature, refine, ×4 head."""

    num_classes: int
    encoder_name: str = "resnet18"
    aspp_ch: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self._encode(x, train)
        deep = feats[-1]   # s32
        high = feats[1]    # s4 (present for every registered encoder)
        y = ASPP(self.aspp_ch, dtype=self.dtype, name="aspp")(deep, train)
        y = resize_bilinear(y, (high.shape[-3], high.shape[-2]))
        h = ConvBN(48, kernel=(1, 1), padding=0, dtype=self.dtype, name="high_proj")(high, train)
        y = jnp.concatenate([y, h], axis=-1)
        y = ConvBN(256, dtype=self.dtype, name="refine1")(y, train)
        y = ConvBN(256, dtype=self.dtype, name="refine2")(y, train)
        up = x.shape[-3] // y.shape[-3]
        return SegmentationHead(self.num_classes, upsampling=up, dtype=self.dtype,
                                name="head")(y)


class PAB(nn.Module):
    """Position attention block (MANet) on the deepest feature."""

    out_ch: int
    mid_ch: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = nn.Conv(self.mid_ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="q")(x)
        k = nn.Conv(self.mid_ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="k")(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="v")(x)
        q = q.reshape(b, h * w, self.mid_ch)
        k = k.reshape(b, h * w, self.mid_ch)
        v = v.reshape(b, h * w, c)
        attn = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        y = jnp.einsum("bnm,bmc->bnc", attn, v, preferred_element_type=jnp.float32)
        y = y.astype(self.dtype).reshape(b, h, w, c)
        return x + y


class MFAB(nn.Module):
    """Multi-scale fusion attention block (MANet decoder block): fuse up+skip
    with channel attention from global pooling."""

    out_ch: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = ConvBN(self.out_ch, dtype=self.dtype, name="hl_conv1")(x, train)
        x = upsample2x(x, "nearest")
        if skip is not None:
            s = jnp.mean(skip, axis=(1, 2), keepdims=True)
            s = nn.Conv(max(1, skip.shape[-1] // self.reduction), (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="att_reduce")(s)
            s = nn.relu(s)
            s = nn.Conv(skip.shape[-1], (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="att_expand")(s)
            skip = skip * nn.sigmoid(s)
            x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBN(self.out_ch, dtype=self.dtype, name="conv1")(x, train)
        return ConvBN(self.out_ch, dtype=self.dtype, name="conv2")(x, train)


class MAnetModel(nn.Module, _EncoderMixin):
    """MANet (smp ``smp_MANet`` capability, ``ModelTraining.py:270-278``)."""

    num_classes: int
    encoder_name: str = "resnet18"
    decoder_channels: tuple[int, ...] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self._encode(x, train)
        skips = feats[:-1][::-1] + [None]
        y = PAB(feats[-1].shape[-1], dtype=self.dtype, name="pab")(feats[-1])
        for i, ch in enumerate(self.decoder_channels):
            y = MFAB(ch, dtype=self.dtype, name=f"block{i}")(y, skips[i], train)
        return SegmentationHead(self.num_classes, dtype=self.dtype, name="head")(y)
