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
    semantics: the upsample is ``nn.UpsamplingBilinear2d`` — align_corners
    TRUE (matters for Segformer's ×4 head; Unet-family heads use 1)."""

    num_classes: int
    upsampling: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from mmr_tpu.models.layers import Conv3x3

        x = Conv3x3(self.num_classes, dtype=self.dtype, name="conv")(x)
        if self.upsampling > 1:
            x = resize_bilinear(
                x, (x.shape[-3] * self.upsampling, x.shape[-2] * self.upsampling),
                align_corners=True)
        return x.astype(jnp.float32)


class _EncoderMixin:
    def _encode(self, x, train, **enc_kw):
        from mmr_tpu.models.encoders import get_encoder

        spec = get_encoder(self.encoder_name)
        kw = {k: v for k, v in enc_kw.items() if v is not None}
        if getattr(self, "packed_frontend", False):
            # run the encoder front-end as packed fused kernels; high-res
            # features come back as PackedT (packed_encoder.py)
            kw["packed_frontend"] = True
        if getattr(self, "encoder_output_stride", 32) != 32:
            # smp make_dilated capability (DeepLabV3+ default os=16)
            kw["output_stride"] = self.encoder_output_stride
        enc = spec.build(self.dtype, "encoder", **kw)
        return enc(x, train)


class UnetDecoderModel(nn.Module, _EncoderMixin):
    """Plain U-Net decoder over a pyramid encoder (smp ``Unet`` capability).

    ``packed=True`` runs the fine-resolution decoder blocks in the
    packed-halo fused-kernel dataflow (``ops/pallas/packed_chain.py``) with
    an identical parameter tree — the same engine the UNet++ flagship
    benches at 2× the A100 estimate, applied to the smp ``Unet`` arch
    (PKG-INFO Example 3's 83.55%-mIoU architecture)."""

    num_classes: int
    encoder_name: str = "resnet18"
    decoder_channels: tuple[int, ...] = (256, 128, 64, 32, 16)
    packed: bool = False
    packed_min_hw: int = 64 * 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, labels=None,
                 with_conf: bool = True):
        feats = self._encode(x, train)  # [f1(s2) .. f5(s32)], f1 may be None
        skips = feats[:-1][::-1] + [None]  # [f4, f3, f2, f1, None]
        y = feats[-1]
        if self.packed:
            return self._packed(y, skips, train, labels, with_conf)
        for i, ch in enumerate(self.decoder_channels):
            y = DecoderBlock(ch, dtype=self.dtype, name=f"block{i}")(
                y, [skips[i]] if skips[i] is not None else None, train)
        return SegmentationHead(self.num_classes, dtype=self.dtype, name="head")(y)

    def _packed(self, y, skips, train, labels=None, with_conf=True):
        """smp-Unet chain in the packed dataflow: each block is two fused
        multi-input kernels (lazy ×2-upsampled main input + packed skip,
        deferred BN+ReLU); coarse rows stay on XLA. With ``labels`` the head
        runs as the fused head+loss kernel (same contract as
        ``UnetPlusPlusModel._packed_decoder``)."""
        import mmr_tpu.ops.pallas.packed_chain as pc
        from mmr_tpu.models.packed_blocks import (
            PackedConvBN, PackedHeadLoss, PackedT, as_array, as_packed,
            choose_row_geom, pack_into, pack_up_lazy, upsample_packed)

        h5, w5 = y.shape[1], y.shape[2]
        chans_in = [y.shape[-1]] + list(self.decoder_channels[:-1])
        geoms = []
        for i, ch in enumerate(self.decoder_channels):
            h, w = h5 * 2 ** (i + 1), w5 * 2 ** (i + 1)
            s = skips[i]
            sc = [] if s is None else [
                s.c if isinstance(s, PackedT) else s.shape[-1]]
            geoms.append(choose_row_geom(
                h, w, [([chans_in[i]] + sc, ch)], self.packed_min_hw))

        for i, ch in enumerate(self.decoder_channels):
            g = geoms[i]
            s = skips[i]
            if g is None:
                y = DecoderBlock(ch, dtype=self.dtype, name=f"block{i}")(
                    as_array(y),
                    [as_array(s)] if s is not None else None, train)
                continue
            if isinstance(y, PackedT):
                x_up = upsample_packed(y, g)
            else:
                x_up = pack_up_lazy(y, g) \
                    or pack_into(upsample2x(y, "nearest"), g)
            inputs = [x_up] + ([as_packed(s, g)] if s is not None else [])

            class _Node(nn.Module):
                out_ch: int

                @nn.compact
                def __call__(self, inputs, train=False):
                    h = PackedConvBN(self.out_ch, name="conv1")(inputs, train)
                    return PackedConvBN(self.out_ch, name="conv2")([h], train)

            y = _Node(ch, name=f"block{i}")(inputs, train)

        if isinstance(y, PackedT):
            if labels is not None:
                spec = pc.HeadLossSpec(geom=y.geom, l_in=y.geom.lanes(y.c),
                                       nc=self.num_classes,
                                       with_conf=with_conf)
                yl, stats, conf = PackedHeadLoss(
                    self.num_classes, name="head")(y, labels, train,
                                                    with_conf=with_conf)
                return {"stats": stats, "conf": conf, "spec": spec,
                        "n_pixels": labels.shape[0] * y.geom.h * y.geom.w,
                        "probs_packed": yl}
            logits = PackedConvBN(self.num_classes, use_bn=False,
                                  name="head")([y], train)
            return logits.unpack().astype(jnp.float32)
        return SegmentationHead(self.num_classes, dtype=self.dtype,
                                name="head")(y)


def smp_unetpp_plan(enc_ch: tuple[int, ...], dec_ch: tuple[int, ...]):
    """smp ``UnetPlusPlusDecoder``'s exact block plan.

    ``enc_ch`` are the encoder feature channels fine→coarse (e.g. mbv3-small:
    (16, 16, 24, 48, 576)); returns ``{(d, l): (in_ch, skip_ch, out_ch)}``
    keyed like smp's ``blocks["x_{d}_{l}"]``. Verified to reproduce the
    3,714,090-param default exactly (``MMR_EN:DE_CODER/README.md``
    architecture-summary table; smp decoder built at
    ``Main_MMR_SegModel.py:589``).
    """
    rev = list(enc_ch[::-1])
    in_ch = [rev[0]] + list(dec_ch[: len(rev) - 1])
    skip_ch = rev[1:] + [0]
    out_ch = list(dec_ch)
    blocks: dict[tuple[int, int], tuple[int, int, int]] = {}
    for layer in range(len(in_ch) - 1):
        for d in range(layer + 1):
            if d == 0:
                blocks[(0, layer)] = (in_ch[layer],
                                      skip_ch[layer] * (layer + 1),
                                      out_ch[layer])
            else:
                blocks[(d, layer)] = (skip_ch[layer - 1],
                                      skip_ch[layer] * (layer + 1 - d),
                                      skip_ch[layer])
    blocks[(0, len(in_ch) - 1)] = (in_ch[-1], 0, out_ch[len(in_ch) - 1])
    return blocks


def unetpp_row_geoms(enc_ch: tuple[int, ...], dec_ch: tuple[int, ...],
                     h5: int, w5: int, depth: int, min_hw: int):
    """Packed row geometries ``{scale l: RowGeom | None}`` of the UNet++
    decoder for a deepest-feature resolution (h5, w5) — the single source of
    truth shared by ``_packed_decoder`` and the packed encoder front-end:
    the front-end delivers skip features AT the decoder's row geometry so
    they are consumed raw (pending prologue and all), with zero repacks.
    (Before round 5 the front-end chose ``best_geom`` — unconstrained, p=8 —
    while the decoder's tee budget picks p=4 at the 128² row, silently
    unpack+repacking f2 every step.)"""
    from mmr_tpu.models.packed_blocks import choose_row_geom

    plan = smp_unetpp_plan(enc_ch, dec_ch)
    enc_rev = list(enc_ch[::-1])
    pieces: dict[tuple[int, int], list[int]] = {}
    for (d, l), (in_ch, _skip_ch, _out_ch) in plan.items():
        if l == d and l < depth:
            pieces[(d, l)] = [in_ch, enc_rev[d + 1]]
        elif l == depth and d == 0:
            pieces[(d, l)] = [in_ch]
        else:
            base = enc_rev[l + 1]
            pieces[(d, l)] = [in_ch] + [base] * (l - d) + [enc_rev[l + 1]]

    def choose(l):
        h, w = h5 * 2 ** (l + 1), w5 * 2 ** (l + 1)
        rows = [(chans, plan[(d, ll)][2])
                for (d, ll), chans in pieces.items() if ll == l]
        return choose_row_geom(h, w, rows, min_hw)

    return {l: choose(l) for l in range(depth + 1)}


class UnetPlusPlusModel(nn.Module, _EncoderMixin):
    """UNet++ — smp-exact nested dense decoder.

    The reference's default architecture (``ModelTraining.py:248-254``,
    ``common_utils.py:236``: ``smp.UnetPlusPlus``). Topology and parameter
    shapes replicate ``segmentation_models_pytorch``'s
    ``UnetPlusPlusDecoder`` block-for-block (see :func:`smp_unetpp_plan`):
    node ``x_d_l`` upsamples ``x_d_{l-1}`` ×2 (nearest), concatenates
    [up(x), denser same-scale nodes, encoder feature], then Conv3x3-BN-ReLU
    ×2. The main path x_0_0..x_0_4 carries ``decoder_channels``
    (256,128,64,32,16) up to stride 1; one 3×3 head maps to classes.
    Default (mbv3-small encoder, 10 classes): 3,714,090 params — the
    reference's published count.

    ``packed=True`` executes the fine-resolution nodes in the packed-halo
    fused-kernel dataflow (``ops/pallas/packed_chain.py``) with an identical
    parameter tree (checkpoints interchange); coarse nodes (tiny tensors)
    stay on the XLA path.
    """

    num_classes: int
    encoder_name: str = "tu-mobilenetv3_small_100"
    decoder_channels: tuple[int, ...] = (256, 128, 64, 32, 16)
    deep_supervision: bool = False
    packed: bool = False
    packed_min_hw: int = 64 * 64  # nodes with out H*W >= this go packed
    # run the encoder's high-res front-end as packed fused kernels too
    # (mbv3 stem + b0_0; requires packed=True and input width % 128 == 0)
    packed_frontend: bool = False
    # chain multi-consumer packed surfaces through their consumers' backward
    # kernels (in-kernel dx accumulation instead of XLA cotangent-sum passes)
    thread_dx: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, labels=None,
                 with_conf: bool = True, packed_logits: bool = False):
        """``packed_logits=True`` (eval only): when the packed decoder runs,
        return the head's raw ``PackedT`` logits surface instead of the
        unpacked NHWC array — consumers that can read the packed layout
        (e.g. the sliding-window packed-canvas blend) skip the per-call
        unpack/relayout chain entirely. Falls through to NHWC when the
        packed path is not taken (caller branches on the return type)."""
        assert not self.packed_frontend or self.packed, \
            "packed_frontend requires packed=True"
        enc_kw = {}
        if self.packed_frontend:
            # hand the front-end the decoder's OWN row geometry for the f2
            # scale so b0_0's pointwise GEMM emits decoder-native (no
            # unpack/repack of the skip; see unetpp_row_geoms)
            from mmr_tpu.models.encoders import get_encoder

            spec_ch = tuple(get_encoder(self.encoder_name).channels)
            hints = unetpp_row_geoms(
                spec_ch, self.decoder_channels, x.shape[1] // 32,
                x.shape[2] // 32, len(spec_ch) - 1, self.packed_min_hw)
            enc_kw["f2_geom"] = hints.get(2)
            enc_kw["f3_geom"] = hints.get(1)
        feats = self._encode(x, train, **enc_kw)
        feats = [f for f in feats if f is not None]
        fr = feats[::-1]                       # [f5 .. f1], smp order
        depth = len(fr) - 1
        enc_ch = tuple(getattr(f, "c", None) or f.shape[-1] for f in feats)
        plan = smp_unetpp_plan(enc_ch, self.decoder_channels)
        if self.packed:
            return self._packed_decoder(fr, depth, plan, train, labels,
                                        with_conf, packed_logits)

        dense: dict[tuple[int, int], jnp.ndarray] = {}
        for layer in range(depth):
            for d in range(depth - layer):
                l = d + layer
                if layer == 0:
                    x_in, skips = fr[d], [fr[d + 1]]
                else:
                    x_in = dense[(d, l - 1)]
                    skips = [dense[(idx, l)] for idx in range(d + 1, l + 1)] \
                        + [fr[l + 1]]
                dense[(d, l)] = DecoderBlock(
                    plan[(d, l)][2], dtype=self.dtype,
                    name=f"x_{d}_{l}")(x_in, skips, train)
        dense[(0, depth)] = DecoderBlock(
            plan[(0, depth)][2], dtype=self.dtype,
            name=f"x_0_{depth}")(dense[(0, depth - 1)], None, train)

        up = 2 ** max(0, 5 - len(fr))  # 4-level encoders stop at stride 2
        logits = SegmentationHead(self.num_classes, upsampling=up,
                                  dtype=self.dtype,
                                  name="head")(dense[(0, depth)])
        if self.deep_supervision:
            # auxiliary heads on the intermediate main-path nodes (UNet++
            # deep supervision; params exist whenever the flag is set — XLA
            # prunes the unused aux computations at eval)
            outs = [logits]
            for l in range(1, depth):
                aux = SegmentationHead(self.num_classes, dtype=self.dtype,
                                       name=f"head_ds_{l}")(dense[(0, l)])
                outs.append(resize_bilinear(
                    aux, (logits.shape[-3], logits.shape[-2])))
            if train:
                return jnp.mean(jnp.stack(outs), axis=0)
        return logits

    def _packed_decoder(self, fr, depth, plan, train, labels=None,
                        with_conf=True, packed_logits=False):
        """Same smp topology; fine-resolution nodes run as packed fused
        kernels, coarse nodes stay on XLA (tiny tensors, big channel
        counts). One shared geometry per output scale (all ``x_*_l`` share
        their out resolution) so same-scale skips never repack; the packing
        factor is the largest p whose worst node fits the fwd VMEM budget.

        With ``labels`` (the int mask batch), the head runs as the fused
        head+loss kernel and the return value is a dict of loss partials
        (``stats``, ``conf``, ``spec``, ``n_pixels``) — see
        ``packed_chain.assemble_dice_ce``."""
        import mmr_tpu.ops.pallas.packed_chain as pc
        from mmr_tpu.models.packed_blocks import (
            PackedConvBN, PackedHeadLoss, PackedT, as_array, as_packed,
            pack_into, pack_up_lazy, upsample_packed)

        assert not self.deep_supervision, "packed path: deep_supervision off"

        # row geometries from the shared single source of truth (also used
        # pre-encode to aim the packed front-end's skip deliveries)
        enc_rev = [getattr(f, "c", None) or f.shape[-1] for f in fr]
        h5, w5 = fr[0].shape[1], fr[0].shape[2]  # deepest feature resolution
        geoms = unetpp_row_geoms(tuple(enc_rev[::-1]), self.decoder_channels,
                                 h5, w5, depth, self.packed_min_hw)

        # encoder features feed every node of their scale row — pack each
        # (feature, geometry) pair ONCE so the fwd packs don't repeat and the
        # bwd cotangents sum in packed space (one unpack-transpose instead of
        # one per consumer; the 4x ~0.8 ms relayout copies in the r2 trace).
        # packed_frontend features arrive as PackedT already — consumed
        # directly (pending prologue and all) when the geometry matches.
        fr = list(fr)
        packed_fr: dict[int, object] = {}

        def feat_packed(l):
            if l in packed_fr:
                return packed_fr[l]
            g = geoms[l]
            f = fr[l + 1]
            if isinstance(f, PackedT):
                if g is not None and f.geom == g and f.geom_src is None:
                    packed_fr[l] = f
                    return f
                f = f.unpack()
            if g is None:
                return f
            packed_fr[l] = pack_into(f, g)
            return packed_fr[l]

        # --- dx-threading of multi-consumer surfaces ---------------------
        # Every dense node output / packed encoder feature feeding >1
        # consumer is CHAINED through its consumers in program order: each
        # non-final consumer's fused kernel returns the surface unchanged
        # (identity pass-through) and its backward adds the
        # downstream-accumulated dx in-kernel, so JAX never materializes the
        # whole-surface cotangent-sum passes (add_add_fusion/add_any, ~2.2
        # ms/step at 512² b32 — docs/PERF.md round-4 handoff item 2).
        # ``remaining`` statically mirrors the node loops below; a surface
        # threads only while later consumers remain AND the consumer reads
        # the registry buffer itself (no repack — checked by identity).
        remaining: dict = {}

        def _count(key):
            remaining[key] = remaining.get(key, 0) + 1
        for layer in range(depth):
            for d in range(depth - layer):
                l = d + layer
                if layer == 0:
                    _count(("fr", d)), _count(("feat", d))
                else:
                    _count(("dense", d, l - 1))
                    for idx in range(d + 1, l + 1):
                        _count(("dense", idx, l))
                    _count(("feat", l))
        _count(("dense", 0, depth - 1))

        def _slots():
            for i, f in enumerate(fr):
                yield ("fr", i), f
            for l2, f in packed_fr.items():
                yield ("feat", l2), f
            for k2, f in dense.items():
                yield ("dense",) + k2, f

        def _rem_for(data):
            return sum(remaining.get(k, 0) for k, f in _slots()
                       if isinstance(f, PackedT) and f.data is data)

        def thread_back(old_data, arr):
            """Swap every registry slot holding ``old_data`` to the
            pass-through version (identical values; future consumers chain
            their dx into it)."""
            for i, f in enumerate(fr):
                if isinstance(f, PackedT) and f.data is old_data:
                    fr[i] = f.replace(data=arr)
            for l2, f in packed_fr.items():
                if isinstance(f, PackedT) and f.data is old_data:
                    packed_fr[l2] = f.replace(data=arr)
            for k2, f in dense.items():
                if isinstance(f, PackedT) and f.data is old_data:
                    dense[k2] = f.replace(data=arr)

        class _Node(nn.Module):
            out_ch: int

            @nn.compact
            def __call__(self, inputs, train=False, thru=None):
                if thru is None:
                    y = PackedConvBN(self.out_ch, name="conv1")(inputs, train)
                    return PackedConvBN(self.out_ch, name="conv2")([y], train)
                y, thru_datas = PackedConvBN(self.out_ch, name="conv1")(
                    inputs, train, thru=thru)
                return (PackedConvBN(self.out_ch, name="conv2")([y], train),
                        thru_datas)

        def run_node(d, l, x_in, skips, keys):
            out_ch = plan[(d, l)][2]
            g = geoms[l]
            for k in keys:
                # fail loudly if the static ``remaining`` mirror ever drifts
                # from the node loops (a silent miss would degrade to a dead
                # thru output / missed threading with no signal)
                remaining[k] -= 1
            if g is None:
                y = DecoderBlock(out_ch, dtype=self.dtype,
                                 name=f"x_{d}_{l}")(
                    as_array(x_in),
                    [as_array(s) for s in skips] if skips else None, train)
                return y
            if isinstance(x_in, PackedT):
                x_up = upsample_packed(x_in, g)
            else:
                x_up = pack_up_lazy(x_in, g) \
                    or pack_into(upsample2x(x_in, "nearest"), g)
            inputs = [x_up] + [as_packed(s, g) for s in skips]
            origs = [x_in] + list(skips)
            flags = tuple(
                self.thread_dx and isinstance(o, PackedT)
                and t.data is o.data and _rem_for(t.data) > 0
                for t, o in zip(inputs, origs))
            if not any(flags):
                return _Node(out_ch, name=f"x_{d}_{l}")(inputs, train)
            y, thru_datas = _Node(out_ch, name=f"x_{d}_{l}")(
                inputs, train, flags)
            it = iter(thru_datas)
            for f, t in zip(flags, inputs):
                if f:
                    thread_back(t.data, next(it))
            return y

        dense: dict[tuple[int, int], object] = {}
        for layer in range(depth):
            for d in range(depth - layer):
                l = d + layer
                if layer == 0:
                    x_in, skips = fr[d], [feat_packed(d)]
                    keys = [("fr", d), ("feat", d)]
                else:
                    x_in = dense[(d, l - 1)]
                    skips = [dense[(idx, l)] for idx in range(d + 1, l + 1)] \
                        + [feat_packed(l)]
                    keys = [("dense", d, l - 1)] \
                        + [("dense", idx, l) for idx in range(d + 1, l + 1)] \
                        + [("feat", l)]
                dense[(d, l)] = run_node(d, l, x_in, skips, keys)
        dense[(0, depth)] = run_node(0, depth, dense[(0, depth - 1)], [],
                                     [("dense", 0, depth - 1)])

        top = dense[(0, depth)]
        if isinstance(top, PackedT):
            if labels is not None:
                spec = pc.HeadLossSpec(geom=top.geom,
                                       l_in=top.geom.lanes(top.c),
                                       nc=self.num_classes,
                                       with_conf=with_conf)
                y, stats, conf = PackedHeadLoss(
                    self.num_classes, name="head")(top, labels, train,
                                                    with_conf=with_conf)
                return {"stats": stats, "conf": conf, "spec": spec,
                        "n_pixels": labels.shape[0] * top.geom.h
                        * top.geom.w, "probs_packed": y}
            logits = PackedConvBN(self.num_classes, use_bn=False,
                                  name="head")([top], train)
            if packed_logits:
                return logits
            return logits.unpack().astype(jnp.float32)
        return SegmentationHead(self.num_classes, dtype=self.dtype,
                                name="head")(top)


class SegformerModel(nn.Module, _EncoderMixin):
    """Segformer: MiT (or any pyramid) encoder + all-MLP decode head
    (PKG-INFO Example 2 capability: ``--model_arch Segformer
    --model_encoder_name mit_b2``). Each pyramid level is linearly projected
    to ``embed_dim``, upsampled to stride 4, concatenated deepest-first,
    fused (Conv2dReLU), headed (3×3 + ×4 align_corners=True) — smp-exact for
    mit_b* encoders (full-checkpoint oracle in test_models.py). Note: smp
    feeds 5 levels (incl. s2) for encoders with a real f1; this head takes
    the last 4 — only the reference-published mit path is checkpoint-exact."""

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


class SeparableConvBNReLU(nn.Module):
    """smp ``SeparableConv2d`` + BN + ReLU: bias-free depthwise 3×3 (optionally
    dilated) then bias-free pointwise 1×1 (smp base/modules.py SeparableConv2d;
    ASPPSeparableConv passes ``bias=False``)."""

    out_ch: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        p = self.dilation  # 3×3: padding == dilation keeps SAME extent
        x = nn.Conv(cin, (3, 3), padding=[(p, p), (p, p)],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=cin, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dw")(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="pw")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling — smp's separable variant exactly
    (smp decoders/deeplabv3/decoder.py ASPP, the DeepLabV3+ default):
    1×1 branch, three ASPPSeparableConv branches, global-pool branch
    (bilinear-broadcast back), then 1×1 project + BN + ReLU + Dropout(0.5)."""

    out_ch: int = 256
    rates: tuple[int, ...] = (12, 24, 36)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbr(y, name):  # bias-free 1×1 conv + BN + ReLU
            y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"{name}_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"{name}_bn")(y)
            return nn.relu(y)

        branches = [cbr(x, "c0")]
        for i, r in enumerate(self.rates, start=1):
            branches.append(SeparableConvBNReLU(
                self.out_ch, dilation=r, dtype=self.dtype, name=f"c{i}")(x, train))
        pooled = cbr(jnp.mean(x, axis=(1, 2), keepdims=True), "pool")
        # ASPPPooling's bilinear resize from a 1×1 source is a broadcast
        pooled = jnp.broadcast_to(pooled, x.shape[:-1] + (self.out_ch,))
        y = jnp.concatenate(branches + [pooled], axis=-1)
        y = cbr(y, "proj")
        return nn.Dropout(0.5, deterministic=not train)(y)


class DeepLabV3PlusModel(nn.Module, _EncoderMixin):
    """DeepLabV3+, smp-exact (``smp.DeepLabV3Plus(encoder_name='resnet18')``,
    ``ModelTraining.py:263-269``, all defaults): encoder at output_stride 16
    (dilated last stage), separable ASPP + post separable conv, ×4
    ``UpsamplingBilinear2d`` (align_corners=True), 48-ch projection of the
    stride-4 feature, separable fuse, 1×1 head + ×4 bilinear upsample.
    Checkpoints import via ``import_smp_deeplabv3plus_state_dict``."""

    num_classes: int
    encoder_name: str = "resnet18"
    aspp_ch: int = 256
    atrous_rates: tuple[int, ...] = (12, 24, 36)
    encoder_output_stride: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self._encode(x, train)
        deep = feats[-1]   # s16 when encoder_output_stride=16 (dilated)
        high = feats[1]    # s4 — smp decoder's features[-4]
        y = ASPP(self.aspp_ch, self.atrous_rates, dtype=self.dtype,
                 name="aspp")(deep, train)
        y = SeparableConvBNReLU(self.aspp_ch, dtype=self.dtype,
                                name="post")(y, train)
        scale = 2 if self.encoder_output_stride == 8 else 4
        y = resize_bilinear(y, (y.shape[-3] * scale, y.shape[-2] * scale),
                            align_corners=True)
        h = nn.Conv(48, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="block1_conv")(high)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="block1_bn")(h)
        y = jnp.concatenate([y, nn.relu(h)], axis=-1)
        y = SeparableConvBNReLU(self.aspp_ch, dtype=self.dtype,
                                name="block2")(y, train)
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="head_conv")(y).astype(jnp.float32)
        up = x.shape[-3] // logits.shape[-3]
        if up > 1:
            logits = resize_bilinear(
                logits, (logits.shape[-3] * up, logits.shape[-2] * up),
                align_corners=True)
        return logits


class PAB(nn.Module):
    """Position attention block — smp-exact (smp decoders/manet/decoder.py
    PAB), including two quirks real checkpoints depend on: (1) the softmax is
    taken over the ENTIRE flattened hw×hw map (``Softmax(dim=1)`` on a
    ``view(b, -1)``), not per row; (2) the attended (b, hw, C) tensor is
    reinterpreted as (b, C, h, w) by a raw ``reshape`` — no transpose — before
    the residual add."""

    pab_channels: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding=[(k // 2, k // 2)] * 2, use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        top = conv(self.pab_channels, 1, "top_conv")(x).reshape(b, h * w, -1)
        center = conv(self.pab_channels, 1, "center_conv")(x).reshape(b, h * w, -1)
        bottom = conv(c, 3, "bottom_conv")(x).reshape(b, h * w, c)
        # torch: matmul(centerᵀ (b,hw,pab), top (b,pab,hw)) → our NHWC
        # flattens already give (b, hw, pab) for both
        sp = jnp.einsum("bnp,bmp->bnm", center, top,
                        preferred_element_type=jnp.float32)
        sp = nn.softmax(sp.reshape(b, -1), axis=-1).reshape(b, h * w, h * w)
        att = jnp.einsum("bnm,bmc->bnc", sp.astype(self.dtype), bottom,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        # quirk (2): raw reshape (b, hw, C) → (b, C, h, w), then to NHWC
        att = att.reshape(b, c, h, w).transpose(0, 2, 3, 1)
        return conv(c, 3, "out_conv")(x + att)


class MFAB(nn.Module):
    """Multi-scale fusion attention block — smp-exact (smp
    decoders/manet/decoder.py MFAB): hl_conv = Conv2dReLU(ch→ch, 3×3) then
    Conv2dReLU(ch→skip_ch, 1×1); ×2 nearest upsample; SE attention computed
    on BOTH streams, summed, applied to the upsampled stream only; concat
    skip; two Conv2dReLU."""

    skip_ch: int
    out_ch: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = ConvBN(x.shape[-1], dtype=self.dtype, name="hl_conv1")(x, train)
        x = ConvBN(self.skip_ch, kernel=(1, 1), padding=0, dtype=self.dtype,
                   name="hl_conv2")(x, train)
        x = upsample2x(x, "nearest")

        def se(y, name):
            red = max(1, self.skip_ch // self.reduction)
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            s = nn.Conv(red, (1, 1), use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"{name}_reduce")(s)
            s = nn.Conv(self.skip_ch, (1, 1), use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"{name}_expand")(nn.relu(s))
            return nn.sigmoid(s)

        att = se(x, "se_hl") + se(skip, "se_ll")
        x = jnp.concatenate([x * att, skip], axis=-1)
        x = ConvBN(self.out_ch, dtype=self.dtype, name="conv1")(x, train)
        return ConvBN(self.out_ch, dtype=self.dtype, name="conv2")(x, train)


class MAnetModel(nn.Module, _EncoderMixin):
    """MANet, smp-exact (``smp.MAnet(encoder_name='resnet18')``,
    ``ModelTraining.py:270-278``, all defaults): PAB center on the deepest
    feature, MFAB decoder blocks wherever a skip exists, plain DecoderBlock
    for the skipless tail, 3×3 head. Checkpoints import via
    ``import_smp_manet_state_dict``."""

    num_classes: int
    encoder_name: str = "resnet18"
    decoder_channels: tuple[int, ...] = (256, 128, 64, 32, 16)
    pab_channels: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self._encode(x, train)
        skips = feats[:-1][::-1] + [None]  # [f4, f3, f2, f1, None]
        y = PAB(self.pab_channels, dtype=self.dtype, name="center")(feats[-1])
        for i, ch in enumerate(self.decoder_channels):
            s = skips[i] if i < len(skips) else None
            if s is not None:
                y = MFAB(s.shape[-1], ch, dtype=self.dtype,
                         name=f"block{i}")(y, s, train)
            else:
                y = DecoderBlock(ch, dtype=self.dtype, name=f"block{i}")(
                    y, None, train)
        return SegmentationHead(self.num_classes, dtype=self.dtype,
                                name="head")(y)
