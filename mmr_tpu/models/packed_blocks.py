"""Packed-domain decoder building blocks (flax layer over the fused engine).

These modules execute the same math as ``ConvBN`` chains (conv3x3 + BatchNorm
+ ReLU, ``models/layers.py``; reference ``unet_parts.py:93-103``) but in the
packed-halo dataflow of ``ops/pallas/packed_chain.py``: conv outputs are
stored raw (pre-BN), BatchNorm + ReLU travel as pending per-channel affine
vectors applied in the *consumer* kernel's prologue, and concatenation never
materializes (multi-input kernels). Parameter/variable trees are IDENTICAL
to the unfused modules (``conv/kernel``, ``bn/{scale,bias}`` params and
``bn/{mean,var}`` batch stats), so checkpoints are interchangeable between
the packed and standard execution paths.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from mmr_tpu.ops.pallas.conv3x3_packed import _toeplitz
from mmr_tpu.ops.pallas import packed_chain as pc


@struct.dataclass
class PackedT:
    """A packed-halo tensor plus its pending (BN + activation) prologue.

    ``data`` is raw/pre-BN; ``pro`` is per-channel (2, C) f32 (scale, shift)
    to be applied (with ``act``: relu / hswish / linear) by whichever kernel
    consumes it, or None.

    When ``geom_src`` is set the tensor is a *lazy ×2-nearest-upsample*:
    ``data`` is stored at the coarse ``geom_src`` geometry and consumers
    apply phase-dependent up-taps (``packed_chain.toeplitz_up``) so the fine
    tensor never materializes in HBM.
    """

    data: jnp.ndarray
    pro: Optional[jnp.ndarray]
    c: int = struct.field(pytree_node=False)
    geom: pc.RowGeom = struct.field(pytree_node=False)
    geom_src: Optional[pc.RowGeom] = struct.field(pytree_node=False,
                                                  default=None)
    act: str = struct.field(pytree_node=False, default="relu")

    def unpack(self):
        g = self.geom_src or self.geom
        x = pc.from_packed(self.data, g, self.c)
        if self.pro is not None:
            s = self.pro[0].astype(x.dtype)
            t = self.pro[1].astype(x.dtype)
            x = pc._apply_act(x * s + t, self.act)
        if self.geom_src is not None:  # materialize the pending upsample
            b, h, w, c = x.shape
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (b, h, 2, w, 2, c)).reshape(
                b, 2 * h, 2 * w, c)
        return x


def pack_up_lazy(x, g_dst: pc.RowGeom) -> Optional[PackedT]:
    """Pack a plain source-resolution array (h/2, w/2) for lazy fused
    ×2-upsample into ``g_dst`` consumers, or None when no compatible source
    geometry exists (odd packing factor)."""
    if g_dst.p % 2:
        return None
    g_src = pc.RowGeom(g_dst.h // 2, g_dst.w // 2, g_dst.p // 2, g_dst.wb,
                       g_dst.wbp)
    return PackedT(pc.to_packed(x, g_src), None, x.shape[-1], g_dst,
                   geom_src=g_src)


def pack_plain(x, main_c: int | None = None) -> PackedT:
    """Pack an already-activated NHWC tensor (e.g. an encoder feature).
    ``main_c`` hints the row's working channel width (its node out_ch)."""
    g = pc.row_geom(x.shape[1], x.shape[2], main_c or x.shape[-1])
    assert g is not None, f"no packing geometry for {x.shape}"
    return PackedT(pc.to_packed(x, g), None, x.shape[-1], g)


def _pro_lanes(pro_c, p: int, cp: int):
    """(2, C) per-channel prologue -> (2, p*cp) per-lane vectors."""
    pad = cp - pro_c.shape[1]
    return jnp.concatenate(
        [jnp.tile(jnp.pad(pro_c[0], (0, pad)), p)[None],
         jnp.tile(jnp.pad(pro_c[1], (0, pad)), p)[None]], axis=0)


class _Kernel3x3(nn.Module):
    """Registers the (3,3,Cin,Cout) kernel (+ optional bias) params exactly
    like nn.Conv — instantiated with name='conv' for checkpoint
    compatibility."""

    cin: int
    cout: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.cin, self.cout), jnp.float32)
        if not self.use_bias:
            return k, None
        return k, self.param("bias", nn.initializers.zeros_init(),
                             (self.cout,), jnp.float32)


class DeferredBN(nn.Module):
    """BatchNorm over a packed conv's emitted moments. Params/variables
    mirror ``nn.BatchNorm`` (momentum 0.9, eps 1e-5, biased variance)."""

    ch: int
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, moments, count: int, p: int, cop: int,
                 train: bool = False):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.ch,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.ch,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.ch,), jnp.float32))
        if train and moments is not None:
            from mmr_tpu.core.mesh import all_reduce_moments

            moments, count = all_reduce_moments(moments, count)
            mean, var = pc.moments_to_stats(moments, count, p, cop, self.ch)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * jax.lax.stop_gradient(mean)
                ra_var.value = m * ra_var.value + (1 - m) * jax.lax.stop_gradient(var)
        else:
            mean, var = ra_mean.value, ra_var.value
        s = scale * jax.lax.rsqrt(var + self.eps)
        t = bias - mean * s
        return jnp.stack([s, t]).astype(jnp.float32)  # (2, C)


class PackedConvBN(nn.Module):
    """conv3x3 over (the concat of) packed inputs, + deferred BatchNorm.

    Equivalent to ``ConvBN(out_ch)(concat(inputs))`` with the BN + ReLU
    deferred into downstream prologues. ``use_bn=False`` gives a plain
    conv+bias (segmentation-head flavour) returning an immediately-final
    tensor (pro=None).
    """

    out_ch: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, inputs: Sequence[PackedT], train: bool = False,
                 thru: Sequence[bool] | None = None):
        """``thru[j]`` marks input j for dx-threading: its raw data array is
        returned unchanged as an extra output, and feeding the surface's
        LATER consumers from that pass-through chains their backward kernels
        (each adds the downstream-accumulated dx in-kernel instead of JAX
        inserting whole-surface cotangent-sum passes). Returns ``out`` or
        ``(out, thru_datas)`` when ``thru`` is given."""
        g = inputs[0].geom
        cin_total = sum(t.c for t in inputs)
        kernel, b = _Kernel3x3(cin_total, self.out_ch,
                               use_bias=not self.use_bn, name="conv")()
        cop = g.cp(self.out_ch)
        emit = bool(train and self.use_bn)
        bias_l = None if b is None else pc.bias_lanes(b, g.p, cop)
        thru_t = None if thru is None or not any(thru) \
            else tuple(bool(f) for f in thru)
        thru_datas = None if thru is None else tuple(
            t.data for t, f in zip(inputs, thru_t or (False,) * len(inputs))
            if f)

        if self.is_initializing():
            # registration-only pass: params above are created; skip the
            # kernel launch (keeps init cheap and device-agnostic)
            n_b = inputs[0].data.shape[0]
            y = jnp.zeros((n_b, g.h + 2, g.wbp, g.lanes(self.out_ch)),
                          jnp.bfloat16)
            mom = jnp.zeros((2, g.lanes(self.out_ch)), jnp.float32) if emit else None
        else:
            tees, pros, datas, specs, lanes = [], [], [], [], []
            off = 0
            for t in inputs:
                w_j = jax.lax.slice_in_dim(kernel, off, off + t.c, axis=2)
                off += t.c
                if t.geom_src is not None:  # lazy ×2-upsampled input
                    gs = t.geom_src
                    tees.append(w_j)  # raw kernel; engine builds/folds taps
                    specs.append(pc.up_spec_for(gs, g, t.c))
                    lanes.append(gs.lanes(t.c))
                    pros.append(None if t.pro is None
                                else _pro_lanes(t.pro, gs.p, gs.cp(t.c)))
                else:
                    tees.append(_toeplitz(w_j, g.p, g.cp(t.c), cop))
                    specs.append(None)
                    lanes.append(g.lanes(t.c))
                    pros.append(None if t.pro is None
                                else _pro_lanes(t.pro, g.p, g.cp(t.c)))
                datas.append(t.data)
            cfg = pc.FusedCfg(
                geom=g,
                l_list=tuple(lanes),
                lo=g.lanes(self.out_ch),
                pro_mask=tuple(t.act if p is not None else None
                               for t, p in zip(inputs, pros)),
                has_bias=not self.use_bn,
                emit_moments=emit,
                up_spec=tuple(specs),
                thru=thru_t)
            out = pc.fused_conv(cfg, tuple(datas), tuple(tees),
                                tuple(pros), bias_l)
            y, mom = out[0], out[1]
            if thru_t is not None:
                thru_datas = out[2]

        if not self.use_bn:
            res = PackedT(y, None, self.out_ch, g)
        else:
            n_b = inputs[0].data.shape[0]
            pro = DeferredBN(self.out_ch, name="bn")(
                mom, n_b * g.h * g.w, g.p, cop, train)
            res = PackedT(y, pro, self.out_ch, g)
        if thru is None:
            return res
        return res, thru_datas


class PackedHeadLoss(nn.Module):
    """Segmentation head (3×3 conv + bias) with the DiceCE/confusion loss
    surface fused into the kernel (``packed_chain.fused_head_loss``).

    Parameter tree identical to ``PackedConvBN(out_ch, use_bn=False,
    name="head")`` — checkpoints interchange; only the execution differs
    (NHWC logits / one-hot / d(logits) never reach HBM)."""

    out_ch: int

    @nn.compact
    def __call__(self, t: PackedT, masks, train: bool = False,
                 with_conf: bool = True):
        g = t.geom
        kernel, b = _Kernel3x3(t.c, self.out_ch, use_bias=True,
                               name="conv")()
        cop = g.cp(self.out_ch)
        spec = pc.HeadLossSpec(geom=g, l_in=g.lanes(t.c), nc=self.out_ch,
                               with_conf=with_conf)
        if self.is_initializing():
            n_b = t.data.shape[0]
            return (jnp.zeros((n_b, g.h + 2, g.wbp, spec.lo), jnp.bfloat16),
                    jnp.zeros((n_b, 4, spec.lo), jnp.float32),
                    jnp.zeros((spec.lo, spec.lo), jnp.float32))
        assert t.pro is not None and t.geom_src is None, \
            "fused head loss expects a BN-deferred, non-lazy top feature"
        tee = _toeplitz(kernel, g.p, g.cp(t.c), cop)
        pro = _pro_lanes(t.pro, g.p, g.cp(t.c))
        bias_l = pc.bias_lanes(b, g.p, cop)
        labels_p = pc.pack_labels(masks, g, self.out_ch)
        return pc.fused_head_loss(spec, t.data, tee, pro, bias_l, labels_p)


def as_array(v):
    """PackedT → NHWC (applying pending prologue/upsample); arrays pass."""
    return v.unpack() if isinstance(v, PackedT) else v


def pack_into(arr, g: pc.RowGeom) -> PackedT:
    return PackedT(pc.to_packed(arr, g), None, arr.shape[-1], g)


def as_packed(v, g: pc.RowGeom) -> PackedT:
    """Deliver ``v`` packed at geometry ``g`` (lazy-upsampled tensors whose
    destination geometry already is ``g`` pass through untouched)."""
    if isinstance(v, PackedT):
        return v if v.geom == g else pack_into(as_array(v), g)
    return pack_into(v, g)


def choose_row_geom(h: int, w: int, node_chans, min_hw: int,
                    tee_budget: int = 5 * 1024 * 1024) -> pc.RowGeom | None:
    """Largest packing factor whose worst node at this (h, w) keeps its
    Toeplitz tap matrices under ``tee_budget`` VMEM bytes. ``node_chans`` is
    a list of (input_channel_list, out_ch) for every node at this scale.
    Returns None when the resolution is below ``min_hw`` or no p fits —
    callers fall back to the XLA path for that row."""
    if h * w < min_hw:
        return None
    for p in (8, 4, 2, 1):
        if 128 % p or w % p:
            continue
        wb = w // p
        if wb < 8 or wb % 8:
            continue
        g = pc.RowGeom(h, w, p, wb, -(-(wb + 2) // 8) * 8)
        ok = True
        for chans, out_ch in node_chans:
            tees = 9 * sum(g.lanes(c) for c in chans) * g.lanes(out_ch) * 2
            tees2 = 9 * g.lanes(out_ch) * g.lanes(out_ch) * 2
            if max(tees, tees2) > tee_budget:
                ok = False
                break
        if ok:
            return g
    return None


def upsample_packed(t: PackedT, g_dst: pc.RowGeom) -> PackedT:
    """Nearest ×2 upsample into the destination row's geometry; the pending
    prologue commutes (elementwise).

    When the geometries are tap-compatible this is LAZY: the data stays at
    source resolution and the consumer kernel absorbs the upsample into its
    Toeplitz taps (no HBM materialization). Falls back to materializing."""
    if t.geom_src is None and pc.up_compatible(t.geom, g_dst):
        return PackedT(t.data, t.pro, t.c, g_dst, geom_src=t.geom, act=t.act)
    src = t.data if t.geom_src is None else pc.to_packed(t.unpack(), t.geom)
    data = pc.upsample2x_packed(src, t.geom, t.c, g_dst)
    pro = t.pro if t.geom_src is None else None
    return PackedT(data, pro, t.c, g_dst, act=t.act)
