"""Packed-halo execution of the MobileNetV3 encoder front-end (round 3).

The reference's default encoder is timm ``mobilenetv3_small_100`` consumed
through smp's TimmUniversalEncoder (``common_utils.py:236``,
``Main_MMR_SegModel.py:589``). Its two highest-resolution stages — the
stride-2 stem at the input resolution and the ``b0_0`` depthwise-separable
block at stride 2 — dominate the encoder's step time on XLA (im2col'd
small-channel convs + separate BatchNorm reduction passes). Here they run in
the packed-halo dataflow of ``ops/pallas/packed_chain.py``:

- **stem**: one ``fused_conv_down`` launch (stride-2 Toeplitz taps) reading
  the packed image once and writing the raw stride-2 feature once, with BN
  moments emitted in-kernel; BN + hardswish travel as a pending prologue.
- **b0_0 depthwise**: a second ``fused_conv_down`` launch with a
  diagonal-expanded kernel that consumes the stem output *raw* (applying its
  pending BN + hardswish in the kernel prologue) — the activated stem tensor
  never exists in HBM.
- **SE + pointwise**: XLA ops in packed-lane space; the 1×1 conv runs as a
  block-diagonal lane GEMM that simultaneously converts the packing geometry
  to whatever the packed decoder wants for this scale (no relayout pass).

Parameter/variable trees are IDENTICAL to the unfused
``MobileNetV3SmallEncoder`` modules (``conv_stem``, ``bn1``, ``b0_0/...``),
so checkpoints interchange between the packed and standard encoders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmr_tpu.models.packed_blocks import DeferredBN, PackedT, _pro_lanes
from mmr_tpu.ops.pallas import packed_chain as pc


def image_geom(h: int, w: int) -> pc.RowGeom | None:
    """Packing geometry for the 3-channel input image: p=32 (cp(3)=4 →
    128 lanes), which is BIT-IDENTICAL to channel-padded NHWC (lane =
    q·4 + c), so ``to_packed`` lowers to pads only — no lane shuffle and a
    4/3 surface instead of the 8/3 a p=16/cp=8 packing costs. The stem runs
    as a phases=2 ``fused_conv_down`` whose output lands directly in the
    decoder-native p=8 geometry."""
    if w % 16 or (w // 16) % 8 or w // 16 < 8 or h % 4:
        return None
    wb = w // 32
    return pc.RowGeom(h, w, 32, wb, pc._round_up(wb + 2, 8))


def stem_geom(h: int, w: int) -> pc.RowGeom:
    """Real (decoder-native) p=8 destination geometry of the phases=2 stem
    for an (h, w) input image."""
    wb = w // 16
    return pc.RowGeom(h // 2, w // 2, 8, wb, pc._round_up(wb + 2, 8))


def down_geom(g: pc.RowGeom) -> pc.RowGeom:
    """Destination geometry of a stride-2 packed conv from ``g``
    (p halves, block count unchanged)."""
    return pc.RowGeom(g.h // 2, g.w // 2, g.p // 2, g.wb, g.wbp)


def best_geom(h: int, w: int) -> pc.RowGeom | None:
    """Largest-p geometry for (h, w) — delegates to the packed decoder's
    ``choose_row_geom`` (no node constraints, no min-hw floor) so the
    encoder's output geometry tracks the decoder's selection invariants by
    construction and its features land decoder-native."""
    from mmr_tpu.models.packed_blocks import choose_row_geom

    return choose_row_geom(h, w, node_chans=(), min_hw=0)


class _KParam(nn.Module):
    """Registers a conv kernel param exactly like ``nn.Conv`` (HWIO,
    lecun-normal) without running a convolution."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _SEGate(nn.Module):
    """SqueezeExcite's two 1×1 convs on an already-pooled (B, 1, 1, C)
    vector — parameter tree identical to ``layers.SqueezeExcite`` (submodules
    ``conv_reduce`` / ``conv_expand``), returning the hard-sigmoid gate."""

    reduced: int
    ch: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled):
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_reduce")(pooled)
        s = nn.relu(s)
        s = nn.Conv(self.ch, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_expand")(s)
        return nn.relu6(s.astype(jnp.float32) + 3.0) / 6.0


def packed_stem(parent, x, train: bool = False) -> PackedT:
    """3×3/2 conv 3→16 + BN + hardswish as one fused_conv_down launch.

    Called from inside the encoder's ``@nn.compact __call__`` so the params
    register at the ENCODER's top level (``conv_stem/kernel`` +
    ``bn1/{scale,bias}`` + batch_stats), matching the unfused encoder
    exactly. Reference: timm mobilenetv3 ``conv_stem``."""
    b, h, w, _ = x.shape
    g_img = image_geom(h, w)
    assert g_img is not None, \
        f"packed stem needs w a multiple of 128 (got input {x.shape})"
    g1 = stem_geom(h, w)
    kernel = _KParam((3, 3, 3, 16), name="conv_stem")()
    cop = g1.cp(16)
    emit = bool(train)
    if parent.is_initializing():
        y = jnp.zeros((b, g1.h + 2, g1.wbp, g1.lanes(16)), jnp.bfloat16)
        mom = jnp.zeros((2, g1.lanes(16)), jnp.float32) if emit else None
    else:
        cfg = pc.DownCfg(g_src=g_img, g_dst=g1,
                         l_in=g_img.lanes(3), lo=g1.lanes(16),
                         pro=None, has_bias=False, emit_moments=emit,
                         need_dx=False)
        xp = pc.to_packed(x, g_img)
        y, mom = pc.fused_conv_down(cfg, xp, kernel, None, None)
    pro = DeferredBN(16, name="bn1")(mom, b * g1.h * g1.w, g1.p, cop, train)
    return PackedT(y, pro, 16, g1, act="hswish")


def _geom_convert_mats(p_a: int, cp_a: int, p_b: int, cp_b: int, w_pw,
                       cin: int):
    """Block-diagonal lane-GEMM matrix ((r·L_a), L_b) embedding the 1×1 conv
    ``w_pw`` (cin, cout) while converting packing (p_a, cp_a) → (p_b, cp_b),
    r = p_b/p_a ∈ {1, 2} (r=2 merges adjacent block pairs into lanes — a
    free trailing-dim reshape on the core, no relayout)."""
    r = p_b // p_a
    cout = w_pw.shape[1]
    wp = jnp.pad(w_pw, [(0, cp_a - cin), (0, cp_b - cout)])
    u = jnp.arange(r)[:, None, None]
    qa = jnp.arange(p_a)[None, :, None]
    qb = jnp.arange(p_b)[None, None, :]
    s = (qb == u * p_a + qa).astype(wp.dtype)
    m = jnp.einsum("uaq,ij->uaiqj", s, wp)
    return m.reshape(r * p_a * cp_a, p_b * cp_b)


def _pw_lanes(w_pw, g_in: pc.RowGeom, cin: int, g_out: pc.RowGeom, cout: int,
              pro=None):
    """Lane-GEMM matrix + bias for a 1×1 conv ``w_pw`` (cin, cout) from
    ``g_in`` to ``g_out`` (r = g_out.p/g_in.p ∈ {1, 2} block-pair merge),
    optionally FOLDING a pending linear prologue (2, cin): conv_pw(s⊙x + t)
    = (diag(s)·W)·x + (t·W) — the pending BN of the producer costs nothing.
    Returns ``(m, bias_lanes_or_None)`` with m in bf16, bias in f32."""
    w = w_pw.astype(jnp.float32)
    bias_l = None
    if pro is not None:
        w = pro[0][:, None] * w
        bias = pro[1] @ w_pw.astype(jnp.float32)          # (cout,)
        bias_l = jnp.tile(jnp.pad(bias, (0, g_out.cp(cout) - cout)),
                          g_out.p)[None]                  # (1, L_out)
    m = _geom_convert_mats(g_in.p, g_in.cp(cin), g_out.p, g_out.cp(cout),
                           w.astype(jnp.bfloat16), cin)
    return m, bias_l


class PackedIRBlock(nn.Module):
    """timm InvertedResidual (b1 flavor: k3, expand→dw→project, NO SE,
    relu) in packed space — the round-5 packed extension of the encoder
    front-end (docs/PERF.md round-4 handoff item 1; reference: timm
    mobilenetv3_small blocks[1], consumed via smp's TimmUniversalEncoder at
    ``Main_MMR_SegModel.py:589``).

    - expand 1×1: lane GEMM at the input geometry, folding the input's
      pending linear prologue into the matrix (``_pw_lanes``); BN1 + relu
      travel as the dw kernel's prologue.
    - dw 3×3 (stride 1 or 2): one fused packed launch with a
      diagonal-expanded dense kernel (``fused_conv`` / ``fused_conv_down``);
      BN2 + relu deferred.
    - project 1×1: relu-applied core → lane GEMM into ``g_out`` (the
      decoder's row geometry for this scale); BN3 deferred (act linear).
    - stride-1 + equal channels: the residual materializes both affines in
      one elementwise pass (sum of two deferred affines has no raw+pro
      form) and the block returns a FINAL (pro=None) PackedT.

    Param/variable tree identical to ``InvertedResidual`` (conv_pw, bn1,
    conv_dw, bn2, conv_pwl, bn3) — checkpoints interchange."""

    exp_ch: int
    out_ch: int
    strides: int = 1
    g_out: object = None   # delivery geometry (decoder row); None→dw geom
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t_in: PackedT, train: bool = False) -> PackedT:
        g_in = t_in.geom
        cin, ce, co = t_in.c, self.exp_ch, self.out_ch
        g_d = down_geom(g_in) if self.strides == 2 else g_in
        g_out = self.g_out
        if g_out is not None and not (
                g_out.h == g_d.h and g_out.w == g_d.w
                and g_out.p % g_d.p == 0 and g_out.p // g_d.p in (1, 2)
                and g_out.wb * (g_out.p // g_d.p) == g_d.wb):
            g_out = None
        if g_out is None:
            g_out = g_d
        b = t_in.data.shape[0]
        emit = bool(train)
        kpw = _KParam((1, 1, cin, ce), name="conv_pw")()
        kdw = _KParam((3, 3, 1, ce), name="conv_dw")()
        kpwl = _KParam((1, 1, ce, co), name="conv_pwl")()

        if self.is_initializing():
            # registration-only: create the BN params below on zero moments
            zmom = (jnp.zeros((2, g_in.lanes(ce)), jnp.float32) if emit
                    else None)
            DeferredBN(ce, name="bn1")(zmom, 1, g_in.p, g_in.cp(ce), train)
            zmom2 = (jnp.zeros((2, g_d.lanes(ce)), jnp.float32) if emit
                     else None)
            DeferredBN(ce, name="bn2")(zmom2, 1, g_d.p, g_d.cp(ce), train)
            zmom3 = (jnp.zeros((2, g_out.lanes(co)), jnp.float32) if emit
                     else None)
            DeferredBN(co, name="bn3")(zmom3, 1, g_out.p, g_out.cp(co),
                                       train)
            return PackedT(
                jnp.zeros((b, g_out.h + 2, g_out.wbp, g_out.lanes(co)),
                          jnp.bfloat16), None, co, g_out, act="linear")

        # ---- expand 1×1 (+ fold the input's pending linear prologue) ----
        x = t_in
        if x.pro is not None and x.act != "linear":
            # non-linear pending act can't fold — apply it, then plain GEMM
            x = PackedT(pc.to_packed(x.unpack(), g_in), None, cin, g_in)
        m1, b1 = _pw_lanes(kpw[0, 0], g_in, cin, g_in, ce, pro=x.pro)
        core = x.data[:, 1:-1, 1:1 + g_in.wb, :]
        e = jax.lax.dot_general(core, m1, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if b1 is not None:
            e = e + b1
        mom1 = (jnp.stack([e.sum((0, 1, 2)), (e * e).sum((0, 1, 2))])
                if emit else None)
        pro1 = DeferredBN(ce, name="bn1")(mom1, b * g_in.h * g_in.w, g_in.p,
                                          g_in.cp(ce), train)
        ep = jnp.pad(e.astype(jnp.bfloat16),
                     [(0, 0), (1, 1), (1, g_in.wbp - g_in.wb - 1), (0, 0)])

        # ---- depthwise 3×3 (BN1 + relu as the kernel prologue) ----
        w_dense = kdw[:, :, 0, :][..., None, :] * jnp.eye(ce)[None, None]
        pro1_l = _pro_lanes(pro1, g_in.p, g_in.cp(ce))
        if self.strides == 2:
            cfg = pc.DownCfg(g_src=g_in, g_dst=g_d, l_in=g_in.lanes(ce),
                             lo=g_d.lanes(ce), pro="relu", has_bias=False,
                             emit_moments=emit, need_dx=True)
            y, mom2 = pc.fused_conv_down(cfg, ep, w_dense, pro1_l, None)
        else:
            from mmr_tpu.ops.pallas.conv3x3_packed import _toeplitz

            cfg = pc.FusedCfg(geom=g_d, l_list=(g_d.lanes(ce),),
                              lo=g_d.lanes(ce), pro_mask=("relu",),
                              has_bias=False, emit_moments=emit)
            tee = _toeplitz(w_dense, g_d.p, g_d.cp(ce), g_d.cp(ce))
            y, mom2 = pc.fused_conv(cfg, (ep,), (tee,), (pro1_l,), None)
        pro2 = DeferredBN(ce, name="bn2")(mom2, b * g_d.h * g_d.w, g_d.p,
                                          g_d.cp(ce), train)

        # ---- project 1×1 (relu-applied core → delivery geometry) ----
        s_l = _pro_lanes(pro2, g_d.p, g_d.cp(ce))
        a = jnp.maximum(y[:, 1:-1, 1:1 + g_d.wb, :].astype(jnp.float32)
                        * s_l[0] + s_l[1], 0.0).astype(jnp.bfloat16)
        r = g_out.p // g_d.p
        m2, _ = _pw_lanes(kpwl[0, 0], g_d, ce, g_out, co)
        ar = a.reshape(b, g_d.h, g_d.wb // r, r * g_d.p * g_d.cp(ce))
        out = jax.lax.dot_general(ar, m2, (((3,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        mom3 = (jnp.stack([out.sum((0, 1, 2)), (out * out).sum((0, 1, 2))])
                if emit else None)
        pro3 = DeferredBN(co, name="bn3")(mom3, b * g_out.h * g_out.w,
                                          g_out.p, g_out.cp(co), train)

        if self.strides == 1 and cin == co:
            # residual: sum of two deferred affines — materialize both
            # (one elementwise pass; the result is final, pro=None)
            sc_l = (_pro_lanes(t_in.pro, g_in.p, g_in.cp(cin))
                    if t_in.pro is not None else None)
            shortcut = t_in.data[:, 1:-1, 1:1 + g_in.wb, :] \
                .astype(jnp.float32)
            if sc_l is not None:
                shortcut = shortcut * sc_l[0] + sc_l[1]
            p3_l = _pro_lanes(pro3, g_out.p, g_out.cp(co))
            fin = out * p3_l[0] + p3_l[1] + shortcut
            fp = jnp.pad(fin.astype(jnp.bfloat16),
                         [(0, 0), (1, 1), (1, g_out.wbp - g_out.wb - 1),
                          (0, 0)])
            return PackedT(fp, None, co, g_out, act="linear")

        out_p = jnp.pad(out.astype(jnp.bfloat16),
                        [(0, 0), (1, 1), (1, g_out.wbp - g_out.wb - 1),
                         (0, 0)])
        return PackedT(out_p, pro3, co, g_out, act="linear")


class PackedDSBlock(nn.Module):
    """timm 'ds' block (b0_0: dw3×3/2 + BN + relu → SE → pw1×1 + BN) in
    packed space. The depthwise conv is a fused_conv_down with a
    diagonal-expanded kernel consuming the (raw, prologue-pending) stem
    output; SE and the pointwise GEMM run on the packed core in XLA; the
    pointwise simultaneously converts geometry to ``g_out`` (decoder-native).
    Param tree identical to ``DepthwiseSeparable`` (conv_dw, bn1, se,
    conv_pw, bn2)."""

    ch: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    # the consumer's row geometry for the output scale (the pointwise GEMM
    # emits straight into it — zero repacks downstream); must be reachable
    # by the r ∈ {1, 2} block-pair merge from the dw geometry, else ignored
    g_out: object = None

    @nn.compact
    def __call__(self, t_in: PackedT, train: bool = False) -> PackedT:
        g_s = t_in.geom
        g_d = down_geom(g_s)                      # dw output geometry
        g_out = self.g_out
        if g_out is not None and not (
                g_out.h == g_d.h and g_out.w == g_d.w
                and g_out.p % g_d.p == 0 and g_out.p // g_d.p in (1, 2)
                and g_out.wb * (g_out.p // g_d.p) == g_d.wb):
            g_out = None
        if g_out is None:
            g_out = best_geom(g_d.h, g_d.w)       # pw output geometry
        assert g_out is not None
        b = t_in.data.shape[0]
        c = self.ch
        cop_d = g_d.cp(c)
        kdw = _KParam((3, 3, 1, c), name="conv_dw")()
        emit = bool(train)

        if self.is_initializing():
            y = jnp.zeros((b, g_d.h + 2, g_d.wbp, g_d.lanes(c)), jnp.bfloat16)
            mom = jnp.zeros((2, g_d.lanes(c)), jnp.float32) if emit else None
        else:
            w_dense = kdw[:, :, 0, :][..., None, :] * jnp.eye(c)[None, None]
            cfg = pc.DownCfg(g_src=g_s, g_dst=g_d,
                             l_in=g_s.lanes(t_in.c), lo=g_d.lanes(c),
                             pro=t_in.act if t_in.pro is not None else None,
                             has_bias=False, emit_moments=emit, need_dx=True)
            pro_l = (None if t_in.pro is None
                     else _pro_lanes(t_in.pro, g_s.p, g_s.cp(t_in.c)))
            y, mom = pc.fused_conv_down(cfg, t_in.data, w_dense, pro_l, None)

        pro1 = DeferredBN(c, name="bn1")(mom, b * g_d.h * g_d.w, g_d.p,
                                         cop_d, train)

        # ---- SE + pointwise on the packed core (XLA) ----
        core = y[:, 1:-1, 1:1 + g_d.wb, :]                 # (B, h, wb, L)
        s_l = _pro_lanes(pro1, g_d.p, cop_d)
        a = jnp.maximum(core.astype(jnp.float32) * s_l[0] + s_l[1], 0.0)
        pooled = a.sum((1, 2)).reshape(b, g_d.p, cop_d).sum(1)[:, :c] \
            / (g_d.h * g_d.w)                              # (B, C)
        red = max(8, int(c / 4 + 4) // 8 * 8)              # _make_divisible(c/4)
        gate = _SEGate(red, c, dtype=self.dtype,
                       name="se")(pooled[:, None, None, :])[:, 0, 0, :]
        gate_l = jnp.tile(jnp.pad(gate, [(0, 0), (0, cop_d - c)]), (1, g_d.p))
        ag = (a * gate_l[:, None, None, :]).astype(jnp.bfloat16)

        kpw = _KParam((1, 1, c, c), name="conv_pw")()
        r = g_out.p // g_d.p
        m = _geom_convert_mats(g_d.p, cop_d, g_out.p, g_out.cp(c),
                               kpw[0, 0].astype(jnp.bfloat16), c)
        agr = ag.reshape(b, g_d.h, g_d.wb // r, r * g_d.p * cop_d)
        out = jax.lax.dot_general(agr, m, (((3,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        mom2 = (jnp.stack([out.sum((0, 1, 2)), (out * out).sum((0, 1, 2))])
                if emit else None)
        pro2 = DeferredBN(c, name="bn2")(mom2, b * g_out.h * g_out.w,
                                         g_out.p, g_out.cp(c), train)
        out_p = jnp.pad(out.astype(jnp.bfloat16),
                        [(0, 0), (1, 1), (1, g_out.wbp - g_out.wb - 1),
                         (0, 0)])
        return PackedT(out_p, pro2, c, g_out, act="linear")
