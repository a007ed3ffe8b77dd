"""Packed-domain fused conv engine — the round-2 decoder dataflow.

Motivation (measured on the bench chip, see benchmarks/ablate_kernel.py):
streaming HBM bandwidth is ~167-235 GB/s and bf16 matmul ~41 TFLOP/s, so the
UNet-family decoder is memory-bound and the only wins left are *eliminating
memory passes*. In the reference execution model every grid node costs
concat + conv(+im2col) + BN (multi-pass) + ReLU + conv + BN + ReLU passes
over HBM. Here the whole decoder lives in a *packed-halo* tensor format and
each node is exactly two kernel launches whose HBM traffic is its inputs
read once and its output written once:

- **Packed-halo format**: NHWC reshaped to (B, H+2, wbp, p*cp) where p
  consecutive pixels x cp (channel-padded) channels fill whole 128-lane
  tiles, with one zero halo row (H) and one zero halo block (W) baked in so
  chained kernels never repad (``conv3x3_packed.py`` explains the Toeplitz
  formulation; this module extends it).
- **Multi-input**: a node's concat inputs are separate operands, each with
  its own block-Toeplitz taps, accumulated into one output — concat never
  materializes.
- **Prologue**: per-input optional (scale, shift, relu) applied in VMEM
  right after the DMA — this is how the *previous* conv's BatchNorm + ReLU
  are applied without ever writing a normalized copy to HBM (BN statistics
  travel as per-channel vectors; conv outputs are stored raw/pre-BN).
- **Moments**: the kernel emits per-lane (sum y, sum y^2) accumulated over
  the grid, from which the BN statistics of the *produced* tensor are
  computed host^W XLA-side at vector cost.
- **Backward**: ONE kernel per node-conv computes dx for every input, dT
  (folded to dW outside), d(scale)/d(shift), and applies the d(moments)
  correction (dy_eff = dy + dm0 + 2 y dm1) in its prologue — reading dy, y
  and each x once, writing each dx once.

Reference behavior anchor: this runs the same math as the reference's
Conv2d(3,3)+BN+ReLU decoder blocks (``unet_parts.py:93-103``, smp UNet++
decoder via ``Main_MMR_SegModel.py:589``); numerics are bf16 with f32
accumulation (flax ``nn.Conv(dtype=bf16)`` contract). BN statistics use
flax ``nn.BatchNorm`` semantics (biased variance, momentum 0.9).

Interpreter mode (`_INTERPRET=True`) runs everything on CPU for tests.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmr_tpu.ops.pallas.conv3x3_packed import (
    _round_up,
    _tap_slots,
    _toeplitz,
    _fold_toeplitz_grad,
)

_INTERPRET = False
# v5e has 128 MB VMEM/core; 24 MB of modeled footprint leaves headroom for
# Mosaic's own staging while letting the 512² backward groups run th=32-64
# row tiles (32 MB measured SLOWER — larger tiles thrash real VMEM)
_VMEM_BUDGET = 24 * 1024 * 1024


# ----------------------------------------------------------------- geometry

@dataclasses.dataclass(frozen=True)
class RowGeom:
    """Shared packing geometry for all tensors at one resolution."""

    h: int
    w: int
    p: int
    wb: int
    wbp: int

    def cp(self, c: int) -> int:
        return _round_up(c, 128 // self.p)

    def lanes(self, c: int) -> int:
        return self.p * self.cp(c)


@functools.lru_cache(maxsize=None)
def row_geom(h: int, w: int, main_c: int = 16) -> RowGeom | None:
    """Choose the packing factor p for a resolution. p ~ 128/main_c keeps a
    row's typical tensor at ~128 lanes, which bounds both channel-padding
    waste (small C) and the Toeplitz tap matrices' VMEM footprint
    (T is (3,3,pC,pCo) — it grows with p^2 for large C)."""
    p0 = 8
    while p0 > 1 and p0 * main_c > 128:
        p0 //= 2
    for p in (p0, p0 * 2 if p0 * 2 <= 8 else p0, 8, 4, 2, 1):
        if 128 % p or w % p:
            continue
        wb = w // p
        if wb >= 8 and wb % 8 == 0:
            return RowGeom(h, w, p, wb, _round_up(wb + 2, 8))
    return None


def choose_th(h: int, vmem_cost_fn) -> int | None:
    for cand in (64, 32, 16, 8, 4, 2):
        if h % cand:
            continue
        if vmem_cost_fn(cand) <= _VMEM_BUDGET:
            return cand
    return None


# ------------------------------------------------------------- pack helpers

def to_packed(x, g: RowGeom):
    """(B,H,W,C) -> packed-halo (B, H+2, wbp, p*cp) bf16.

    ``w == wb·p`` exactly, so the W→(block, pixel) split is a FREE row-major
    bitcast and the row halo, block halo/pad and channel pad land in ONE
    XLA pad (single pass over the packed surface). The previous
    pixel-pad→reshape→channel-pad→reshape chain materialized ~3 separate
    data-formatting passes (~2.6 ms/step at 512² b32 across the step's
    to_packed sites in the r3 trace)."""
    b, h, w, c = x.shape
    cp = g.cp(c)
    x = x.astype(jnp.bfloat16).reshape(b, h, w // g.p, g.p, c)
    x = jnp.pad(x, [(0, 0), (1, 1), (1, g.wbp - g.wb - 1), (0, 0),
                    (0, cp - c)])
    return x.reshape(b, h + 2, g.wbp, g.p * cp)


def from_packed(xp, g: RowGeom, c: int):
    """packed-halo -> (B,H,W,C)."""
    b = xp.shape[0]
    cp = g.cp(c)
    y = xp[:, 1:-1, 1:g.wb + 1, :]
    y = y.reshape(b, g.h, g.w, cp)
    return y[..., :c]


def upsample2x_packed(xp, g_src: RowGeom, c: int, g_dst: RowGeom):
    """Nearest x2 upsample between packed rows; elementwise prologues commute
    with nearest upsampling so pending BN/ReLU can still be applied by the
    consumer.

    Fast path (same packing factor, even p): the duplication happens in lane
    space — dst block 2k+half duplicates the pixels of src block k's half —
    so the tensor never round-trips through NHWC (the unpack/repack relayouts
    cost ~2x the ideal traffic). Falls back to unpack->dup->repack when
    geometries disagree."""
    if (g_dst.p == g_src.p and g_src.p % 2 == 0
            and g_dst.h == 2 * g_src.h and g_dst.w == 2 * g_src.w):
        p, cp = g_src.p, g_src.cp(c)
        b = xp.shape[0]
        h, wb = g_src.h, g_src.wb
        core = xp[:, 1:-1, 1:wb + 1, :]
        a = core.reshape(b, h, wb, 2, p // 2, cp)
        a = jnp.broadcast_to(a[:, :, :, :, :, None, :],
                             (b, h, wb, 2, p // 2, 2, cp))
        a = a.reshape(b, h, 2 * wb, p * cp)
        a = jnp.broadcast_to(a[:, :, None], (b, h, 2, 2 * wb, p * cp))
        a = a.reshape(b, 2 * h, 2 * wb, p * cp)
        return jnp.pad(a, [(0, 0), (1, 1),
                           (1, g_dst.wbp - g_dst.wb - 1), (0, 0)])
    x = from_packed(xp, g_src, c)
    b, h, w, _ = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    x = x.reshape(b, 2 * h, 2 * w, c)
    return to_packed(x, g_dst)


# ------------------------------------------- fused ×2-upsample tap machinery
#
# A node input that is the ×2-nearest-upsample of a coarser tensor never
# materializes at the fine resolution: the consumer kernel reads the SOURCE
# packed tensor and applies phase-dependent rectangular Toeplitz taps.
# Derivation: conv3x3(nearest_up2(x)) at dst row i reads exactly two src rows
# floor((i-1)/2)+{0,1} with row-parity weight combos [W0, W1+W2] (even i) /
# [W0+W1, W2] (odd i); columns are the same by symmetry. In packed-lane space
# the (src pixel, dst pixel) pairs become rectangular (L_src, Lo) matrices
# indexed by (ev, eh, sv, δ): dst-row parity, dst-block phase, src-row slot,
# src-block offset. This removes the upsampled tensor's HBM round-trip and
# cuts the up-input's MXU work ~2× (16 quarter-size vs 9 full-size matmuls).

_A_PARITY = (((1.0, 0.0, 0.0), (0.0, 1.0, 1.0)),   # even rows: [W0, W1+W2]
             ((1.0, 1.0, 0.0), (0.0, 0.0, 1.0)))   # odd rows:  [W0+W1, W2]


def up_compatible(g_src: RowGeom, g_dst: RowGeom) -> bool:
    """Can conv-over-×2-upsample of a g_src tensor run fused into a g_dst
    consumer? Requires exact ×2 spatial ratio, dst rows/blocks pairing up
    (r_b = wb_d/wb_s ∈ {1, 2}), and consistent pixel packing."""
    if g_dst.h != 2 * g_src.h or g_dst.w != 2 * g_src.w:
        return False
    if g_dst.wb % g_src.wb:
        return False
    r_b = g_dst.wb // g_src.wb
    # wb_d = r_b·wb_s and w_d = 2·w_s force p_d·r_b = 2·p_s
    if not (r_b in (1, 2) and g_dst.p * r_b == 2 * g_src.p):
        return False
    # r_b=2 backward builds a (ths+2, 2·wbp_s, L) duplicated tile and slices
    # [:, 1:1+wbp]; tiny block counts (e.g. wb_s=4) would silently clamp the
    # slice and fail later with an opaque shape error — fall back to the
    # materializing path for those geometries
    return r_b != 2 or 2 * g_src.wbp >= g_dst.wbp + 1


@functools.lru_cache(maxsize=None)
def _up_deltas(p_d: int, p_s: int, eh: int) -> tuple:
    ds = set()
    for q in range(p_d):
        for sh in (0, 1):
            t = (eh * p_d + q - 1) // 2 + sh
            ds.add(t // p_s)
    return tuple(sorted(ds))


@functools.lru_cache(maxsize=None)
def up_mats(p_d: int, p_s: int, r_b: int) -> tuple:
    """Canonical (ev, eh, sv, δ) order of the stacked up-tap matrices."""
    out = []
    for ev in (0, 1):
        for eh in range(r_b):
            for sv in (0, 1):
                for d in _up_deltas(p_d, p_s, eh):
                    out.append((ev, eh, sv, d))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _up_scatter_np(p_d: int, p_s: int, r_b: int):
    """0/1 scatter tensor M[mat, qs, q, a, b]: tap (a, b) of the 3×3 kernel
    lands at (src pixel qs, dst pixel q) of matrix ``mat``."""
    import numpy as np

    mats = up_mats(p_d, p_s, r_b)
    idx = {m: i for i, m in enumerate(mats)}
    a_par = np.asarray(_A_PARITY)  # [parity][slot][tap]
    m = np.zeros((len(mats), p_s, p_d, 3, 3), np.float32)
    for ev in (0, 1):
        for eh in range(r_b):
            for sv in (0, 1):
                for q in range(p_d):
                    ph = q % 2  # dst-column parity
                    for sh in (0, 1):
                        t = (eh * p_d + q - 1) // 2 + sh
                        d = t // p_s
                        qs = t - d * p_s
                        mi = idx[(ev, eh, sv, d)]
                        # weight = Σ_{a,b} A[ev][sv,a]·A[ph][sh,b]·W[a,b]
                        for a in range(3):
                            for b in range(3):
                                m[mi, qs, q, a, b] += (
                                    a_par[ev][sv][a] * a_par[ph][sh][b])
    return m


def toeplitz_up(w3, g_src: RowGeom, g_dst: RowGeom):
    """(3,3,Cin,Cout) -> stacked up-taps (n_mats, L_src, Lo) bf16.

    Built with one einsum against a static 0/1 scatter (differentiable; the
    VJP folds dT back to dW as the adjoint einsum — no scatter storm)."""
    cin, cout = w3.shape[2], w3.shape[3]
    p_d, p_s = g_dst.p, g_src.p
    cp_s, cop = g_src.cp(cin), g_dst.cp(cout)
    r_b = g_dst.wb // g_src.wb
    m = jnp.asarray(_up_scatter_np(p_d, p_s, r_b))
    t = jnp.einsum("msqab,abio->msiqo", m, w3.astype(jnp.float32))
    t = jnp.pad(t, [(0, 0), (0, 0), (0, cp_s - cin), (0, 0), (0, cop - cout)])
    return t.reshape(t.shape[0], p_s * cp_s, p_d * cop).astype(jnp.bfloat16)


def up_spec_for(g_src: RowGeom, g_dst: RowGeom, c: int):
    """Static per-input descriptor carried in FusedCfg.up_spec."""
    r_b = g_dst.wb // g_src.wb
    return (g_src.p, g_src.wb, g_src.wbp, r_b,
            up_mats(g_dst.p, g_src.p, r_b))


def _src_geom(cfg, j) -> RowGeom:
    p_s, wb_s, wbp_s, _, _ = cfg.ups[j]
    g = cfg.geom
    return RowGeom(g.h // 2, g.w // 2, p_s, wb_s, wbp_s)


# --- backward-side constants (parity-free formulation) --------------------
#
# The up-input backward avoids sublane-parity deinterleaves of dy (slow in
# Mosaic): the kernel row-duplicates the activated SRC tile (free untiled
# merge), runs the STANDARD 9-tap dW loop against it, and computes dx with
# either column-folded transposed taps (r_b=1: dst block ↔ src block 1:1) or
# dup-matrix matmuls + block-parity select + pair-sums (r_b=2).

@functools.lru_cache(maxsize=None)
def _tx_scatter_np(p_d: int, p_s: int):
    """M[δ'+1, q_dst, q_src, b]: weight tap b routes dst pixel q_dst to src
    pixel q_src of block offset δ' in the transposed (dx) direction."""
    import numpy as np

    m = np.zeros((3, p_d, p_s, 3), np.float32)
    for q in range(p_d):
        for b in range(3):
            t = (q + b - 1) // 2
            d = t // p_s
            m[d + 1, q, t - d * p_s, b] += 1.0
    return m


def tx_up(w3, g_src: RowGeom, g_dst: RowGeom):
    """Column-folded transposed taps for r_b=1 dx: (3, 3, p_d·cop, p_s·cp_s).
    Row taps stay the standard a∈{0,1,2} offsets (the row duplication is
    folded by a pair-sum in the kernel)."""
    cin, cout = w3.shape[2], w3.shape[3]
    cp_s, cop = g_src.cp(cin), g_dst.cp(cout)
    m = jnp.asarray(_tx_scatter_np(g_dst.p, g_src.p))
    t = jnp.einsum("dqsb,abio->adqosi", m, w3.astype(jnp.float32))
    t = jnp.pad(t, [(0, 0), (0, 0), (0, 0), (0, cop - cout), (0, 0),
                    (0, cp_s - cin)])
    return t.reshape(3, 3, g_dst.p * cop, g_src.p * cp_s).astype(jnp.bfloat16)


def fold_up_dw_rb1(d, w_shape, g_src: RowGeom, g_dst: RowGeom):
    """Adjoint of the r_b=1 dW accumulation: the kernel's D[a, δ+1] pairs
    row-duplicated src slices with dy; fold the (src px, dst px) diagonals
    back to (3,3,Cin,Cout)."""
    _, _, cin, cout = w_shape
    p_d, p_s = g_dst.p, g_src.p
    cp_s, cop = g_src.cp(cin), g_dst.cp(cout)
    m = jnp.asarray(_tx_scatter_np(p_d, p_s))
    dd = d.reshape(3, 3, p_s, cp_s, p_d, cop)[:, :, :, :cin, :, :cout]
    return jnp.einsum("dqsb,adsiqo->abio", m, dd)


@functools.lru_cache(maxsize=None)
def _dup_mats_np(p: int, cp: int):
    """De/Do (L, L): lane-space maps src block → even/odd dst block for the
    r_b=2 in-VMEM column duplication (dst pixel q reads src pixel q//2 or
    p/2 + q//2)."""
    import numpy as np

    l = p * cp
    de = np.zeros((l, l), np.float32)
    do = np.zeros((l, l), np.float32)
    for q in range(p):
        for i in range(cp):
            de[(q // 2) * cp + i, q * cp + i] = 1.0
            do[(p // 2 + q // 2) * cp + i, q * cp + i] = 1.0
    return de, do


# ------------------------------------------------------------------ kernels

def _halo_mask(i, th, wb, wbp, n_i):
    """Validity mask (th+2, wbp, 1) for a row tile at grid position i: False
    at the image's zero-halo rows/blocks (where prologue shifts must not
    manufacture nonzeros — SAME padding is zeros *after* BN+ReLU)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wbp, 1), 0) + i * th
    blocks = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wbp, 1), 1)
    return ((rows >= 1) & (rows <= n_i * th)
            & (blocks >= 1) & (blocks <= wb))


def _apply_act(v, act):
    """Prologue activation. Every supported act maps 0 -> 0, but the affine
    shift t makes prologue(0) nonzero anyway, so halo positions are re-zeroed
    by the caller's validity mask regardless of act."""
    if act is True:  # legacy boolean pro_mask entries mean relu
        act = "relu"
    if act == "relu":
        return jnp.maximum(v, 0.0)
    if act == "hswish":
        return v * jnp.clip(v + 3.0, 0.0, 6.0) * (1.0 / 6.0)
    assert act == "linear", act
    return v


def _act_grad(v, act):
    if act is True:  # legacy boolean pro_mask entries mean relu
        act = "relu"
    if act == "relu":
        return (v > 0.0).astype(jnp.float32)
    if act == "hswish":
        return jnp.where(v <= -3.0, 0.0,
                         jnp.where(v >= 3.0, 1.0, (2.0 * v + 3.0) / 6.0))
    assert act == "linear", act
    return jnp.ones_like(v)


def _prologue(tile, pro_ref, valid, act="relu"):
    """act(tile * s + t) with per-lane (2, L) f32 prologue vectors, zeroed
    outside the image interior."""
    s = pro_ref[0][None, None, :]
    t = pro_ref[1][None, None, :]
    v = _apply_act(tile.astype(jnp.float32) * s + t, act)
    return jnp.where(valid, v, 0.0).astype(jnp.bfloat16)


def _prologue_bwd(ga, x_int, pro_ref, act="relu"):
    """Backward through act(x*s + t) on interior tiles: returns (dx_raw,
    d(scale) per lane, d(shift) per lane)."""
    xi = x_int.astype(jnp.float32)
    s = pro_ref[0][None, None, :]
    t = pro_ref[1][None, None, :]
    gm = ga * _act_grad(xi * s + t, act)
    return gm * s, jnp.sum(gm * xi, axis=(0, 1)), jnp.sum(gm, axis=(0, 1))


def _up_fwd_contrib(tile, t_ref, pro_ref, spec, th, wb, lo, i, n_i,
                    act="relu", row0=0, tc=None):
    """Fused ×2-upsample input's contribution to the dst accumulator.

    ``tile`` is the SOURCE-resolution halo'd tile (th/2+2, wbp_s, L_s);
    phase-tap matmuls produce the four (dst-row parity × dst-block phase)
    quadrants which are interleaved back via sublane/row merges.

    ``row0``/``tc`` select a dst row-chunk [row0·2, row0·2 + tc) of the
    tile (the MXU/VPU pipeline in the caller) — the source slice is
    [row0, row0 + tc/2 + 2), with the prologue recomputed on the chunk's
    two halo rows."""
    p_s, wb_s, wbp_s, r_b, mats = spec
    tc = th if tc is None else tc
    ths = tc // 2
    sub = tile[row0:row0 + ths + 2]
    if pro_ref is not None:
        valid = _halo_mask(i, th // 2, wb_s, wbp_s, n_i)
        sub = _prologue(sub, pro_ref, valid[row0:row0 + ths + 2], act)
    parts = {}
    for mi, (ev, eh, sv, dlt) in enumerate(mats):
        sl = sub[ev + sv:ev + sv + ths, dlt + 1:dlt + 1 + wb_s, :]
        c = jax.lax.dot_general(sl, t_ref[mi], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        parts[(ev, eh)] = parts[(ev, eh)] + c if (ev, eh) in parts else c
    rows = []
    for ev in (0, 1):
        if r_b == 2:
            z = jnp.stack([parts[(ev, 0)], parts[(ev, 1)]], axis=2)
            z = z.reshape(ths, wb, lo)
        else:
            z = parts[(ev, 0)]
        rows.append(z)
    return jnp.stack(rows, axis=1).reshape(tc, wb, lo)


def _fused_fwd_kernel(*refs, th, n_i, geom, l_list, lo, pro_mask, has_bias,
                      emit_moments, n_b, up_spec):
    """refs layout: [x_0..x_{J-1}] [T_0..T_{J-1}] [pro_j for j in pro_mask]
    [bias?] -> outs [y, moments?] then scratch [xt_0.., ystage, insem(J,2),
    outsem(2)]."""
    wb, wbp = geom.wb, geom.wbp
    nj = len(l_list)
    xs = refs[:nj]
    ts = refs[nj:2 * nj]
    idx = 2 * nj
    pros = {}
    for j, m in enumerate(pro_mask):
        if m:
            pros[j] = refs[idx]
            idx += 1
    bias = refs[idx] if has_bias else None
    idx += int(has_bias)
    y_hbm = refs[idx]
    idx += 1
    mom = refs[idx] if emit_moments else None
    idx += int(emit_moments)
    xts = refs[idx:idx + nj]
    idx += nj
    ystage = refs[idx]
    zstage = refs[idx + 1]
    insem = refs[idx + 2]
    outsem = refs[idx + 3]
    halosem = refs[idx + 4]

    b, i = pl.program_id(0), pl.program_id(1)
    k = b * n_i + i
    total = n_b * n_i

    def in_dma(j, slot, kk):
        bb, ii = kk // n_i, kk % n_i
        tj = th // 2 if up_spec[j] is not None else th
        return pltpu.make_async_copy(
            xs[j].at[bb, pl.ds(ii * tj, tj + 2)], xts[j].at[slot],
            insem.at[j, slot])

    @pl.when(k == 0)
    def _():
        for j in range(nj):
            in_dma(j, 0, 0).start()
        if emit_moments:
            mom[:] = jnp.zeros_like(mom)
        zstage[:] = jnp.zeros_like(zstage)

    @pl.when(k + 1 < total)
    def _():
        for j in range(nj):
            in_dma(j, (k + 1) % 2, k + 1).start()

    # zero the output's top/bottom halo rows once per batch image (W-halo
    # blocks are zeroed in the staging pad below)
    @pl.when(i == 0)
    def _():
        top = pltpu.make_async_copy(zstage, y_hbm.at[b, pl.ds(0, 1)],
                                    halosem.at[0])
        bot = pltpu.make_async_copy(
            zstage, y_hbm.at[b, pl.ds(n_i * th + 1, 1)], halosem.at[1])
        top.start()
        bot.start()
        top.wait()
        bot.wait()

    valid = _halo_mask(i, th, wb, wbp, n_i) if any(
        m and up_spec[j] is None for j, m in enumerate(pro_mask)) else None
    for j in range(nj):
        in_dma(j, k % 2, k).wait()
    slot = k % 2

    @pl.when(k >= 2)
    def _():
        _wait_copy(ystage.at[slot], outsem.at[slot])

    # MXU/VPU software pipeline (same shape as the head kernels): chunk
    # c+1's prologues (VPU) and chunk c's moments/pad/convert (VPU) are
    # independent of chunk c's / c+1's tap matmuls (MXU), so interleaving
    # row-chunks lets the scheduler overlap the units instead of
    # serializing per-tile prologue → matmul → moments phases. Prologue
    # halo rows are recomputed per chunk (2/tc waste).
    n_c = _head_chunks(th)
    tc = th // n_c

    def acc_chunk(c):
        acc = jnp.zeros((tc, wb, lo), jnp.float32)
        for j in range(nj):
            tile = xts[j][k % 2]
            if up_spec[j] is None:
                sub = tile[c * tc:c * tc + tc + 2]
                if j in pros:
                    sub = _prologue(sub, pros[j],
                                    valid[c * tc:c * tc + tc + 2],
                                    pro_mask[j])
                for dy in range(3):
                    for dwb in range(3):
                        acc += jax.lax.dot_general(
                            sub[dy:dy + tc, dwb:dwb + wb, :], ts[j][dy, dwb],
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                continue
            acc += _up_fwd_contrib(tile, ts[j], pros.get(j), up_spec[j],
                                   th, wb, lo, i, n_i,
                                   act=pro_mask[j] or "relu",
                                   row0=c * (tc // 2), tc=tc)
        if has_bias:
            acc = acc + bias[0][None, None, :]
        return acc

    def emit_chunk(c, acc):
        if emit_moments:
            mom[0, :] += jnp.sum(acc, axis=(0, 1))
            mom[1, :] += jnp.sum(acc * acc, axis=(0, 1))
        # stage the output with its W halo re-zeroed; DMA'd to rows
        # [1 + i*th, 1 + i*th + th) of the halo'd output after all chunks
        ystage[slot, c * tc:(c + 1) * tc] = jnp.pad(
            acc.astype(jnp.bfloat16), [(0, 0), (1, wbp - wb - 1), (0, 0)])

    acc_c = acc_chunk(0)
    for c in range(1, n_c):
        acc_n = acc_chunk(c)
        emit_chunk(c - 1, acc_c)
        acc_c = acc_n
    emit_chunk(n_c - 1, acc_c)
    pltpu.make_async_copy(
        ystage.at[slot], y_hbm.at[b, pl.ds(i * th + 1, th)],
        outsem.at[slot]).start()

    @pl.when(k + 1 == total)
    def _():
        _wait_copy(ystage.at[slot], outsem.at[slot])
        if total > 1:
            _wait_copy(ystage.at[1 - slot], outsem.at[1 - slot])


def _wait_copy(stage_ref, sem):
    pltpu.make_async_copy(stage_ref, stage_ref, sem).wait()


def _up_bwd_input(j, spec, th, wb, wbp, lo, dy_bf, dy_flat, x_tile, tts_j,
                  dts_j, dups_j, pros, dpros, i, n_i, act="relu",
                  row0=0, tc=None):
    """Backward for one fused-upsample input, ROW-FOLDED: every matmul runs
    at SOURCE rows (M = th/2·wb), exploiting that nearest-up row pairs read
    the same src row. Accumulates dT (+dpro) and returns the (th/2, wb_s,
    L_s) dx tile (grad wrt the RAW src tensor).

    - dW: ×2-nearest duplicates rows, so dst rows t = 2r+e contract src row
      ``core[r + (a+e-1)//2]`` — only FOUR distinct (src slice, dy parity)
      products per dwb (the a-taps alias in pairs), each at half M, summed
      into the three dT[a] slots. r_b=2 column-duplicates the src tile via
      the De/Do lane matmuls first (now at src rows — half the old cost);
      the (src px ↔ dst px) diagonals are folded outside the kernel.
    - dx: the transposed pass groups the (row-tap, parity) products by dy
      row offset s = e+dyy — four matmuls per dwb at half M against
      parity-sliced dy with pair-summed tap mats (T0, T0+T1, T1+T2, T2) —
      then (r_b=2) the dup-matrix adjoint + block-parity select at src rows.

    ``row0``/``tc`` select a dst row-chunk [2·row0, 2·row0 + tc) (the
    caller's MXU/VPU pipeline); all source slices shift by ``row0``, all
    dy slices by ``2·row0``, and prologue halo rows are recomputed.
    """
    p_s, wb_s, wbp_s, r_b, _ = spec
    tc = th if tc is None else tc
    ths = tc // 2
    dy0 = 2 * row0
    l_s = x_tile.shape[-1]

    x_sub = x_tile[row0:row0 + ths + 2]
    if j in pros:
        valid_s = _halo_mask(i, th // 2, wb_s, wbp_s, n_i)
        a_tile = _prologue(x_sub, pros[j], valid_s[row0:row0 + ths + 2], act)
    else:
        a_tile = x_sub

    if r_b == 1:
        u2 = a_tile  # dst block ↔ src block; wbp_s == wbp
    else:
        de, do = dups_j[0][...], dups_j[1][...]
        pe = jax.lax.dot_general(a_tile, de, (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        po = jax.lax.dot_general(a_tile, do, (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        big = jnp.stack([pe, po], axis=2).reshape(ths + 2, 2 * wbp_s, l_s)
        u2 = big[:, 1:1 + wbp, :].astype(jnp.bfloat16)

    # parity views of the interior dy rows: dy_par(e)[r] = dy interior row
    # 2r+e (untiled-dim reshape + slice — free addressing, no relayout)
    dy_r = dy_bf[1 + dy0:1 + dy0 + tc].reshape(ths, 2, wbp, lo)
    dy_pflat = [dy_r[:, e, 1:1 + wb, :].reshape(ths * wb, lo)
                for e in (0, 1)]

    # dW: c[e, o] = u2[1+o : 1+o+ths]^T dy_e; o(a, e) = (a+e-1)//2 aliases
    # a∈{1,2} (e=0) and a∈{0,1} (e=1) — 4 products, 6 accumulations
    def c_prod(e, o, dwb):
        a2 = u2[1 + o:1 + o + ths, dwb:dwb + wb, :].astype(
            jnp.bfloat16).reshape(ths * wb, l_s)
        return jax.lax.dot_general(
            a2, dy_pflat[e], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    for dwb in range(3):
        c0m = c_prod(0, -1, dwb)
        c00 = c_prod(0, 0, dwb)
        c10 = c_prod(1, 0, dwb)
        c11 = c_prod(1, 1, dwb)
        dts_j[0, dwb] += c0m + c10
        dts_j[1, dwb] += c00 + c10
        dts_j[2, dwb] += c00 + c11

    # dx: ga[r] = Σ_s dy_bf[2r+s]·M_s with M = (T0, T0+T1, T1+T2, T2)
    t0 = [tts_j[0, dwb][...] for dwb in range(3)]
    t1 = [tts_j[1, dwb][...] for dwb in range(3)]
    t2 = [tts_j[2, dwb][...] for dwb in range(3)]
    mats = [t0, [a + b for a, b in zip(t0, t1)],
            [a + b for a, b in zip(t1, t2)], t2]

    def dy_par(s):  # (ths, wbp, lo) rows {s, s+2, ...} of the chunk
        base = dy0 + s - (s % 2)
        return dy_bf[base:base + tc].reshape(ths, 2, wbp, lo)[:, s % 2]

    g = jnp.zeros((ths, wb, l_s), jnp.float32)
    for s in range(4):
        dsl = dy_par(s)
        for dwb in range(3):
            g += jax.lax.dot_general(
                dsl[:, dwb:dwb + wb, :], mats[s][dwb].astype(jnp.bfloat16),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    if r_b == 2:
        det, dot = dups_j[2][...], dups_j[3][...]
        gb = g.astype(jnp.bfloat16)
        qe = jax.lax.dot_general(gb, det, (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        qo = jax.lax.dot_general(gb, dot, (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        bi = jax.lax.broadcasted_iota(jnp.int32, (ths, wb, l_s), 1)
        g = jnp.where(bi % 2 == 0, qe, qo)
        gq = g.reshape(ths, wb_s, 2, l_s)
        g = gq[:, :, 0, :] + gq[:, :, 1, :]
    ga = g

    if j in pros:
        ga, dp0, dp1 = _prologue_bwd(
            ga, x_sub[1:1 + ths, 1:1 + wb_s, :], pros[j], act)
        dpros[j][0, :] += dp0
        dpros[j][1, :] += dp1
    return ga


def _fused_bwd_kernel(*refs, th, n_i, geom, l_list, lo, pro_mask,
                      has_bias, emit_moments, n_b, up_spec,
                      thru_mask=None):
    """refs: [dy, y?] [x_0..] [Tt_0..] [pro_j..] [dm?] [dacc_j..]
    outs: [dx_0..] [dT_0..] [dpro_j..] [dbias?]
    scratch: [dyt, yt?, xt_0.., dxstage_0.., zstage, dacct_j.., insem,
    outsem, halosem, daccsem?]. ``dacc_j`` (per thru-flagged input) is the
    dx already accumulated by every LATER consumer of input j's surface —
    added in-kernel while staging this kernel's own dx contribution."""
    wb, wbp = geom.wb, geom.wbp
    nj = len(l_list)
    thru_mask = thru_mask or (False,) * nj
    r = list(refs)
    dy_hbm = r.pop(0)
    y_hbm = r.pop(0) if emit_moments else None
    xs = [r.pop(0) for _ in range(nj)]
    tts = [r.pop(0) for _ in range(nj)]
    pros = {}
    for j, m in enumerate(pro_mask):
        if m:
            pros[j] = r.pop(0)
    dups = {}
    for j, u in enumerate(up_spec):
        if u is not None and u[3] == 2:
            dups[j] = (r.pop(0), r.pop(0), r.pop(0), r.pop(0))
    dm = r.pop(0) if emit_moments else None
    daccs = {}
    for j, t in enumerate(thru_mask):
        if t:
            daccs[j] = r.pop(0)
    # outputs
    dxs = [r.pop(0) for _ in range(nj)]
    dts = [r.pop(0) for _ in range(nj)]
    dpros = {}
    for j, m in enumerate(pro_mask):
        if m:
            dpros[j] = r.pop(0)
    dbias = r.pop(0) if has_bias else None
    # scratch
    dyt = r.pop(0)
    yt = r.pop(0) if emit_moments else None
    xts = [r.pop(0) for _ in range(nj)]
    dxstages = [r.pop(0) for _ in range(nj)]
    zstages = [r.pop(0) for _ in range(nj)]
    dacct = {j: r.pop(0) for j in sorted(daccs)}
    insem = r.pop(0)
    outsem = r.pop(0)
    halosem = r.pop(0)
    daccsem = r.pop(0) if daccs else None

    b, i = pl.program_id(0), pl.program_id(1)
    k = b * n_i + i
    total = n_b * n_i

    def dma_in(src, dst, sem_slot, slot, kk, tj=th):
        bb, ii = kk // n_i, kk % n_i
        return pltpu.make_async_copy(
            src.at[bb, pl.ds(ii * tj, tj + 2)], dst.at[slot],
            insem.at[sem_slot, slot])

    def rows_of(j):
        return th // 2 if up_spec[j] is not None else th

    dacc_idx = {j: a for a, j in enumerate(sorted(daccs))}

    def dacc_in(j, slot, kk):
        bb, ii = kk // n_i, kk % n_i
        rj = rows_of(j)
        return pltpu.make_async_copy(
            daccs[j].at[bb, pl.ds(ii * rj + 1, rj)], dacct[j].at[slot],
            daccsem.at[dacc_idx[j], slot])

    def start_all(slot, kk):
        dma_in(dy_hbm, dyt, 0, slot, kk).start()
        if emit_moments:
            dma_in(y_hbm, yt, 1, slot, kk).start()
        for j in range(nj):
            dma_in(xs[j], xts[j], j + 1 + int(emit_moments), slot, kk,
                   rows_of(j)).start()
        for j in daccs:
            dacc_in(j, slot, kk).start()

    @pl.when(k == 0)
    def _():
        start_all(0, 0)
        for j in range(nj):
            dts[j][:] = jnp.zeros_like(dts[j])
            if j in dpros:
                dpros[j][:] = jnp.zeros_like(dpros[j])
            zstages[j][:] = jnp.zeros_like(zstages[j])
        if has_bias:
            dbias[:] = jnp.zeros_like(dbias)

    @pl.when(k + 1 < total)
    def _():
        start_all((k + 1) % 2, k + 1)

    # zero dx halo rows once per image
    @pl.when(i == 0)
    def _():
        for j in range(nj):
            top = pltpu.make_async_copy(
                zstages[j], dxs[j].at[b, pl.ds(0, 1)], halosem.at[j, 0])
            bot = pltpu.make_async_copy(
                zstages[j], dxs[j].at[b, pl.ds(n_i * rows_of(j) + 1, 1)],
                halosem.at[j, 1])
            top.start()
            bot.start()
            top.wait()
            bot.wait()

    slot = k % 2
    valid = _halo_mask(i, th, wb, wbp, n_i)
    dma_in(dy_hbm, dyt, 0, slot, k).wait()
    dy_tile = dyt[slot].astype(jnp.float32)  # (th+2, wbp, lo), halo'd
    if emit_moments:
        dma_in(y_hbm, yt, 1, slot, k).wait()
        corrected = dy_tile + dm[0][None, None, :] \
            + 2.0 * yt[slot].astype(jnp.float32) * dm[1][None, None, :]
        # dm0 would leak into halo/pad positions (where dy == y == 0); mask
        # the correction to image-interior positions
        dy_tile = jnp.where(valid, corrected, 0.0)
    dy_bf = dy_tile.astype(jnp.bfloat16)
    dy_interior = dy_tile[1:1 + th, 1:1 + wb, :]
    if has_bias:
        dbias[0, :] += jnp.sum(dy_interior, axis=(0, 1))

    # MXU/VPU software pipeline per input (same shape as the fwd kernel):
    # the prologue of row-chunk c+1 (VPU) is independent of chunk c's
    # dW/dx tap matmuls (MXU) — and the last chunk of input j overlaps the
    # first prologue chunk of input j+1.
    n_c = _head_chunks(th)
    tc = th // n_c

    for j in range(nj):
        dma_in(xs[j], xts[j], j + 1 + int(emit_moments), slot, k,
               rows_of(j)).wait()
        x_tile = xts[j][slot]
        if j in daccs:
            dacc_in(j, slot, k).wait()

        @pl.when(k >= 2)
        def _():
            _wait_copy(dxstages[j].at[slot], outsem.at[j, slot])

        def stage_dx(c_lo, c_hi, ga, wb_j, wbp_j, j=j):
            """pad the chunk's dx to the staging width, fold in the
            downstream-accumulated dx (f32 add, single bf16 cast), stage."""
            out = jnp.pad(ga, [(0, 0), (1, wbp_j - wb_j - 1), (0, 0)])
            if j in daccs:
                out = out + dacct[j][slot, c_lo:c_hi].astype(jnp.float32)
            dxstages[j][slot, c_lo:c_hi] = out.astype(jnp.bfloat16)

        if up_spec[j] is not None:
            wb_j, wbp_j = up_spec[j][1], up_spec[j][2]
            tcs = tc // 2

            def up_chunk(c, j=j, wb_j=wb_j, wbp_j=wbp_j, tcs=tcs):
                ga = _up_bwd_input(j, up_spec[j], th, wb, wbp, lo, dy_bf,
                                   None, x_tile, tts[j], dts[j],
                                   dups.get(j), pros, dpros, i, n_i,
                                   act=pro_mask[j] or "relu",
                                   row0=c * tcs, tc=tc)
                stage_dx(c * tcs, (c + 1) * tcs, ga, wb_j, wbp_j)

            for c in range(n_c):
                up_chunk(c)
        else:
            wb_j, wbp_j = wb, wbp

            def pro_chunk(c, j=j):
                sub = x_tile[c * tc:c * tc + tc + 2]
                if j in pros:
                    return _prologue(sub, pros[j],
                                     valid[c * tc:c * tc + tc + 2],
                                     pro_mask[j])
                return sub

            def mat_chunk(c, a_sub, j=j):
                # dW: dT[dy,dwb] += a_view^T @ dy_interior (operands
                # flattened to 2-D — Mosaic wants a single contracting dim)
                dy_fl = dy_interior[c * tc:(c + 1) * tc].astype(
                    jnp.bfloat16).reshape(tc * wb, lo)
                for dyy in range(3):
                    for dwb in range(3):
                        a2 = a_sub[dyy:dyy + tc, dwb:dwb + wb, :].reshape(
                            tc * wb, l_list[j])
                        dts[j][dyy, dwb] += jax.lax.dot_general(
                            a2, dy_fl, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                # dx: T[-d]^T read of the halo'd dy tile, expressed on the
                # RAW forward taps — static flips + rhs-dim-1 contraction
                ga = jnp.zeros((tc, wb, l_list[j]), jnp.float32)
                for dyy in range(3):
                    for dwb in range(3):
                        ga += jax.lax.dot_general(
                            dy_bf[c * tc + dyy:c * tc + dyy + tc,
                                  dwb:dwb + wb, :],
                            tts[j][2 - dyy, 2 - dwb],
                            (((2,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                if j in pros:
                    ga, dp0, dp1 = _prologue_bwd(
                        ga, x_tile[1 + c * tc:1 + c * tc + tc, 1:1 + wb, :],
                        pros[j], pro_mask[j])
                    dpros[j][0, :] += dp0
                    dpros[j][1, :] += dp1
                stage_dx(c * tc, (c + 1) * tc, ga, wb_j, wbp_j)

            a_c = pro_chunk(0)
            for c in range(1, n_c):
                a_n = pro_chunk(c)
                mat_chunk(c - 1, a_c)
                a_c = a_n
            mat_chunk(n_c - 1, a_c)

        pltpu.make_async_copy(
            dxstages[j].at[slot],
            dxs[j].at[b, pl.ds(i * rows_of(j) + 1, rows_of(j))],
            outsem.at[j, slot]).start()

    @pl.when(k + 1 == total)
    def _():
        for j in range(nj):
            _wait_copy(dxstages[j].at[slot], outsem.at[j, slot])
            if total > 1:
                _wait_copy(dxstages[j].at[1 - slot], outsem.at[j, 1 - slot])


# ---------------------------------------------------------------- drivers

@dataclasses.dataclass(frozen=True)
class FusedCfg:
    """Static configuration of one fused packed conv (hashable)."""

    geom: RowGeom
    l_list: tuple          # lanes per input (src lanes for fused-up inputs)
    lo: int                # output lanes
    # per input: None (no prologue) or the prologue act code "relu" /
    # "hswish" / "linear" — the input carries a pending (scale, shift, act)
    pro_mask: tuple
    has_bias: bool
    emit_moments: bool
    # per input: None, or (p_src, wb_src, wbp_src, r_b, mats) — the input is
    # the ×2-nearest-upsample of a g_src-packed tensor, consumed fused
    up_spec: tuple = None
    # per input: True marks the input as dx-THREADED — fused_conv returns it
    # unchanged as an extra output, and the backward kernel receives that
    # output's cotangent (the dx accumulated by every LATER consumer of the
    # surface) and adds it in-kernel while staging its own dx. Chaining a
    # multi-consumer surface through its consumers this way removes the XLA
    # add_add_fusion/add_any cotangent-sum passes (each read two full
    # activation surfaces and wrote one; ~2.2 ms/step at 512² b32).
    thru: tuple = None

    @property
    def ups(self) -> tuple:
        return self.up_spec or (None,) * len(self.l_list)

    @property
    def thrus(self) -> tuple:
        return self.thru or (False,) * len(self.l_list)

    def _tile_rows(self, j: int, th: int) -> tuple:
        """(rows, wbp) of input j's VMEM tile at dst row tile th."""
        u = self.ups[j]
        if u is None:
            return th + 2, self.geom.wbp
        return th // 2 + 2, u[2]

    def _n_mats(self, j: int) -> int:
        u = self.ups[j]
        return 9 if u is None else len(u[4])

    def vmem(self, th: int, backward: bool) -> int:
        g = self.geom
        nj = len(self.l_list)
        tiles = sum(2 * self._tile_rows(j, th)[0] * self._tile_rows(j, th)[1]
                    * self.l_list[j] * 2 for j in range(nj))
        if not backward:
            tees = sum(self._n_mats(j) * self.l_list[j] * self.lo * 2
                       for j in range(nj))
            acc = th * g.wb * self.lo * 4
            stage = 2 * th * g.wbp * self.lo * 2 + g.wbp * self.lo * 2
            return tiles + tees + acc + stage
        # backward holds T' (bf16) + dT (f32) per input (standard 9-tap
        # shapes for every input kind), dy(+y) tiles, per-input dx staging,
        # the f32 accumulators, and for up inputs the in-VMEM duplicated
        # tiles (ur/u2 + the r_b=2 dup matrices and dst-res fold temps)
        tiles += 2 * (th + 2) * g.wbp * self.lo * 2 * (
            1 + int(self.emit_moments))
        tees = sum(9 * l * self.lo * 2 for l in self.l_list)
        dts = sum(9 * l * self.lo * 4 for l in self.l_list)
        for j, u in enumerate(self.ups):
            if u is None:
                continue
            l = self.l_list[j]
            # row-folded bwd: u2 staging and the dx accumulator live at
            # SOURCE rows; the dx pass adds 12 pair-summed tap mats
            tees += (th // 2 + 2) * g.wbp * l * 2
            tees += th // 2 * g.wb * l * 4
            tees += 12 * self.lo * l * 2
            if u[3] == 2:
                tees += 4 * l * l * 2             # De/Do/DeT/DoT
        acc = (max(th * g.wb * l for l in self.l_list) * 4
               + th * g.wb * self.lo * 4)
        stage = sum((2 * (th // 2 if self.ups[j] else th) + 1)
                    * self._tile_rows(j, th)[1] * self.l_list[j] * 2
                    for j in range(nj))
        for j, t in enumerate(self.thrus):  # dacc double-buffer tiles
            if t:
                stage += 2 * (th // 2 if self.ups[j] else th) \
                    * self._tile_rows(j, th)[1] * self.l_list[j] * 2
        return tiles + tees + dts + acc + stage

    def th(self, backward: bool) -> int:
        th = choose_th(self.geom.h, lambda t: self.vmem(t, backward))
        assert th, f"no feasible row tile for {self}"
        return th

    def fits(self, backward: bool) -> bool:
        return choose_th(self.geom.h,
                         lambda t: self.vmem(t, backward)) is not None

    def subset(self, idxs, has_bias=None) -> "FusedCfg":
        return dataclasses.replace(
            self,
            l_list=tuple(self.l_list[i] for i in idxs),
            pro_mask=tuple(self.pro_mask[i] for i in idxs),
            up_spec=tuple(self.ups[i] for i in idxs),
            thru=tuple(self.thrus[i] for i in idxs),
            has_bias=self.has_bias if has_bias is None else has_bias)


def _fwd_call(cfg: FusedCfg, inputs, tees, pros, bias):
    g = cfg.geom
    nj = len(inputs)
    th = cfg.th(backward=False)
    n_i = g.h // th
    n_b = inputs[0].shape[0]
    const = lambda shape: pl.BlockSpec(shape, lambda bb, ii: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * nj
    in_specs += [const((3, 3, l, cfg.lo)) if cfg.ups[j] is None
                 else const((cfg._n_mats(j), l, cfg.lo))
                 for j, l in enumerate(cfg.l_list)]
    # tees[j] for fused-up inputs is the raw (3,3,ci,co) kernel — build the
    # stacked phase taps here (the VJP returns dW for them directly)
    built = [t if cfg.ups[j] is None
             else toeplitz_up(t, _src_geom(cfg, j), cfg.geom)
             for j, t in enumerate(tees)]
    args = list(inputs) + [t.astype(jnp.bfloat16) for t in built]
    for j, m in enumerate(cfg.pro_mask):
        if m:
            in_specs.append(const((2, cfg.l_list[j])))
            args.append(pros[j].astype(jnp.float32))
    if cfg.has_bias:
        in_specs.append(const((1, cfg.lo)))
        args.append(bias.astype(jnp.float32))

    out_shape = [jax.ShapeDtypeStruct((n_b, g.h + 2, g.wbp, cfg.lo),
                                      jnp.bfloat16)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if cfg.emit_moments:
        out_shape.append(jax.ShapeDtypeStruct((2, cfg.lo), jnp.float32))
        out_specs.append(const((2, cfg.lo)))

    scratch = [pltpu.VMEM((2,) + cfg._tile_rows(j, th) + (l,), jnp.bfloat16)
               for j, l in enumerate(cfg.l_list)]
    scratch += [
        pltpu.VMEM((2, th, g.wbp, cfg.lo), jnp.bfloat16),   # ystage
        pltpu.VMEM((1, g.wbp, cfg.lo), jnp.bfloat16),       # zstage
        pltpu.SemaphoreType.DMA((nj, 2)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    outs = pl.pallas_call(
        functools.partial(
            _fused_fwd_kernel, th=th, n_i=n_i, geom=g,
            l_list=cfg.l_list, lo=cfg.lo, pro_mask=cfg.pro_mask,
            has_bias=cfg.has_bias, emit_moments=cfg.emit_moments, n_b=n_b,
            up_spec=cfg.ups),
        grid=(n_b, n_i),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(*args)
    if cfg.emit_moments:
        return outs[0], outs[1]
    return outs[0], None


def _bwd_call(cfg: FusedCfg, inputs, tees, pros, y, dy, dmom, daccs=None):
    g = cfg.geom
    nj = len(inputs)
    if daccs is None:
        daccs = (None,) * nj
    # effective thread mask: flagged in cfg AND an accumulated-dx cotangent
    # actually arrived (the thru output was consumed downstream)
    thru_eff = tuple(bool(t) and daccs[j] is not None
                     for j, t in enumerate(cfg.thrus))
    # size the row tile for the REAL scratch footprint: disabled thru flags
    # (no cotangent arrived) allocate no dacc double-buffer, so charging
    # them in vmem() would shrink th below what this launch actually needs
    th = dataclasses.replace(cfg, thru=thru_eff).th(backward=True)
    n_i = g.h // th
    n_b = inputs[0].shape[0]
    const = lambda shape: pl.BlockSpec(shape, lambda bb, ii: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    # bwd taps: REGULAR inputs reuse the forward (3, 3, l, lo) tap tensor
    # unchanged — the kernel indexes [2-dy, 2-dwb] (static flip) and
    # contracts the rhs's SECOND dim (the MXU loads the stationary operand
    # either orientation), so the old flip+swapaxes pass over every tap
    # tensor disappears from the step. r_b=1 up inputs keep the
    # column-folded tx_up (double-flipped); r_b=2 up inputs the transposed
    # dst taps (the dup-matrix adjoint handles the resolution fold
    # in-kernel). ``tees[j]`` is the raw (3,3,ci,co) kernel for up inputs.
    tts, dup_args = [], []
    for j, t in enumerate(tees):
        u = cfg.ups[j]
        if u is None:
            tts.append(t.astype(jnp.bfloat16))
            continue
        gs = _src_geom(cfg, j)
        if u[3] == 1:
            tts.append(jnp.flip(tx_up(t, gs, g), axis=(0, 1)))
        else:
            td = _toeplitz(t, g.p, gs.cp(t.shape[2]), g.cp(t.shape[3]))
            tts.append(jnp.flip(td, axis=(0, 1)).swapaxes(2, 3)
                       .astype(jnp.bfloat16))
            de, do = _dup_mats_np(g.p, gs.cp(t.shape[2]))
            dup_args += [jnp.asarray(m, jnp.bfloat16)
                         for m in (de, do, de.T, do.T)]

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [dy]
    if cfg.emit_moments:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(y)
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * nj
    args += list(inputs)
    in_specs += [const((3, 3, l, cfg.lo)) if cfg.ups[j] is None
                 else const((3, 3, cfg.lo, l))
                 for j, l in enumerate(cfg.l_list)]
    args += tts
    for j, m in enumerate(cfg.pro_mask):
        if m:
            in_specs.append(const((2, cfg.l_list[j])))
            args.append(pros[j].astype(jnp.float32))
    for j, u in enumerate(cfg.ups):
        if u is not None and u[3] == 2:
            in_specs += [const((cfg.l_list[j], cfg.l_list[j]))] * 4
    args += dup_args
    if cfg.emit_moments:
        in_specs.append(const((2, cfg.lo)))
        args.append(dmom.astype(jnp.float32))
    for j, t in enumerate(thru_eff):
        if t:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            args.append(daccs[j].astype(jnp.bfloat16))

    def dx_shape(j, l):
        u = cfg.ups[j]
        if u is None:
            return (n_b, g.h + 2, g.wbp, l)
        return (n_b, g.h // 2 + 2, u[2], l)

    out_shape = [jax.ShapeDtypeStruct(dx_shape(j, l), jnp.bfloat16)
                 for j, l in enumerate(cfg.l_list)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * nj
    for l in cfg.l_list:
        out_shape.append(jax.ShapeDtypeStruct((3, 3, l, cfg.lo), jnp.float32))
        out_specs.append(const((3, 3, l, cfg.lo)))
    for j, m in enumerate(cfg.pro_mask):
        if m:
            out_shape.append(jax.ShapeDtypeStruct((2, cfg.l_list[j]),
                                                  jnp.float32))
            out_specs.append(const((2, cfg.l_list[j])))
    if cfg.has_bias:
        out_shape.append(jax.ShapeDtypeStruct((1, cfg.lo), jnp.float32))
        out_specs.append(const((1, cfg.lo)))

    def stage_wbp(j):
        u = cfg.ups[j]
        return g.wbp if u is None else u[2]

    def stage_rows(j):
        return th if cfg.ups[j] is None else th // 2

    scratch = [pltpu.VMEM((2, th + 2, g.wbp, cfg.lo), jnp.bfloat16)]  # dyt
    if cfg.emit_moments:
        scratch.append(pltpu.VMEM((2, th + 2, g.wbp, cfg.lo), jnp.bfloat16))
    scratch += [pltpu.VMEM((2,) + cfg._tile_rows(j, th) + (l,), jnp.bfloat16)
                for j, l in enumerate(cfg.l_list)]
    scratch += [pltpu.VMEM((2, stage_rows(j), stage_wbp(j), l), jnp.bfloat16)
                for j, l in enumerate(cfg.l_list)]
    scratch += [pltpu.VMEM((1, stage_wbp(j), l), jnp.bfloat16)
                for j, l in enumerate(cfg.l_list)]
    scratch += [pltpu.VMEM((2, stage_rows(j), stage_wbp(j), cfg.l_list[j]),
                           jnp.bfloat16)
                for j, t in enumerate(thru_eff) if t]
    scratch += [
        pltpu.SemaphoreType.DMA((nj + 1 + int(cfg.emit_moments), 2)),
        pltpu.SemaphoreType.DMA((nj, 2)),
        pltpu.SemaphoreType.DMA((nj, 2)),
    ]
    if any(thru_eff):
        scratch.append(pltpu.SemaphoreType.DMA((sum(thru_eff), 2)))
    outs = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, th=th, n_i=n_i, geom=g,
            l_list=cfg.l_list, lo=cfg.lo, pro_mask=cfg.pro_mask,
            has_bias=cfg.has_bias, emit_moments=cfg.emit_moments, n_b=n_b,
            up_spec=cfg.ups, thru_mask=thru_eff),
        grid=(n_b, n_i),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(*args)
    outs = list(outs)
    dxs = tuple(outs[:nj])
    dts = tuple(outs[nj:2 * nj])
    rest = outs[2 * nj:]
    dpros = []
    for m in cfg.pro_mask:
        dpros.append(rest.pop(0) if m else None)
    dbias = rest.pop(0) if cfg.has_bias else None
    return dxs, dts, tuple(dpros), dbias


# ------------------------------------------------------------ the primitive

def _thru_out(cfg, inputs):
    return tuple(x for x, t in zip(inputs, cfg.thrus) if t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_conv(cfg: FusedCfg, inputs, tees, pros, bias):
    """Multi-input fused packed conv. All array args are pytrees (tuples);
    ``pros[j]`` is a (2, L_j) f32 (scale, shift) pair or None; ``bias`` is
    (1, Lo) f32 or None. Returns ``(y_packed_halo, moments_or_None)``.

    With ``cfg.thru`` set, additionally returns the flagged inputs UNCHANGED
    as a third element (identity pass-through). Feeding a multi-consumer
    surface's LATER consumers from a thru output chains the consumers'
    backward kernels: each adds the downstream-accumulated dx in-kernel
    instead of JAX inserting whole-surface cotangent-sum passes."""
    out = _fwd_call(cfg, inputs, tees, pros, bias)
    if any(cfg.thrus):
        return out[0], out[1], _thru_out(cfg, inputs)
    return out


def _fused_conv_fwd(cfg, inputs, tees, pros, bias):
    y, mom = _fwd_call(cfg, inputs, tees, pros, bias)
    if any(cfg.thrus):
        return (y, mom, _thru_out(cfg, inputs)), (inputs, tees, pros, y)
    return (y, mom), (inputs, tees, pros, y)


def _fused_conv_bwd(cfg, res, cot):
    inputs, tees, pros, y = res
    if any(cfg.thrus):
        dy, dmom, dthru = cot
        it = iter(dthru)
        daccs = tuple(next(it) if t else None for t in cfg.thrus)
    else:
        dy, dmom = cot
        daccs = (None,) * len(inputs)
    if cfg.emit_moments and dmom is None:
        dmom = jnp.zeros((2, cfg.lo), jnp.float32)
    nj = len(inputs)
    if cfg.fits(backward=True):
        groups = [list(range(nj))]
    else:
        # VMEM-bounded input groups: each group re-reads dy (+y) but holds
        # only its own T'/dT — needed for wide-concat nodes (e.g. the
        # 576-channel stride-16 input)
        groups, cur = [], []
        for i in range(nj):
            if cur and not cfg.subset(cur + [i]).fits(backward=True):
                groups.append(cur)
                cur = []
            cur.append(i)
        groups.append(cur)
    def fold_dts(dts):
        """Up-input dT outputs fold to raw (3,3,Cin,Cout) kernel grads."""
        out = []
        for j, d in enumerate(dts):
            u = cfg.ups[j]
            if u is None or d is None:
                out.append(d)
                continue
            gs = _src_geom(cfg, j)
            w_shape = tees[j].shape
            if u[3] == 1:
                out.append(fold_up_dw_rb1(d, w_shape, gs, cfg.geom))
            else:
                out.append(_fold_toeplitz_grad(
                    d, w_shape, cfg.geom.p, gs.cp(w_shape[2]),
                    cfg.geom.cp(w_shape[3])))
        return tuple(out)

    if len(groups) == 1:
        dxs, dts, dpros, dbias = _bwd_call(cfg, inputs, tees, pros, y, dy,
                                           dmom, daccs)
        return dxs, fold_dts(dts), dpros, dbias
    dxs = [None] * nj
    dts = [None] * nj
    dpros = [None] * nj
    dbias = None
    for gi, idxs in enumerate(groups):
        sub = cfg.subset(idxs, has_bias=cfg.has_bias and gi == 0)
        gx, gt, gp, gb = _bwd_call(
            sub, tuple(inputs[i] for i in idxs), tuple(tees[i] for i in idxs),
            tuple(pros[i] for i in idxs), y, dy, dmom,
            tuple(daccs[i] for i in idxs))
        for a, i in enumerate(idxs):
            dxs[i], dts[i], dpros[i] = gx[a], gt[a], gp[a]
        if gi == 0 and cfg.has_bias:
            dbias = gb
    return tuple(dxs), fold_dts(dts), tuple(dpros), dbias


fused_conv.defvjp(_fused_conv_fwd, _fused_conv_bwd)


# ------------------------------------------ stride-2 (downsample) conv taps
#
# Groundwork for the round-3 packed encoder front-end (docs/PERF.md handoff):
# a 3×3 stride-2 conv consumed directly from a packed SOURCE tensor. With
# the geometries chosen so that p_src = 2·p_dst, source and destination
# have the SAME block count (wb_s == wb_d), so column taps reduce to plain
# δ ∈ {-1, 0} block shifts and row taps to the three parity views
# x[2r_d + a] of the halo'd source tile (the untiled-dim reshape trick the
# row-folded backward already uses). Verified against
# ``lax.conv(stride=2, padding=(1,1))`` in tests/test_packed_chain.py.

@functools.lru_cache(maxsize=None)
def _down_scatter_np(p_s: int, p_d: int):
    """M[dx, δ+1, q_s, q_d] ∈ {0,1}: column tap dx routes src pixel q_s of
    block offset δ to dst pixel q_d (p_s == 2·p_d; each slot has at most one
    contributing dx, so the einsum build is exact)."""
    import numpy as np

    assert p_s == 2 * p_d
    m = np.zeros((3, 2, p_s, p_d), np.float32)
    for q_d in range(p_d):
        for dx in range(3):
            t = 2 * q_d + dx - 1
            d = t // p_s          # -1 or 0
            m[dx, d + 1, t - d * p_s, q_d] = 1.0
    return m


def toeplitz_down(w3, g_src: RowGeom, g_dst: RowGeom, cop: int | None = None):
    """(3,3,Cin,Cout) -> (3, 2, L_src, L_dst) bf16 stride-2 taps, indexed by
    (row tap a, src-block offset δ+1). Consumer contraction:
    ``y[r_d] = Σ_{a,δ} x_parity_view_a[r_d, blocks+δ] @ T[a, δ+1]`` where
    ``x_parity_view_a[r_d] = x_halo[2·r_d + a]``.

    ``cop`` overrides the per-pixel output channel-slot count (the phase-split
    path builds taps against the VIRTUAL dst geometry but must keep the REAL
    dst geometry's cp so the 128-lane tap halves are exact dst blocks)."""
    cin, cout = w3.shape[2], w3.shape[3]
    p_s, p_d = g_src.p, g_dst.p
    cp_s = g_src.cp(cin)
    if cop is None:
        cop = g_dst.cp(cout)
    m = jnp.asarray(_down_scatter_np(p_s, p_d))
    t = jnp.einsum("xdsq,axio->adsiqo", m, w3.astype(jnp.float32))
    t = jnp.pad(t, [(0, 0), (0, 0), (0, 0), (0, cp_s - cin), (0, 0),
                    (0, cop - cout)])
    return t.reshape(3, 2, p_s * cp_s, p_d * cop).astype(jnp.bfloat16)


def fold_down_dw(d, w_shape, g_src: RowGeom, g_dst: RowGeom,
                 cop: int | None = None):
    """Adjoint of :func:`toeplitz_down`: (3, 2, L_src, L_dst) tap grads →
    (3, 3, Cin, Cout) kernel grads."""
    _, _, cin, cout = w_shape
    cp_s = g_src.cp(cin)
    if cop is None:
        cop = g_dst.cp(cout)
    m = jnp.asarray(_down_scatter_np(g_src.p, g_dst.p))
    dd = d.reshape(3, 2, g_src.p, cp_s, g_dst.p, cop)[:, :, :, :cin, :, :cout]
    return jnp.einsum("xdsq,adsiqo->axio", m, dd)


def _halo_mask_at(row0, nrows, wb, wbp, hmax):
    """Validity mask (nrows, wbp, 1) for halo'd rows starting at global halo
    row ``row0`` of an image with ``hmax`` interior rows."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, wbp, 1), 0) + row0
    blocks = jax.lax.broadcasted_iota(jnp.int32, (nrows, wbp, 1), 1)
    return ((rows >= 1) & (rows <= hmax) & (blocks >= 1) & (blocks <= wb))


@dataclasses.dataclass(frozen=True)
class DownCfg:
    """Static config of one fused stride-2 packed conv (hashable).

    Geometry contract (:func:`toeplitz_down`), two modes on
    ``phases = g_src.p // (2·g_dst.p)``:

    - ``phases == 1`` (p halves, equal block counts): column taps are plain
      δ ∈ {-1, 0} src-block shifts and row taps are the three parity views
      ``x[2·r_d + a]`` of the halo'd source tile.
    - ``phases == 2`` (p quarters, dst has 2× the blocks): taps are built
      against the VIRTUAL geometry ``p_v = g_src.p/2`` whose 2·lo lanes are
      exactly two consecutive dst blocks (lane q_v·cp+c with q_v ∈ [0, 2p));
      the kernel contracts each 128-lane tap half separately and interleaves
      the two per-phase accumulators into dst block order. This lets a
      p=32/cp=4 packed image (which is bit-identical to channel-padded NHWC,
      so packing it costs only pads) feed the stem while the output lands
      directly in the decoder-native p=8 geometry.

    Round-3 packed encoder front-end (docs/PERF.md handoff); reference
    semantics: timm mobilenetv3 stride-2 convs (stem `conv_stem`, depthwise
    `conv_dw`), consumed by smp's TimmUniversalEncoder at
    ``Main_MMR_SegModel.py:589``."""

    g_src: RowGeom
    g_dst: RowGeom
    l_in: int            # source lanes
    lo: int              # destination lanes
    pro: str | None      # act code of the input's pending (scale,shift,act)
    has_bias: bool
    emit_moments: bool
    need_dx: bool = True

    def __post_init__(self):
        s = self.phases
        assert s in (1, 2), (self.g_src, self.g_dst)
        assert self.g_src.wb * s == self.g_dst.wb
        assert self.g_src.h == 2 * self.g_dst.h
        assert self.g_src.w == 2 * self.g_dst.w
        assert self.lo % self.g_dst.p == 0

    @property
    def phases(self) -> int:
        return self.g_src.p // (2 * self.g_dst.p)

    @property
    def g_virt(self) -> RowGeom:
        """Tap-construction geometry: dst resolution at ``2·g_dst.p`` whose
        lane blocks are ``phases`` consecutive dst blocks (identity when
        phases == 1)."""
        if self.phases == 1:
            return self.g_dst
        return RowGeom(self.g_dst.h, self.g_dst.w, 2 * self.g_dst.p,
                       self.g_src.wb, self.g_src.wbp)

    def vmem(self, th: int, backward: bool) -> int:
        s = self.phases
        ws, wd = self.g_src.wbp, self.g_dst.wbp
        tiles = 2 * (2 * th + 2) * ws * self.l_in * 2      # src double-buffer
        taps = 6 * self.l_in * self.lo * s * 2
        if not backward:
            act = (2 * th + 2) * ws * self.l_in * 4        # prologue f32 temp
            acc = th * self.g_dst.wb * self.lo * 4
            stage = 2 * th * wd * self.lo * 2 + wd * self.lo * 2
            return tiles + taps + act + acc + stage
        if s == 1:
            tiles += 2 * (th + 2) * wd * self.lo * 2 \
                * (1 + int(self.emit_moments))
        else:   # aligned pair view; no y tile (correction pre-applied in XLA)
            tiles += 2 * (th + 2) * _round_up(self.g_src.wb + 2, 8) \
                * 2 * self.lo * 2
        dts = 6 * self.l_in * self.lo * s * 4
        act = (2 * th + 2) * ws * self.l_in * 4
        acc = 2 * th * self.g_src.wb * self.l_in * 4 \
            + (th + 2) * wd * self.lo * 4
        stage = 2 * 2 * th * ws * self.l_in * 2 + ws * self.l_in * 2
        return tiles + 2 * taps + dts + act + acc + stage

    def th(self, backward: bool) -> int:
        t = choose_th(self.g_dst.h, lambda c: self.vmem(c, backward))
        assert t, f"no feasible row tile for {self}"
        return t


def _down_fwd_kernel(*refs, th, n_i, cfg: DownCfg, n_b):
    g_s, g_d = cfg.g_src, cfg.g_dst
    s = cfg.phases
    wbs, wbd, wbp_s, wbp_d = g_s.wb, g_d.wb, g_s.wbp, g_d.wbp
    r = list(refs)
    x_hbm, t_ref = r.pop(0), r.pop(0)
    pro_ref = r.pop(0) if cfg.pro else None
    bias_ref = r.pop(0) if cfg.has_bias else None
    y_hbm = r.pop(0)
    mom = r.pop(0) if cfg.emit_moments else None
    xt, ystage, zstage, insem, outsem, halosem = r

    b, i = pl.program_id(0), pl.program_id(1)
    k = b * n_i + i
    total = n_b * n_i

    def in_dma(slot, kk):
        bb, ii = kk // n_i, kk % n_i
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * 2 * th, 2 * th + 2)], xt.at[slot],
            insem.at[slot])

    @pl.when(k == 0)
    def _():
        in_dma(0, 0).start()
        if cfg.emit_moments:
            mom[:] = jnp.zeros_like(mom)
        zstage[:] = jnp.zeros_like(zstage)

    @pl.when(k + 1 < total)
    def _():
        in_dma((k + 1) % 2, k + 1).start()

    @pl.when(i == 0)
    def _():
        top = pltpu.make_async_copy(zstage, y_hbm.at[b, pl.ds(0, 1)],
                                    halosem.at[0])
        bot = pltpu.make_async_copy(
            zstage, y_hbm.at[b, pl.ds(n_i * th + 1, 1)], halosem.at[1])
        top.start()
        bot.start()
        top.wait()
        bot.wait()

    in_dma(k % 2, k).wait()
    tile = xt[k % 2]
    if cfg.pro:
        valid_s = _halo_mask_at(2 * i * th, 2 * th + 2, wbs, wbp_s,
                                2 * n_i * th)
        tile = _prologue(tile, pro_ref, valid_s, cfg.pro)
    accs = [jnp.zeros((th, wbs, cfg.lo), jnp.float32) for _ in range(s)]
    for a in range(3):
        # row parity view: dst row r_d reads src halo'd row 2·r_d + a
        va = tile[a:a + 2 * th].reshape(th, 2, wbp_s, cfg.l_in)[:, 0]
        for d in (-1, 0):
            xa = va[:, d + 1:d + 1 + wbs, :]
            for ph in range(s):
                if ph == 1 and d == -1:
                    continue    # δ=-1 only feeds virtual out px 0 (phase 0)
                t_ph = (t_ref[a, d + 1] if s == 1 else
                        t_ref[a, d + 1, :, ph * cfg.lo:(ph + 1) * cfg.lo])
                accs[ph] += jax.lax.dot_general(
                    xa, t_ph, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    if cfg.has_bias:
        accs = [acc + bias_ref[0][None, None, :] for acc in accs]
    if cfg.emit_moments:
        for acc in accs:
            mom[0, :] += jnp.sum(acc, axis=(0, 1))
            mom[1, :] += jnp.sum(acc * acc, axis=(0, 1))
    # interleave the per-phase accumulators into dst block order
    acc = (accs[0] if s == 1
           else jnp.stack(accs, axis=2).reshape(th, wbd, cfg.lo))

    slot = k % 2

    @pl.when(k >= 2)
    def _():
        _wait_copy(ystage.at[slot], outsem.at[slot])

    ystage[slot] = jnp.pad(
        acc.astype(jnp.bfloat16), [(0, 0), (1, wbp_d - wbd - 1), (0, 0)])
    pltpu.make_async_copy(
        ystage.at[slot], y_hbm.at[b, pl.ds(i * th + 1, th)],
        outsem.at[slot]).start()

    @pl.when(k + 1 == total)
    def _():
        _wait_copy(ystage.at[slot], outsem.at[slot])
        if total > 1:
            _wait_copy(ystage.at[1 - slot], outsem.at[1 - slot])


def _down_bwd_kernel(*refs, th, n_i, cfg: DownCfg, n_b):
    """Backward of the stride-2 conv. dW contracts the three activated src
    parity views with dy (6 products); dx uses the TRANSPOSED taps with the
    stride-2 scatter inverted: even src rows receive only the center row tap
    from dy[t], odd src rows receive taps 0/2 from dy[t+1]/dy[t] — two
    row-interleaved accumulators merged by an untiled stack+reshape.

    phases == 2: dy arrives as the halo-ALIGNED PAIR view built by
    ``_down_bwd_call`` in XLA — pair column 1+v holds real dst blocks
    (2v, 2v+1) in its two 128-lane halves, pre-masked and (for
    emit_moments) pre-corrected — so every per-phase view is a static
    lane/sublane slice (Mosaic has no strided sublane slicing, and a raw
    ``wbp_d/2`` pair DMA violates the ×8 sublane-extent rule). dW
    accumulates a lane-concat of the per-phase products; dx sums both
    phases' transposed-tap products (the column shift δ is in SRC blocks
    = pair columns)."""
    g_s, g_d = cfg.g_src, cfg.g_dst
    s = cfg.phases
    corr = cfg.emit_moments and s == 1     # s=2 pre-corrects dy in XLA
    wbs, wbd, wbp_s, wbp_d = g_s.wb, g_d.wb, g_s.wbp, g_d.wbp
    r = list(refs)
    dy_hbm = r.pop(0)
    y_hbm = r.pop(0) if corr else None
    x_hbm, tt_ref = r.pop(0), r.pop(0)
    pro_ref = r.pop(0) if cfg.pro else None
    dm = r.pop(0) if corr else None
    dx_hbm = r.pop(0) if cfg.need_dx else None
    dt_ref = r.pop(0)
    dpro_ref = r.pop(0) if cfg.pro else None
    dbias_ref = r.pop(0) if cfg.has_bias else None
    dyt = r.pop(0)
    yt = r.pop(0) if corr else None
    xt = r.pop(0)
    dxstage = r.pop(0) if cfg.need_dx else None
    zstage = r.pop(0) if cfg.need_dx else None
    insem, outsem, halosem = r

    b, i = pl.program_id(0), pl.program_id(1)
    k = b * n_i + i
    total = n_b * n_i

    def dma(src, dst, sem_i, slot, kk, rows, stride):
        bb, ii = kk // n_i, kk % n_i
        return pltpu.make_async_copy(
            src.at[bb, pl.ds(ii * stride, rows)], dst.at[slot],
            insem.at[sem_i, slot])

    def start_all(slot, kk):
        dma(dy_hbm, dyt, 0, slot, kk, th + 2, th).start()
        if corr:
            dma(y_hbm, yt, 1, slot, kk, th + 2, th).start()
        dma(x_hbm, xt, 1 + int(corr), slot, kk, 2 * th + 2,
            2 * th).start()

    @pl.when(k == 0)
    def _():
        start_all(0, 0)
        dt_ref[:] = jnp.zeros_like(dt_ref)
        if cfg.pro:
            dpro_ref[:] = jnp.zeros_like(dpro_ref)
        if cfg.has_bias:
            dbias_ref[:] = jnp.zeros_like(dbias_ref)
        if cfg.need_dx:
            zstage[:] = jnp.zeros_like(zstage)

    @pl.when(k + 1 < total)
    def _():
        start_all((k + 1) % 2, k + 1)

    if cfg.need_dx:
        @pl.when(i == 0)
        def _():
            top = pltpu.make_async_copy(zstage, dx_hbm.at[b, pl.ds(0, 1)],
                                        halosem.at[0])
            bot = pltpu.make_async_copy(
                zstage, dx_hbm.at[b, pl.ds(2 * n_i * th + 1, 1)],
                halosem.at[1])
            top.start()
            bot.start()
            top.wait()
            bot.wait()

    slot = k % 2
    lo = cfg.lo
    dma(dy_hbm, dyt, 0, slot, k, th + 2, th).wait()
    dy_tile = dyt[slot].astype(jnp.float32)
    if corr:
        valid_d = _halo_mask_at(i * th, th + 2, wbd, wbp_d, n_i * th)
        dma(y_hbm, yt, 1, slot, k, th + 2, th).wait()
        corrected = dy_tile + dm[0][None, None, :] \
            + 2.0 * yt[slot].astype(jnp.float32) * dm[1][None, None, :]
        dy_tile = jnp.where(valid_d, corrected, 0.0)
    dy_bf = dy_tile.astype(jnp.bfloat16)
    if s == 1:
        dy_ints = [dy_tile[1:1 + th, 1:1 + wbd, :]]
    else:
        # aligned PAIR view (th+2, pair_wbp, 2·lo): pair col 1+v = real dst
        # blocks (2v, 2v+1) in its lane halves, pre-masked/corrected by XLA.
        dy_ints = [dy_tile[1:1 + th, 1:1 + wbs, :lo],
                   dy_tile[1:1 + th, 1:1 + wbs, lo:]]
    dy_flats = [v.astype(jnp.bfloat16).reshape(th * wbs, lo)
                for v in dy_ints]
    if cfg.has_bias:
        dbias_ref[0, :] += sum(jnp.sum(v, axis=(0, 1)) for v in dy_ints)

    dma(x_hbm, xt, 1 + int(corr), slot, k, 2 * th + 2,
        2 * th).wait()
    x_tile = xt[slot]
    if cfg.pro:
        valid_s = _halo_mask_at(2 * i * th, 2 * th + 2, wbs, wbp_s,
                                2 * n_i * th)
        a_tile = _prologue(x_tile, pro_ref, valid_s, cfg.pro)
    else:
        a_tile = x_tile

    for a in range(3):
        va = a_tile[a:a + 2 * th].reshape(th, 2, wbp_s, cfg.l_in)[:, 0]
        for d in (-1, 0):
            a2 = va[:, d + 1:d + 1 + wbs, :].reshape(th * wbs, cfg.l_in)
            for ph in range(s):
                if ph == 1 and d == -1:
                    continue    # δ=-1 only feeds virtual out px 0 (phase 0)
                prod = jax.lax.dot_general(
                    a2, dy_flats[ph], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if s == 1:
                    dt_ref[a, d + 1] += prod
                else:
                    dt_ref[a, d + 1, :, ph * lo:(ph + 1) * lo] += prod

    if cfg.need_dx:
        ge = jnp.zeros((th, wbs, cfg.l_in), jnp.float32)
        go = jnp.zeros((th, wbs, cfg.l_in), jnp.float32)
        for d in (-1, 0):
            for ph in range(s):
                if ph == 1 and d == -1:
                    continue
                lsl = slice(0, lo * s) if s == 1 else \
                    slice(ph * lo, (ph + 1) * lo)
                dye = dy_bf[1:1 + th, 1 - d:1 - d + wbs, lsl]  # dy row t
                dyo = dy_bf[2:2 + th, 1 - d:1 - d + wbs, lsl]  # dy row t+1
                # forward-layout taps (L_in, s·Lo): contract rhs dim 1
                tta = (lambda a_: tt_ref[a_, d + 1] if s == 1 else
                       tt_ref[a_, d + 1, :, ph * lo:(ph + 1) * lo])
                ge += jax.lax.dot_general(
                    dye, tta(1), (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                go += jax.lax.dot_general(
                    dyo, tta(0), (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                go += jax.lax.dot_general(
                    dye, tta(2), (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
        ga = jnp.stack([ge, go], axis=1).reshape(2 * th, wbs, cfg.l_in)
        if cfg.pro:
            ga, dp0, dp1 = _prologue_bwd(
                ga, x_tile[1:1 + 2 * th, 1:1 + wbs, :], pro_ref, cfg.pro)
            dpro_ref[0, :] += dp0
            dpro_ref[1, :] += dp1

        @pl.when(k >= 2)
        def _():
            _wait_copy(dxstage.at[slot], outsem.at[slot])

        dxstage[slot] = jnp.pad(
            ga.astype(jnp.bfloat16), [(0, 0), (1, wbp_s - wbs - 1), (0, 0)])
        pltpu.make_async_copy(
            dxstage.at[slot], dx_hbm.at[b, pl.ds(2 * i * th + 1, 2 * th)],
            outsem.at[slot]).start()

        @pl.when(k + 1 == total)
        def _():
            _wait_copy(dxstage.at[slot], outsem.at[slot])
            if total > 1:
                _wait_copy(dxstage.at[1 - slot], outsem.at[1 - slot])


def _down_fwd_call(cfg: DownCfg, x, w3, pro, bias):
    g_d = cfg.g_dst
    th = cfg.th(backward=False)
    n_i = g_d.h // th
    n_b = x.shape[0]
    const = lambda shape: pl.BlockSpec(shape, lambda bb, ii: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    s = cfg.phases
    taps = toeplitz_down(w3, cfg.g_src, cfg.g_virt, cop=cfg.lo // g_d.p)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                const((3, 2, cfg.l_in, s * cfg.lo))]
    args = [x, taps]
    if cfg.pro:
        in_specs.append(const((2, cfg.l_in)))
        args.append(pro.astype(jnp.float32))
    if cfg.has_bias:
        in_specs.append(const((1, cfg.lo)))
        args.append(bias.astype(jnp.float32))
    out_shape = [jax.ShapeDtypeStruct((n_b, g_d.h + 2, g_d.wbp, cfg.lo),
                                      jnp.bfloat16)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if cfg.emit_moments:
        out_shape.append(jax.ShapeDtypeStruct((2, cfg.lo), jnp.float32))
        out_specs.append(const((2, cfg.lo)))
    scratch = [
        pltpu.VMEM((2, 2 * th + 2, cfg.g_src.wbp, cfg.l_in), jnp.bfloat16),
        pltpu.VMEM((2, th, g_d.wbp, cfg.lo), jnp.bfloat16),
        pltpu.VMEM((1, g_d.wbp, cfg.lo), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    outs = pl.pallas_call(
        functools.partial(_down_fwd_kernel, th=th, n_i=n_i, cfg=cfg, n_b=n_b),
        grid=(n_b, n_i),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(*args)
    if cfg.emit_moments:
        return outs[0], outs[1]
    return outs[0], None


def _down_bwd_call(cfg: DownCfg, x, w3, pro, y, dy, dmom):
    g_s, g_d = cfg.g_src, cfg.g_dst
    th = cfg.th(backward=True)
    n_i = g_d.h // th
    n_b = x.shape[0]
    const = lambda shape: pl.BlockSpec(shape, lambda bb, ii: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    s = cfg.phases
    corr = cfg.emit_moments and s == 1
    # forward-layout taps (3, 2, L_in, s·Lo); the kernel's dx contraction
    # runs transposed (rhs dim 0 is L_in), so no swapaxes pass is needed
    tt = toeplitz_down(w3, g_s, cfg.g_virt, cop=cfg.lo // g_d.p)
    if s == 2:
        # Halo-ALIGNED pair view: pair col 1+v holds real dst interior
        # blocks (2v, 2v+1) in its 128-lane halves, masked (+ corrected by
        # the moments cotangent when emitting) — all elementwise/reshape/pad,
        # so XLA fuses it into the add-fusion that produced dy. A raw
        # bit-reshape of the dst surface is NOT DMA-able (its wbp/2 pair
        # width breaks the ×8 sublane-extent rule) and leaves the halo
        # column straddling a pair.
        if cfg.emit_moments:
            rows = jnp.arange(g_d.h + 2)[None, :, None, None]
            valid = (rows >= 1) & (rows <= g_d.h)
            dy = jnp.where(
                valid,
                dy.astype(jnp.float32) + dmom[0]
                + 2.0 * y.astype(jnp.float32) * dmom[1],
                0.0).astype(jnp.bfloat16)
        pair_wbp = _round_up(g_s.wb + 2, 8)
        dy = dy[:, :, 1:1 + g_d.wb, :].reshape(
            n_b, g_d.h + 2, g_s.wb, 2 * cfg.lo)
        dy = jnp.pad(dy, [(0, 0), (0, 0), (1, pair_wbp - g_s.wb - 1),
                          (0, 0)])
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [dy]
    if corr:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(y)
    in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                 const((3, 2, cfg.l_in, s * cfg.lo))]
    args += [x, tt]
    if cfg.pro:
        in_specs.append(const((2, cfg.l_in)))
        args.append(pro.astype(jnp.float32))
    if corr:
        in_specs.append(const((2, cfg.lo)))
        args.append(dmom.astype(jnp.float32))
    out_shape, out_specs = [], []
    if cfg.need_dx:
        out_shape.append(jax.ShapeDtypeStruct(
            (n_b, g_s.h + 2, g_s.wbp, cfg.l_in), jnp.bfloat16))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    out_shape.append(jax.ShapeDtypeStruct((3, 2, cfg.l_in, s * cfg.lo),
                                          jnp.float32))
    out_specs.append(const((3, 2, cfg.l_in, s * cfg.lo)))
    if cfg.pro:
        out_shape.append(jax.ShapeDtypeStruct((2, cfg.l_in), jnp.float32))
        out_specs.append(const((2, cfg.l_in)))
    if cfg.has_bias:
        out_shape.append(jax.ShapeDtypeStruct((1, cfg.lo), jnp.float32))
        out_specs.append(const((1, cfg.lo)))
    dyt_shape = ((2, th + 2, g_d.wbp, cfg.lo) if s == 1
                 else (2, th + 2, _round_up(g_s.wb + 2, 8), 2 * cfg.lo))
    scratch = [pltpu.VMEM(dyt_shape, jnp.bfloat16)]
    if corr:
        scratch.append(pltpu.VMEM(dyt_shape, jnp.bfloat16))
    scratch.append(pltpu.VMEM((2, 2 * th + 2, g_s.wbp, cfg.l_in),
                              jnp.bfloat16))
    if cfg.need_dx:
        scratch.append(pltpu.VMEM((2, 2 * th, g_s.wbp, cfg.l_in),
                                  jnp.bfloat16))
        scratch.append(pltpu.VMEM((1, g_s.wbp, cfg.l_in), jnp.bfloat16))
    scratch += [
        pltpu.SemaphoreType.DMA((2 + int(corr), 2)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    outs = list(pl.pallas_call(
        functools.partial(_down_bwd_kernel, th=th, n_i=n_i, cfg=cfg, n_b=n_b),
        grid=(n_b, n_i),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(*args))
    dx = outs.pop(0) if cfg.need_dx else None
    dt = outs.pop(0)
    dpro = outs.pop(0) if cfg.pro else None
    dbias = outs.pop(0) if cfg.has_bias else None
    return dx, dt, dpro, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_conv_down(cfg: DownCfg, x, w3, pro, bias):
    """Single-input fused stride-2 packed conv: ``x`` packed-halo at
    ``cfg.g_src``; ``w3`` the RAW (3, 3, Cin, Cout) kernel (taps built/folded
    internally — depthwise convs pass a diagonal-expanded kernel); ``pro`` a
    per-lane (2, L_in) pending prologue or None; ``bias`` (1, Lo) or None.
    Returns ``(y_packed_halo_at_g_dst, moments_or_None)``."""
    return _down_fwd_call(cfg, x, w3, pro, bias)


def _fused_conv_down_fwd(cfg, x, w3, pro, bias):
    y, mom = _down_fwd_call(cfg, x, w3, pro, bias)
    return (y, mom), (x, w3, pro, y)


def _fused_conv_down_bwd(cfg, res, cot):
    x, w3, pro, y = res
    dy, dmom = cot
    if cfg.emit_moments and dmom is None:
        dmom = jnp.zeros((2, cfg.lo), jnp.float32)
    dx, dt, dpro, dbias = _down_bwd_call(cfg, x, w3, pro, y, dy, dmom)
    dw3 = fold_down_dw(dt, w3.shape, cfg.g_src, cfg.g_virt,
                       cop=cfg.lo // cfg.g_dst.p)
    if dx is None:
        dx = jnp.zeros_like(x)  # non-diff input (e.g. the image); XLA DCEs
    return dx, dw3, dpro, dbias


fused_conv_down.defvjp(_fused_conv_down_fwd, _fused_conv_down_bwd)


def conv3x3_s2_packed_ref(xp, taps, g_src: RowGeom, g_dst: RowGeom):
    """jnp reference consumer of :func:`toeplitz_down` (whole image, no
    tiling) — the contraction a round-3 kernel will perform per row tile.
    ``xp``: packed-halo src (B, H_s+2, wbp_s, L_s) → packed-halo dst."""
    b = xp.shape[0]
    h_d, wb_d, lo = g_dst.h, g_dst.wb, taps.shape[-1]
    acc = jnp.zeros((b, h_d, wb_d, lo), jnp.float32)
    for a in range(3):
        # row parity view: dst row r_d reads src halo'd row 2 r_d + a
        va = xp[:, a:a + 2 * h_d].reshape(b, h_d, 2, xp.shape[2],
                                          xp.shape[3])[:, :, 0]
        for d in (-1, 0):
            sl = va[:, :, d + 1:d + 1 + wb_d, :]
            acc += jax.lax.dot_general(
                sl, taps[a, d + 1], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return jnp.pad(acc.astype(jnp.bfloat16),
                   [(0, 0), (1, 1), (1, g_dst.wbp - wb_d - 1), (0, 0)])


# ----------------------------------------- fused head + DiceCE + confusion
#
# The segmentation head (3×3 conv → logits) fuses the ENTIRE training loss
# surface: softmax/CE/dice statistics and the argmax confusion matrix are
# computed in-VMEM on the logits tiles, and the backward kernel synthesizes
# d(logits) from tiny per-(sample, class) cotangents — the NHWC logits, the
# one-hot target and d(logits) never exist in HBM (the lane-split unpack,
# the XLA loss passes and the d(logits) round-trip cost ~8 ms/step at 512²
# b32). Reference semantics: MONAI DiceCELoss(softmax=True)
# (``Main_MMR_SegModel.py:578,709``) + per-batch macro IoU
# (``Main_MMR_SegModel.py:712``).

@dataclasses.dataclass(frozen=True)
class HeadLossSpec:
    """Static config of the fused head+loss op (hashable).

    ``with_conf=False`` drops the in-kernel argmax index tracking + confusion
    partials (for consumers that log loss only; the reference's train step
    does compute a per-batch IoU — ``Main_MMR_SegModel.py:712`` calls
    ``calculate_iou`` every step — so the production path keeps it on).
    With conf on, the argmax/max is the bit-exact int-key scheme
    (:func:`_argmax_first`); with conf off only the max is needed and it
    comes from the MXU-matmul :func:`_group_max` butterfly (its roll-based
    variant measured ~18× slower — see that function's NOTE; the ~1-ulp
    matmul rounding is irrelevant for a softmax stabilizer).

    The fwd writes the packed LOG-prob surface and the bwd re-reads it (no
    softmax recompute in the bwd — d(logits) synthesis only needs
    exp(logp) + labels). A no-surface variant (bwd recompute from th+4-row
    x tiles) was built and measured 2.7 ms/iter SLOWER at 512² b32 — both
    kernels are MXU-bound, so the ~600 MB y round-trip is DMA-hidden while
    the 9 recompute matmuls are pure added MXU time. Kept as a ledger
    entry, not a knob."""

    geom: RowGeom
    l_in: int            # input lanes (the pre-head feature row)
    nc: int              # number of classes
    with_conf: bool = True

    @property
    def lo(self) -> int:
        return self.geom.lanes(self.nc)

    @property
    def cp(self) -> int:
        return self.geom.cp(self.nc)

    def vmem(self, th: int, backward: bool) -> int:
        g = self.geom
        tiles = 2 * (th + 2) * g.wbp * (self.l_in + self.lo) * 2
        work = 4 * th * g.wbp * self.lo * 4
        tees = 9 * self.l_in * self.lo * 2 + self.lo ** 2 * 4
        stage = 2 * th * g.wbp * max(self.l_in, self.lo) * 2
        if backward:
            tiles += 2 * (th + 2) * g.wbp * self.lo * 2  # log-prob y tiles
            tees += 9 * self.l_in * self.lo * 4          # dT accumulator
        return tiles + work + tees + stage

    def th(self, backward: bool) -> int:
        t = choose_th(self.geom.h, lambda c: self.vmem(c, backward))
        assert t, f"no feasible row tile for {self}"
        return t


@functools.lru_cache(maxsize=None)
def _loss_consts_np(p: int, cp: int):
    """S: (L, L) group-sum broadcast matrix (lane (q,i) sums into every lane
    of group q). The exponential sums are NOT idempotent, so the in-group
    broadcast stays a single MXU matmul (a roll butterfly is only exact for
    power-of-two cp); max/argmax use :func:`_argmax_first` instead."""
    import numpy as np

    l = p * cp
    s = np.zeros((l, l), np.float32)
    for q in range(p):
        s[q * cp:(q + 1) * cp, q * cp:(q + 1) * cp] = 1.0
    return s


def _lane_class_masks(shape, cp: int, nc: int):
    """(class-id, valid) lane patterns broadcast to ``shape``(+lanes)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    cls = lane % cp
    return cls.astype(jnp.float32), cls < nc


def _in_group_shift(t, cp, k):
    """Lane j = q·cp+i reads lane q·cp+(i+k)%cp: an in-group cyclic shift
    built from two full-lane ``pltpu.roll``s (bit-exact VPU rotations; f32 is
    32-bit so roll is legal) selected on whether i+k wraps the group."""
    l = t.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 1)
    wrapless = lane % cp < cp - k
    ax = t.ndim - 1
    return jnp.where(wrapless, pltpu.roll(t, l - k, ax),
                     pltpu.roll(t, cp - k, ax))


def _expm1_nonpos(x):
    """``exp(x) - 1`` with full relative precision near 0, for x ≤ 0.

    Mosaic has no TPU lowering for the ``expm1`` primitive (the interpret
    mode used by the CPU tests accepts it — only a real-TPU compile trips),
    so build it: a 5-term Taylor polynomial on (−1/8, 0] (truncation error
    < |x|⁶/720 ≤ 5e-9 absolute, ~4e-8 relative at the boundary) and plain
    ``exp(x) − 1`` below, where cancellation costs at most ~1e-6 relative.
    The precision matters: the bwd kernel's CE gradient at the label lane is
    expm1(logp), which must NOT collapse to 0.0 for confident pixels whose
    f32 ``exp(logp)`` rounds to exactly 1.0 (|logp| < 2⁻²⁴)."""
    small = x > -0.125
    xs = jnp.where(small, x, -0.125)
    p = xs * (1.0 + xs * (0.5 + xs * (1.0 / 6.0 + xs * (1.0 / 24.0
                                                        + xs * (1.0 / 120.0)))))
    return jnp.where(small, p, jnp.exp(x) - 1.0)


def _group_max(x, cp):
    """Per-pixel(-group) max over the cp class lanes, broadcast back to every
    lane of its group, via a max butterfly of in-group cyclic lane shifts
    (ceil(log2(cp)) permutation matmuls). MXU rounding (f32 dot_general
    ≈ bf16) only perturbs the shifted copies by ~1 ulp — irrelevant for
    softmax stabilization, which needs any value within ~80 of the true max.
    NOTE measured on HW: a roll-based variant of this max-only F32 butterfly
    compiles to a ~18× slower program (24 ms vs ~1.3 ms head fwd at 512²
    b32) even though the same max-only butterfly on INT32 keys in
    :func:`_argmax_first` is fast — keep the matmul form here."""
    l = x.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    same = row // cp == col // cp
    m = x
    k = 1
    while k < cp:
        pm = jnp.where(jnp.logical_and(same, row % cp == (col % cp + k) % cp),
                       1.0, 0.0)
        shifted = jax.lax.dot_general(
            m, pm, (((m.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.maximum(m, shifted)
        k *= 2
    return m


def _sortable_key(x):
    """f32 → int32 monotone key (int order == float order), bit-exact.

    Standard trick: positives keep their bit pattern; negatives get
    ``~bits ^ INT_MIN`` (reverses their order and places them below all
    positives in SIGNED int32 order). ``x + 0.0`` first normalizes −0.0 to
    +0.0 so EQUAL floats always get EQUAL keys (−0/+0 would otherwise
    split a torch-equality tie)."""
    b = jax.lax.bitcast_convert_type(x + 0.0, jnp.int32)
    return jnp.where(b >= 0, b,
                     jnp.bitwise_xor(jnp.bitwise_not(b),
                                     jnp.int32(-2147483648)))


def _key_to_f32(k):
    """Inverse of :func:`_sortable_key` (exact)."""
    b = jnp.where(k >= 0, k,
                  jnp.bitwise_not(jnp.bitwise_xor(k,
                                                  jnp.int32(-2147483648))))
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _argmax_first(accm, cp, vmask):
    """Exact per-group ``(max, first-argmax one-hot)`` over the cp class
    lanes, broadcast to every lane of the group — torch's ``argmax(dim=1)``
    first-max semantics (the reference's prediction surface,
    ``Main_MMR_SegModel.py:709``).

    Three exact stages, each cheaper than the old (value, index) roll
    butterfly (measured 2.0→1.1 ms/call in the 512² b32 head fwd):
    1. max-ONLY butterfly of in-group cyclic rolls on int32 monotone keys
       (:func:`_sortable_key`) — rolls are bit-exact 32-bit VPU rotations
       and int compares can't round, so the group max is exact;
    2. ``tied = key == max_key`` marks ALL argmax-tied lanes exactly;
    3. first-tie selection via an exclusive in-group prefix-sum MATMUL:
       ``pre = tied_f32 · LT`` (LT strictly-lower-triangular per group) and
       ``first = tied & (pre == 0)``. MXU f32 dot_generals round ≈ bf16
       (CLAUDE.md), but the sums here are integers ≤ cp−1 ≤ 255, which
       bf16 represents exactly — the round-2 HW-rounding trap does not
       apply. Ties between EXACT f32 logits do occur in realistic states
       (e.g. zero-init bias + dead features ⇒ all-equal logits), so the
       first-tie rule is load-bearing for torch conf parity.

    Returns ``(bv, first)``: the exact f32 group max (softmax stabilizer)
    and the first-argmax one-hot as a bool mask (class-pad lanes excluded
    by ``vmask`` upstream in the caller)."""
    l = accm.shape[-1]
    key = _sortable_key(accm)
    mk = key
    k = 1
    while k < cp:
        mk = jnp.maximum(mk, _in_group_shift(mk, cp, k))
        k *= 2
    tied = jnp.logical_and(vmask, key == mk)
    row = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    lt = jnp.where(jnp.logical_and(row // cp == col // cp, row < col),
                   1.0, 0.0)
    pre = jax.lax.dot_general(jnp.where(tied, 1.0, 0.0), lt,
                              (((accm.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return _key_to_f32(mk), jnp.logical_and(tied, pre == 0.0)


def _head_softmax(acc, labs, sgrp, clsv, vmask, m):
    """Fwd-kernel lane-space softmax pieces on a logits tile (the bwd kernel
    reads the fwd's stored log-probs and needs none of this).

    Stabilized with the PER-PIXEL(-group) max ``m`` the caller's argmax/max
    butterfly already produced — a tile-global max would silently underflow
    every exp() of a pixel whose own logits sit far below the tile max
    (large early-training spread), zeroing its Dice/CE stats. The reference
    (MONAI softmax CE) is per-pixel stabilized. ``clsv``/``vmask`` are the
    caller's lane masks (computed once per chunk shape, not per call).

    Returns (z, sums, probs, onehot); class-pad lanes excluded."""
    # clamp the exponent at 0: m is within rounding of the true max for valid
    # lanes, and fully-invalid groups (halo rows) have m = -1e30, where an
    # unclamped exp(acc - m) would manufacture infs even under the vmask
    z = jnp.where(vmask, jnp.exp(jnp.minimum(acc - m, 0.0)), 0.0)
    sums = jax.lax.dot_general(z, sgrp[...], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    probs = z / jnp.maximum(sums, 1e-30)
    onehot = jnp.where(jnp.logical_and(labs == clsv, vmask), 1.0, 0.0)
    return z, sums, probs, onehot


def _head_chunks(th: int) -> int:
    """Row-chunk count for the MXU/VPU software pipeline inside the head
    kernels: the conv (fwd) / dW+dx (bwd) matmul phase of chunk c+1 is
    independent of chunk c's elementwise loss phase, so splitting the tile
    lets Mosaic's scheduler overlap the MXU and VPU instead of serializing
    a whole-tile matmul phase behind a whole-tile VPU chain."""
    for n_c in (4, 2):
        if th % n_c == 0 and th // n_c >= 8:
            return n_c
    return 1


def _head_loss_fwd_kernel(x_hbm, lab_hbm, t_ref, pro_ref, bias_ref, sgrp,
                          y_hbm, stats_ref, conf_ref, xt, lt, ystage,
                          zstage, insem, outsem, halosem, *, th, n_i, geom,
                          li, lo, cp, nc, n_b, with_conf):
    wb, wbp = geom.wb, geom.wbp
    b, i = pl.program_id(0), pl.program_id(1)
    k = b * n_i + i
    total = n_b * n_i

    def dma(src, dst, sem_i, slot, kk):
        bb, ii = kk // n_i, kk % n_i
        return pltpu.make_async_copy(src.at[bb, pl.ds(ii * th, th + 2)],
                                     dst.at[slot], insem.at[sem_i, slot])

    @pl.when(k == 0)
    def _():
        dma(x_hbm, xt, 0, 0, 0).start()
        dma(lab_hbm, lt, 1, 0, 0).start()
        conf_ref[:] = jnp.zeros_like(conf_ref)
        zstage[:] = jnp.zeros_like(zstage)

    @pl.when(k + 1 < total)
    def _():
        dma(x_hbm, xt, 0, (k + 1) % 2, k + 1).start()
        dma(lab_hbm, lt, 1, (k + 1) % 2, k + 1).start()

    @pl.when(i == 0)
    def _():
        stats_ref[:] = jnp.zeros_like(stats_ref)
        top = pltpu.make_async_copy(zstage, y_hbm.at[b, pl.ds(0, 1)],
                                    halosem.at[0])
        bot = pltpu.make_async_copy(
            zstage, y_hbm.at[b, pl.ds(n_i * th + 1, 1)], halosem.at[1])
        top.start()
        bot.start()
        top.wait()
        bot.wait()

    valid = _halo_mask(i, th, wb, wbp, n_i)
    dma(x_hbm, xt, 0, k % 2, k).wait()
    dma(lab_hbm, lt, 1, k % 2, k).wait()
    tile = _prologue(xt[k % 2], pro_ref, valid)
    labs_full = lt[k % 2]
    slot = k % 2

    @pl.when(k >= 2)
    def _():
        _wait_copy(ystage.at[slot], outsem.at[slot])

    # MXU/VPU software pipeline: conv chunk c+1 (MXU) is independent of
    # loss chunk c (VPU elementwise), so interleaving them lets the
    # scheduler overlap the units — whole-tile phases serialize ~2.5 ms of
    # head-conv matmuls behind the ~4.5 ms loss chain at 512² b32.
    n_c = _head_chunks(th)
    tc = th // n_c
    clsv, vmask = _lane_class_masks((tc, wb, lo), cp, nc)

    def conv_chunk(c):
        acc = jnp.zeros((tc, wb, lo), jnp.float32)
        for dy in range(3):
            for dwb in range(3):
                acc += jax.lax.dot_general(
                    tile[c * tc + dy:c * tc + dy + tc, dwb:dwb + wb, :],
                    t_ref[dy, dwb],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return acc + bias_ref[0][None, None, :]

    def loss_chunk(c, acc):
        # ---- argmax butterfly (doubles as the softmax stabilizer) ----
        # bit-exact roll butterfly instead of nc per-class MXU broadcast
        # matmuls: ceil(log2(cp)) VPU stages give the exact first-max class
        # index and the per-pixel(-group) max — the stabilizer
        # _head_softmax needs — for free.
        labs = labs_full[1 + c * tc:1 + c * tc + tc,
                         1:1 + wb, :].astype(jnp.float32)
        accm = jnp.where(vmask, acc, -1e30)
        if with_conf:
            bv, first = _argmax_first(accm, cp, vmask)
        else:
            # no confusion wanted: max only (no index tracking)
            bv = _group_max(accm, cp)

        # ---- loss statistics on the interior ----
        z, sums, probs, onehot = _head_softmax(acc, labs, sgrp, clsv,
                                               vmask, m=bv)
        lse = jnp.log(jnp.maximum(sums, 1e-30)) + bv
        ce = onehot * (lse - acc)
        stats_ref[0, 0, :] += jnp.sum(probs, axis=(0, 1))
        stats_ref[0, 1, :] += jnp.sum(onehot, axis=(0, 1))
        stats_ref[0, 2, :] += jnp.sum(probs * onehot, axis=(0, 1))
        stats_ref[0, 3, :] += jnp.sum(ce, axis=(0, 1))

        if with_conf:
            pred_oh = jnp.where(first, 1.0, 0.0)
            conf_ref[:, :] += jax.lax.dot_general(
                pred_oh.reshape(tc * wb, lo), onehot.reshape(tc * wb, lo),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        # the residual surface stores the LOG-probabilities (acc − lse,
        # already in hand, masked to −80 at class-pad lanes): the bwd kernel
        # then needs no softmax recompute at all — probs = exp(logp), and
        # probs−1 = expm1(logp). Log space keeps RELATIVE bf16 precision on
        # BOTH tails: storing probs directly rounds p ∈ (1−2⁻⁹, 1] to
        # exactly 1.0, zeroing confident-pixel CE gradients late in
        # training; storing logits quantizes ±2⁻⁹·|logit| BEFORE the f32
        # softmax (~2% prob error). y is residual/metrics-only (decoders.py
        # drops it), so the surface's meaning is free to choose.
        logp = jnp.where(vmask, jnp.minimum(acc - lse, 0.0), -80.0)
        ystage[slot, c * tc:(c + 1) * tc] = jnp.pad(
            logp.astype(jnp.bfloat16), [(0, 0), (1, wbp - wb - 1), (0, 0)],
            constant_values=-80.0)

    acc_c = conv_chunk(0)
    for c in range(1, n_c):
        acc_n = conv_chunk(c)
        loss_chunk(c - 1, acc_c)
        acc_c = acc_n
    loss_chunk(n_c - 1, acc_c)
    pltpu.make_async_copy(
        ystage.at[slot], y_hbm.at[b, pl.ds(i * th + 1, th)],
        outsem.at[slot]).start()

    @pl.when(k + 1 == total)
    def _():
        _wait_copy(ystage.at[slot], outsem.at[slot])
        if total > 1:
            _wait_copy(ystage.at[1 - slot], outsem.at[1 - slot])


def _head_loss_bwd_kernel(y_hbm, x_hbm, lab_hbm, tts_ref, pro_ref,
                          sgrp, dst_ref, dx_hbm, dt_ref, dpro_ref, dbias_ref,
                          yt, xt, lt, dxstage, zstage, insem, outsem,
                          halosem, *, th, n_i, geom, li, lo, cp, nc, n_b):
    """Synthesizes d(logits) in VMEM from the per-(b, lane) loss cotangents
    ``dst_ref`` (4, lo): [dΣprobs, dΣonehot(unused), dΣ(probs·onehot), dce],
    then runs the standard single-input backward (dT, dx, dpro, dbias).

    The LOG-prob tile is RE-READ from the fwd's y surface — the fwd stores
    log-probabilities, so this kernel's softmax work is a single exp. A
    recompute variant (extended x tiles + the fwd conv in VMEM) measured
    2.7 ms SLOWER per iteration at 512² b32 — this kernel is MXU-bound, so
    the y round-trip it would save is already DMA-hidden while the 9 extra
    recompute matmuls are not (docs/PERF.md round-3 ledger)."""
    wb, wbp = geom.wb, geom.wbp
    b, i = pl.program_id(0), pl.program_id(1)
    k = b * n_i + i
    total = n_b * n_i

    def dma(src, dst, sem_i, slot, kk):
        bb, ii = kk // n_i, kk % n_i
        return pltpu.make_async_copy(src.at[bb, pl.ds(ii * th, th + 2)],
                                     dst.at[slot], insem.at[sem_i, slot])

    def start_all(slot, kk):
        dma(y_hbm, yt, 0, slot, kk).start()
        dma(x_hbm, xt, 1, slot, kk).start()
        dma(lab_hbm, lt, 2, slot, kk).start()

    @pl.when(k == 0)
    def _():
        start_all(0, 0)
        dt_ref[:] = jnp.zeros_like(dt_ref)
        dpro_ref[:] = jnp.zeros_like(dpro_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        zstage[:] = jnp.zeros_like(zstage)

    @pl.when(k + 1 < total)
    def _():
        start_all((k + 1) % 2, k + 1)

    @pl.when(i == 0)
    def _():
        top = pltpu.make_async_copy(zstage, dx_hbm.at[b, pl.ds(0, 1)],
                                    halosem.at[0])
        bot = pltpu.make_async_copy(
            zstage, dx_hbm.at[b, pl.ds(n_i * th + 1, 1)], halosem.at[1])
        top.start()
        bot.start()
        top.wait()
        bot.wait()

    slot = k % 2
    valid = _halo_mask(i, th, wb, wbp, n_i)
    dma(y_hbm, yt, 0, slot, k).wait()
    dma(lab_hbm, lt, 2, slot, k).wait()
    dma(x_hbm, xt, 1, slot, k).wait()
    # the fwd stored LOG-probs on the y surface, so d(logits) synthesis
    # needs no softmax recompute: probs = exp(logp) (class-pad lanes carry
    # −80 → 0; image-edge halo rows are valid-masked below), probs − onehot
    # at the label lane is expm1(logp) — exact even when bf16 would round
    # probs to 1.0 — and onehot is rebuilt from the labels it reads anyway
    logp_full = yt[slot].astype(jnp.float32)      # halo'd log-probs tile
    labs_full = lt[slot].astype(jnp.float32)
    x_tile = xt[slot]
    a_tile = _prologue(x_tile, pro_ref, valid)

    @pl.when(k >= 2)
    def _():
        _wait_copy(dxstage.at[slot], outsem.at[slot])

    # MXU/VPU software pipeline (mirror of the fwd kernel): the d(logits)
    # synthesis of chunk c+1 (VPU elementwise) is independent of chunk c's
    # 18 dW/dx tap matmuls (MXU) — chunking lets the scheduler hide the
    # synthesis under the matmuls. Chunks overlap by the 2 conv halo rows
    # (recomputed, ~2/tc waste).
    n_c = _head_chunks(th)
    tc = th // n_c
    clsv, vmask = _lane_class_masks((tc + 2, wbp, lo), cp, nc)

    def synth_chunk(c):
        lp = logp_full[c * tc:c * tc + tc + 2]
        labs = labs_full[c * tc:c * tc + tc + 2]
        vld = valid[c * tc:c * tc + tc + 2]
        probs = jnp.exp(lp)
        onehot = jnp.where(
            jnp.logical_and(labs == clsv, jnp.logical_and(vmask, vld)),
            1.0, 0.0)
        g_up = dst_ref[0, 0][None, None, :] \
            + dst_ref[0, 2][None, None, :] * onehot
        inner = jax.lax.dot_general(probs * g_up, sgrp[...],
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        dacc = probs * (g_up - inner) \
            + dst_ref[0, 3][None, None, :] \
            * jnp.where(onehot > 0.0, _expm1_nonpos(lp), probs)
        return jnp.where(vld, dacc, 0.0)

    def mat_chunk(c, dacc):
        dy_bf = dacc.astype(jnp.bfloat16)
        dy_int = dacc[1:1 + tc, 1:1 + wb, :]
        dy_flat = dy_int.astype(jnp.bfloat16).reshape(tc * wb, lo)
        dbias_ref[0, :] += jnp.sum(dy_int, axis=(0, 1))
        for dyy in range(3):
            for dwb in range(3):
                a2 = a_tile[c * tc + dyy:c * tc + dyy + tc,
                            dwb:dwb + wb, :].reshape(tc * wb, li)
                dt_ref[dyy, dwb] += jax.lax.dot_general(
                    a2, dy_flat, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        ga = jnp.zeros((tc, wb, li), jnp.float32)
        for dyy in range(3):
            for dwb in range(3):
                ga += jax.lax.dot_general(
                    dy_bf[dyy:dyy + tc, dwb:dwb + wb, :],
                    tts_ref[2 - dyy, 2 - dwb],
                    (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
        ga, dp0, dp1 = _prologue_bwd(
            ga, x_tile[1 + c * tc:1 + c * tc + tc, 1:1 + wb, :], pro_ref)
        dpro_ref[0, :] += dp0
        dpro_ref[1, :] += dp1
        dxstage[slot, c * tc:(c + 1) * tc] = jnp.pad(
            ga.astype(jnp.bfloat16), [(0, 0), (1, wbp - wb - 1), (0, 0)])

    d_prev = synth_chunk(0)
    for c in range(1, n_c):
        d_next = synth_chunk(c)
        mat_chunk(c - 1, d_prev)
        d_prev = d_next
    mat_chunk(n_c - 1, d_prev)
    pltpu.make_async_copy(
        dxstage.at[slot], dx_hbm.at[b, pl.ds(i * th + 1, th)],
        outsem.at[slot]).start()

    @pl.when(k + 1 == total)
    def _():
        _wait_copy(dxstage.at[slot], outsem.at[slot])
        if total > 1:
            _wait_copy(dxstage.at[1 - slot], outsem.at[1 - slot])


def _head_loss_fwd_call(spec: HeadLossSpec, x, tee, pro, bias, labels):
    g = spec.geom
    th = spec.th(backward=False)
    n_i = g.h // th
    n_b = x.shape[0]
    const = lambda shape: pl.BlockSpec(shape, lambda bb, ii: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    sgrp = _loss_consts_np(g.p, spec.cp)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    in_specs += [const((3, 3, spec.l_in, spec.lo)), const((2, spec.l_in)),
                 const((1, spec.lo)), const((spec.lo, spec.lo))]
    args = [x, labels, tee.astype(jnp.bfloat16), pro.astype(jnp.float32),
            bias.astype(jnp.float32), jnp.asarray(sgrp)]
    out_shape = [
        jax.ShapeDtypeStruct((n_b, g.h + 2, g.wbp, spec.lo), jnp.bfloat16),
        jax.ShapeDtypeStruct((n_b, 4, spec.lo), jnp.float32),
        jax.ShapeDtypeStruct((spec.lo, spec.lo), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 4, spec.lo), lambda bb, ii: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        const((spec.lo, spec.lo)),
    ]
    scratch = [
        pltpu.VMEM((2, th + 2, g.wbp, spec.l_in), jnp.bfloat16),
        pltpu.VMEM((2, th + 2, g.wbp, spec.lo), jnp.int8),   # labels
        pltpu.VMEM((2, th, g.wbp, spec.lo), jnp.bfloat16),
        pltpu.VMEM((1, g.wbp, spec.lo), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return pl.pallas_call(
        functools.partial(_head_loss_fwd_kernel, th=th, n_i=n_i, geom=g,
                          li=spec.l_in, lo=spec.lo, cp=spec.cp, nc=spec.nc,
                          n_b=n_b, with_conf=spec.with_conf),
        grid=(n_b, n_i),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(*args)


def _head_loss_bwd_call(spec: HeadLossSpec, x, tee, pro, y, labels, dstats):
    g = spec.geom
    th = spec.th(backward=True)
    n_i = g.h // th
    n_b = x.shape[0]
    const = lambda shape: pl.BlockSpec(shape, lambda bb, ii: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    sgrp = _loss_consts_np(g.p, spec.cp)
    # forward-layout taps; the kernel flips statically + contracts rhs dim 1
    tts = tee.astype(jnp.bfloat16)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    in_specs += [const((3, 3, spec.l_in, spec.lo)),
                 const((2, spec.l_in)), const((spec.lo, spec.lo)),
                 pl.BlockSpec((1, 4, spec.lo), lambda bb, ii: (bb, 0, 0),
                              memory_space=pltpu.VMEM)]
    args = [y, x, labels, tts, pro.astype(jnp.float32), jnp.asarray(sgrp),
            dstats.astype(jnp.float32)]
    out_shape = [
        jax.ShapeDtypeStruct((n_b, g.h + 2, g.wbp, spec.l_in), jnp.bfloat16),
        jax.ShapeDtypeStruct((3, 3, spec.l_in, spec.lo), jnp.float32),
        jax.ShapeDtypeStruct((2, spec.l_in), jnp.float32),
        jax.ShapeDtypeStruct((1, spec.lo), jnp.float32),
    ]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY),
                 const((3, 3, spec.l_in, spec.lo)), const((2, spec.l_in)),
                 const((1, spec.lo))]
    scratch = [
        pltpu.VMEM((2, th + 2, g.wbp, spec.lo), jnp.bfloat16),
        pltpu.VMEM((2, th + 2, g.wbp, spec.l_in), jnp.bfloat16),
        pltpu.VMEM((2, th + 2, g.wbp, spec.lo), jnp.int8),   # labels
        pltpu.VMEM((2, th, g.wbp, spec.l_in), jnp.bfloat16),
        pltpu.VMEM((1, g.wbp, spec.l_in), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((3, 2)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return pl.pallas_call(
        functools.partial(_head_loss_bwd_kernel, th=th, n_i=n_i, geom=g,
                          li=spec.l_in, lo=spec.lo, cp=spec.cp, nc=spec.nc,
                          n_b=n_b),
        grid=(n_b, n_i),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_head_loss(spec: HeadLossSpec, x, tee, pro, bias, labels):
    """Head conv + in-kernel loss statistics.

    Returns ``(y_packed, stats, conf)``: packed softmax LOG-probs (residual /
    metrics-only — their cotangent is ignored; gradients flow exclusively
    through ``stats``), per-sample per-lane loss stats (n_b, 4, L) =
    [Σprobs, Σonehot, Σprobs·onehot, Σce], and the (L, L) confusion
    partials (nondiff)."""
    return _head_loss_fwd_call(spec, x, tee, pro, bias, labels)


def _fused_head_loss_fwd(spec, x, tee, pro, bias, labels):
    y, stats, conf = _head_loss_fwd_call(spec, x, tee, pro, bias, labels)
    return (y, stats, conf), (x, tee, pro, y, labels)


def _fused_head_loss_bwd(spec, res, cot):
    x, tee, pro, y, labels = res
    _, dstats, _ = cot
    dx, dt, dpro, dbias = _head_loss_bwd_call(spec, x, tee, pro, y, labels,
                                              dstats)
    # labels are targets, not parameters — a symbolic-zero cotangent (XLA
    # DCEs the materialization)
    return dx, dt, dpro, dbias, jnp.zeros_like(labels)


fused_head_loss.defvjp(_fused_head_loss_fwd, _fused_head_loss_bwd)


def pack_labels(masks, g: RowGeom, nc: int):
    """(B, H, W) int class ids → (B, H+2, wbp, L) int8 lane-replicated labels
    matching the head row's lane layout (halo/pad positions get 127 ≠ any
    class; int8 halves the label traffic of the fused head loss vs bf16).

    Halo/pad is applied on the NARROW (B, H, W) int8 surface before the lane
    broadcast, so the full 128-lane label surface is written once (the
    broadcast-then-pad order re-copied all ~150 MB at 512² b32)."""
    b, h, w = masks.shape
    cp = g.cp(nc)
    lab = jnp.pad(masks.astype(jnp.int8),
                  [(0, 0), (1, 1), (g.p, (g.wbp - g.wb - 1) * g.p)],
                  constant_values=127)
    lab = lab.reshape(b, h + 2, g.wbp, g.p)
    lab = jnp.broadcast_to(lab[..., None], (b, h + 2, g.wbp, g.p, cp))
    return lab.reshape(b, h + 2, g.wbp, g.p * cp)


def assemble_dice_ce(spec: HeadLossSpec, stats, conf, n_pixels: int,
                     smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
                     lambda_dice: float = 1.0, lambda_ce: float = 1.0):
    """MONAI DiceCELoss(softmax=True) + macro-IoU from the fused partials.

    Matches ``losses.dice_ce.dice_ce_loss`` semantics exactly (per-sample
    per-class dice ratios meaned over (B, C); CE meaned over pixels)."""
    p, cp, nc = spec.geom.p, spec.cp, spec.nc
    n_b = stats.shape[0]
    per_c = stats.reshape(n_b, 4, p, cp)[..., :nc].sum(axis=2)  # (b, 4, nc)
    probs_sum, onehot_sum, inter = per_c[:, 0], per_c[:, 1], per_c[:, 2]
    ce_sum = stats[:, 3, :].sum()
    dice = 1.0 - (2.0 * inter + smooth_nr) / (
        probs_sum + onehot_sum + smooth_dr)
    loss = lambda_dice * jnp.mean(dice) + lambda_ce * ce_sum / n_pixels
    conf_c = jnp.einsum(
        "qiqj->ij", jax.lax.stop_gradient(conf).reshape(p, cp, p, cp)
    )[:nc, :nc]
    return loss, conf_c


# ------------------------------------------------------- BN-over-lanes math

def moments_to_stats(mom, count: int, p: int, cop: int, cout: int):
    """Per-lane (sum, sum sq) -> per-channel (mean, biased var) — flax
    ``nn.BatchNorm`` statistics semantics."""
    m0 = mom[0].reshape(p, cop).sum(0)[:cout] / count
    m1 = mom[1].reshape(p, cop).sum(0)[:cout] / count
    return m0, jnp.maximum(m1 - m0 * m0, 0.0)


def bn_affine_lanes(gamma, beta, mean, var, eps: float, p: int, cop: int):
    """Fold BN into a per-lane (scale, shift) prologue pair (2, p*cop)."""
    s = gamma * jax.lax.rsqrt(var + eps)
    t = beta - mean * s
    pad = cop - s.shape[0]
    s_l = jnp.tile(jnp.pad(s, (0, pad)), p)
    t_l = jnp.tile(jnp.pad(t, (0, pad)), p)
    return jnp.stack([s_l, t_l]).astype(jnp.float32)


def bias_lanes(bias, p: int, cop: int):
    return jnp.tile(jnp.pad(bias.astype(jnp.float32),
                            (0, cop - bias.shape[0])), p)[None, :]
