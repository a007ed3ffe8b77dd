"""Packed-lane Pallas 3x3 stride-1 SAME conv — round-2 kernel ("v2").

Why: XLA:TPU lowers the UNet-family's small-channel 3x3 convs through a
materialized im2col patch matrix; measured on v5e (benchmarks/probe_convs.py,
b32 bf16): 16->16 @512^2 costs 8.8 ms (ideal traffic 0.66 ms), 32->16 @512^2
16.8 ms, and the decoder's conv inventory alone is ~270 ms of the 488 ms
train step. Round 1's kernel (conv3x3.py) put pixels in lanes and paid for
Mosaic's lane rotates (15.2 ms vs XLA's 6.1 on the probe conv). This kernel
removes lane movement entirely.

Formulation — *packed-lane block-Toeplitz conv*:

- Choose p with p·Cp = L ≡ 0 (mod 128) (Cp = channel-padded C). Reshape
  NHWC to (B, H, W/p, p·Cp): p consecutive pixels' channel vectors fill whole
  128-lane tiles. Zero-pad one halo row (H) and one halo *block* (W) per side
  — SAME-conv taps outside the image are zero, so halo blocks are just zeros.
- For output block (h, wg), tap (dy, dx) reads input pixels in blocks
  wg + δ, δ ∈ {-1, 0, 1}. So
      y[h, wg] = Σ_{dy,δ} x[h+dy, wg+δ] @ T[dy, δ]
  where T[dy, δ] is an (L, Lo) *block-Toeplitz* matrix holding W[dy, dx] at
  the (q_in·Cp, q_out·Cop) slots with q_in = q_out + dx - δ·p. Nine dense
  MXU contractions per tile; the h+dy offsets are free (untiled leading dim)
  and the wg+δ offsets are ±1 *sublane-block* slices (cheap, no lane ops).
- Cost: padded MACs = 9·HW·Cp·Cop·p vs real 9·HW·C·Co — e.g. 8x padding
  waste for C=16 (p=8) — but the kernel is DMA-bound by design: HBM sees x
  once and y once per tile (double-buffered row-tile DMA), vs XLA's 9x+
  im2col traffic. Projected/measured wins per shape are recorded by
  benchmarks/bench_conv_kernel.py into the dispatch table.

Reference behavior anchor: the ConvBN/DoubleConv units these accelerate are
the reference's Conv2d(3,3,pad=1) stacks (``unet_parts.py:93-103``, smp
decoder blocks ``Main_MMR_SegModel.py:589``). Numerics: bf16 operands, f32
accumulation — same contract as flax ``nn.Conv(dtype=bf16)``.

Full custom VJP:
- dx is the same kernel with flipped/transposed weights;
- dw accumulates per-(dy,δ) packed outer products dT = xᵀ·g across the grid
  (sequential TPU grid → in-place accumulation), then folds the Toeplitz
  diagonals back to (3,3,Cin,Cout) outside the kernel (exact, tiny).

Off-TPU falls back to ``lax.conv_general_dilated``; ``_INTERPRET`` routes
tests through the kernel in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024
_INTERPRET = False
_FORCE = None  # None = auto dispatch; True/False override (tests/benchmarks)


# ----------------------------------------------------------------- geometry

def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.lru_cache(maxsize=None)
def plan(h: int, w: int, cin: int, cout: int) -> dict | None:
    """Choose (p, cp, cop, th) minimizing padded-MAC waste under VMEM budget.

    Returns None when no legal plan exists (odd W, tiny images, huge L).
    """
    best = None
    for p in (1, 2, 4, 8, 16):
        if w % p:
            continue
        unit = 128 // p if p <= 128 else 1
        if 128 % p:
            continue
        cp = _round_up(cin, unit)
        cop = _round_up(cout, unit)
        l, lo = p * cp, p * cop
        wb = w // p
        # Mosaic alignment: DMA/compute slices along the W-block (sublane)
        # dim must be multiples of 8
        if wb < 8 or wb % 8:
            continue
        wbp = _round_up(wb + 2, 8)  # padded sublane extent of the packed array
        waste = (cp / cin) * (cop / cout) * p
        # row tile: prefer the largest that divides H and fits in VMEM
        th = None
        for cand in (64, 32, 16, 8, 4):
            if h % cand:
                continue
            vmem = (2 * (cand + 2) * wbp * l * 2           # double-buffered xt
                    + cand * wb * lo * (4 + 2)             # acc f32 + out bf16
                    + 9 * l * lo * 2)                      # Toeplitz weights
            if vmem <= _VMEM_BUDGET:
                th = cand
                break
        if th is None:
            continue
        key = (waste, p)
        if best is None or key < best[0]:
            best = (key, {"p": p, "cp": cp, "cop": cop, "l": l, "lo": lo,
                          "th": th, "wb": wb, "wbp": wbp})
    return None if best is None else best[1]


# ------------------------------------------------------------ pack / unpack

def _pack(x, p: int, cp: int, wbp: int):
    """(B,H,W,C) -> (B, H+2, wbp, p*cp) bf16: zero halo row/block plus right
    padding to a multiple-of-8 W-block (sublane) extent (Mosaic DMA rule)."""
    b, h, w, c = x.shape
    x = jnp.pad(x.astype(jnp.bfloat16),
                [(0, 0), (1, 1), (0, 0), (0, cp - c)])
    x = x.reshape(b, h + 2, w // p, p * cp)
    return jnp.pad(x, [(0, 0), (0, 0), (1, wbp - w // p - 1), (0, 0)])


def _unpack(y, w: int, cout: int, p: int, cop: int):
    """(B,H,Wb,p*cop) -> (B,H,W,Cout)."""
    b, h, wb, _ = y.shape
    y = y.reshape(b, h, w, cop)
    return y[..., :cout]


def _pack_nohalo(x, p: int, cp: int):
    """(B,H,W,C) -> (B,H,W/p,p*cp) bf16, no halo (for dw's cotangent)."""
    b, h, w, c = x.shape
    x = jnp.pad(x.astype(jnp.bfloat16), [(0, 0), (0, 0), (0, 0), (0, cp - c)])
    return x.reshape(b, h, w // p, p * cp)


def _tap_slots(p: int):
    """Static (dx, q_out) -> (δ, q_in) map shared by Toeplitz build and dw
    fold."""
    out = []
    for dx in (-1, 0, 1):
        for q in range(p):
            t = q + dx
            d = t // p  # python floor: -1, 0, or 1
            out.append((dx, q, d, t - d * p))
    return out


def _toeplitz_scatter_np(p: int):
    """Cached 0/1 tensor M[dx, δ, q_in, q_out]: column tap dx routes src
    pixel q_in (block offset δ) to dst pixel q_out. Each (δ, q_in, q_out)
    slot has at most one contributing dx, so the einsum build is exact."""
    import numpy as np

    m = _TOEPLITZ_SCATTER_CACHE.get(p)
    if m is None:
        m = np.zeros((3, 3, p, p), np.float32)
        for dx, q, d, qi in _tap_slots(p):
            m[dx + 1, d + 1, qi, q] = 1.0
        _TOEPLITZ_SCATTER_CACHE[p] = m
    return m


_TOEPLITZ_SCATTER_CACHE: dict = {}


def _toeplitz(w3, p: int, cp: int, cop: int):
    """(3,3,Cin,Cout) -> (3,3,L,Lo) block-Toeplitz tap matrices (bf16).

    One einsum against a static 0/1 scatter — the per-slot ``.at[].set``
    build lowered to ~2·3p dynamic-update-slices per conv per step (~1.4
    ms/step across the flagship's taps)."""
    cin, cout = w3.shape[2], w3.shape[3]
    # NOTE (measured r3): an all-bf16 einsum (preferred_element_type=bf16,
    # exact here since every slot has a single contributing term) benched
    # ~1.2 f/s SLOWER end-to-end than this f32-einsum→cast chain — XLA's
    # bf16 scatter-einsum lowering is worse than the f32 one. Keep f32.
    m = jnp.asarray(_toeplitz_scatter_np(p))
    t = jnp.einsum("xdsq,axio->adsiqo", m,
                   w3.astype(jnp.bfloat16).astype(jnp.float32))
    t = jnp.pad(t, [(0, 0), (0, 0), (0, 0), (0, cp - cin), (0, 0),
                    (0, cop - cout)])
    return t.reshape(3, 3, p * cp, p * cop).astype(jnp.bfloat16)


def _fold_toeplitz_grad(dT, w_shape, p: int, cp: int, cop: int):
    """Exact adjoint of :func:`_toeplitz`: sum each true weight's diagonal
    replicas out of the (3,3,L,Lo) gradient."""
    _, _, cin, cout = w_shape
    m = jnp.asarray(_toeplitz_scatter_np(p))
    d6 = dT.reshape(3, 3, p, cp, p, cop)[:, :, :, :cin, :, :cout]
    return jnp.einsum("xdsq,adsiqo->axio",
                      m, d6.astype(jnp.float32)).astype(dT.dtype)


# ----------------------------------------------------------------- kernels

def _fwd_kernel(x_hbm, t_ref, bias_ref, o_ref, xt, sem, *,
                th: int, wb: int, lo: int, n_i: int, relu: bool):
    b, i = pl.program_id(0), pl.program_id(1)
    k = b * n_i + i  # global program counter -> double-buffer slot

    def dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * th, th + 2)], xt.at[slot], sem.at[slot])

    # double-buffered row-tile loads: warm-up on the first program, then each
    # program prefetches its successor's tile while computing its own
    @pl.when(k == 0)
    def _():
        dma(0, 0, 0).start()

    is_last = jnp.logical_and(b == pl.num_programs(0) - 1, i == n_i - 1)

    @pl.when(jnp.logical_not(is_last))
    def _():
        nb = jnp.where(i == n_i - 1, b + 1, b)
        ni = jnp.where(i == n_i - 1, 0, i + 1)
        dma((k + 1) % 2, nb, ni).start()

    dma(k % 2, b, i).wait()
    x = xt[k % 2]

    acc = jnp.zeros((th, wb, lo), jnp.float32)
    for dy in range(3):
        for dwb in range(3):
            acc += jax.lax.dot_general(
                x[dy:dy + th, dwb:dwb + wb, :], t_ref[dy, dwb],
                (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out = acc + bias_ref[0]
    if relu:
        out = jnp.maximum(out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def _dw_kernel(x_hbm, g_ref, dt_ref, xt, sem, *, th: int, wb: int, n_i: int):
    b, i = pl.program_id(0), pl.program_id(1)
    k = b * n_i + i

    def dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * th, th + 2)], xt.at[slot], sem.at[slot])

    @pl.when(k == 0)
    def _():
        dma(0, 0, 0).start()
        dt_ref[:] = jnp.zeros_like(dt_ref)

    is_last = jnp.logical_and(b == pl.num_programs(0) - 1, i == n_i - 1)

    @pl.when(jnp.logical_not(is_last))
    def _():
        nb = jnp.where(i == n_i - 1, b + 1, b)
        ni = jnp.where(i == n_i - 1, 0, i + 1)
        dma((k + 1) % 2, nb, ni).start()

    dma(k % 2, b, i).wait()
    x = xt[k % 2]
    g2 = g_ref[0].reshape(th * wb, g_ref.shape[-1])
    for dy in range(3):
        for dwb in range(3):
            # flattened to 2-D: Mosaic's matmul wants one contracting dim
            x2 = x[dy:dy + th, dwb:dwb + wb, :].reshape(th * wb, x.shape[-1])
            dt_ref[dy, dwb] += jax.lax.dot_general(
                x2, g2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


# ------------------------------------------------------------- driver calls

def _conv_packed(x, w3, bias, relu: bool):
    b, h, wdt, cin = x.shape
    cout = w3.shape[-1]
    pln = plan(h, wdt, cin, cout)
    assert pln is not None, f"no packed plan for {x.shape}->{cout}"
    p, cp, cop, l, lo, th, wb, wbp = (pln[k] for k in
                                      ("p", "cp", "cop", "l", "lo", "th",
                                       "wb", "wbp"))
    xp = _pack(x, p, cp, wbp)
    t = _toeplitz(w3, p, cp, cop)
    bias_l = jnp.tile(
        jnp.pad(bias.astype(jnp.float32), (0, cop - cout)), p)[None, :]
    n_i = h // th

    yp = pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, wb=wb, lo=lo, n_i=n_i,
                          relu=relu),
        grid=(b, n_i),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, l, lo), lambda bb, ii: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lo), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wb, lo), lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wb, lo), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wbp, l), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * wdt * cp * cop * p,
            bytes_accessed=b * h * (wb * (l + lo)) * 2,
            transcendentals=0),
        interpret=_INTERPRET,
    )(xp, t, bias_l)
    return _unpack(yp, wdt, cout, p, cop)


def _conv_packed_dw(x, g):
    """dW for y = conv3x3(x): packed outer-product accumulation + fold."""
    b, h, wdt, cin = x.shape
    cout = g.shape[-1]
    pln = plan(h, wdt, cin, cout)
    assert pln is not None
    p, cp, cop, l, lo, th, wb, wbp = (pln[k] for k in
                                      ("p", "cp", "cop", "l", "lo", "th",
                                       "wb", "wbp"))
    xp = _pack(x, p, cp, wbp)
    gp = _pack_nohalo(g, p, cop)
    n_i = h // th

    dT = pl.pallas_call(
        functools.partial(_dw_kernel, th=th, wb=wb, n_i=n_i),
        grid=(b, n_i),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, th, wb, lo), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, l, lo), lambda bb, ii: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, l, lo), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wbp, l), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_INTERPRET,
    )(xp, gp)
    return _fold_toeplitz_grad(dT, (3, 3, cin, cout), p, cp, cop)


# ------------------------------------------------------- dispatch + public

def _lax_conv(x, w, bias, relu):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _dispatch_packed(x, w) -> bool:
    pln_ok = plan(x.shape[1], x.shape[2], x.shape[3], w.shape[-1]) is not None
    if _FORCE is not None:
        return _FORCE and pln_ok
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if x.dtype != jnp.bfloat16:
        return False  # the kernel computes in bf16; keep f32 runs exact
    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    pln = plan(h, wdt, cin, cout)
    if pln is None:
        return False
    from mmr_tpu.ops.pallas.dispatch import use_packed

    return use_packed(h, wdt, cin, cout, pln)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3p_bias_act(x, w, bias, relu: bool = False, has_bias: bool = True):
    """3x3 stride-1 SAME conv + bias (+ ReLU), NHWC/HWIO; dispatches to the
    packed-lane Pallas kernel on TPU when the autotuned table (or heuristic)
    says it wins, else ``lax.conv_general_dilated``. ``has_bias=False`` skips
    the dbias reduction in the VJP (``bias`` must then be zeros)."""
    if _dispatch_packed(x, w):
        return _conv_packed(x, w, bias, relu)
    return _lax_conv(x, w, bias, relu)


def _fwd(x, w, bias, relu, has_bias):
    y = conv3x3p_bias_act(x, w, bias, relu, has_bias)
    return y, (x, w, y if relu else None)


def _bwd(relu, has_bias, res, g):
    x, w, y_for_relu = res
    g = g.astype(jnp.float32)
    if y_for_relu is not None:
        g = jnp.where(y_for_relu > 0, g, 0.0)
    gin = g.astype(x.dtype)
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    zero_bias = jnp.zeros((w.shape[2],), jnp.float32)
    if _dispatch_packed(gin, w_t):
        dx = _conv_packed(gin, w_t, zero_bias, False)
        dw = _conv_packed_dw(x, gin)
    else:
        dx = _lax_conv(gin, w_t, zero_bias, False)
        dw = jax.lax.conv_general_dilated(
            x.transpose(3, 1, 2, 0), gin.transpose(1, 2, 0, 3),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).transpose(1, 2, 0, 3)
    dbias = (g.sum(axis=(0, 1, 2)) if has_bias
             else jnp.zeros((w.shape[-1],), jnp.float32))
    return dx.astype(x.dtype), dw.astype(w.dtype), dbias


conv3x3p_bias_act.defvjp(_fwd, _bwd)
