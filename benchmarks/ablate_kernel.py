"""Ablate the packed conv kernel to find the bottleneck: DMA, dot_generals,
or the sublane-offset tap slices."""
import sys
sys.path.insert(0, "/root/repo")
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import mmr_tpu.ops.pallas.conv3x3_packed as K

B, H, W, C = 32, 512, 512, 16
pln = K.plan(H, W, C, C)
p, cp, cop, l, lo, th, wb, wbp = (pln[k] for k in ("p","cp","cop","l","lo","th","wb","wbp"))
import os
NBUF = int(os.environ.get("NBUF", "2"))
th = int(os.environ.get("TH", str(th)))
print("plan:", pln, "NBUF", NBUF, "th", th)
n_i = H // th

def make_kernel(mode):
    def kern(x_hbm, t_ref, o_ref, xt, sem):
        b, i = pl.program_id(0), pl.program_id(1)
        k = b * n_i + i
        def dma(slot, kk):
            bb, ii = kk // n_i, kk % n_i
            return pltpu.make_async_copy(x_hbm.at[bb, pl.ds(ii*th, th+2)], xt.at[slot], sem.at[slot])
        total = pl.num_programs(0) * n_i
        @pl.when(k == 0)
        def _():
            for j in range(NBUF - 1):
                dma(j % NBUF, j).start()
        @pl.when(k + NBUF - 1 < total)
        def _():
            dma((k + NBUF - 1) % NBUF, k + NBUF - 1).start()
        dma(k % NBUF, k).wait()
        x = xt[k % NBUF]
        acc = jnp.zeros((th, wb, lo), jnp.float32)
        if mode == "full":
            for dy in range(3):
                for dwb in range(3):
                    acc += jax.lax.dot_general(x[dy:dy+th, dwb:dwb+wb, :], t_ref[dy,dwb],
                        (((2,),(0,)),((),())), preferred_element_type=jnp.float32)
        elif mode == "noshift":  # 9 matmuls, all from offset 0 (wrong numerics)
            for dy in range(3):
                for dwb in range(3):
                    acc += jax.lax.dot_general(x[dy:dy+th, 0:wb, :], t_ref[dy,dwb],
                        (((2,),(0,)),((),())), preferred_element_type=jnp.float32)
        elif mode == "hoist":  # 3 shifted copies reused across dy
            xs = [x[0:th+2, dwb:dwb+wb, :] for dwb in range(3)]
            for dy in range(3):
                for dwb in range(3):
                    acc += jax.lax.dot_general(xs[dwb][dy:dy+th], t_ref[dy,dwb],
                        (((2,),(0,)),((),())), preferred_element_type=jnp.float32)
        elif mode == "3mm":   # dy only (3 matmuls)
            for dy in range(3):
                acc += jax.lax.dot_general(x[dy:dy+th, 0:wb, :], t_ref[dy,0],
                    (((2,),(0,)),((),())), preferred_element_type=jnp.float32)
        elif mode == "dma":   # no matmul at all
            acc += x[0:th, 0:wb, :].astype(jnp.float32)[:, :, :lo]
        o_ref[0] = acc.astype(o_ref.dtype)
    return kern

def run(mode):
    x = jax.random.normal(jax.random.key(0), (B,H,W,C), jnp.bfloat16)
    w3 = jax.random.normal(jax.random.key(1), (3,3,C,C), jnp.float32)*0.1
    xp = K._pack(x, p, cp, wbp)
    t = K._toeplitz(w3, p, cp, cop)
    def call(xp, t):
        return pl.pallas_call(make_kernel(mode), grid=(B, n_i),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((3,3,l,lo), lambda bb,ii:(0,0,0,0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1,th,wb,lo), lambda bb,ii:(bb,ii,0,0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B,H,wb,lo), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((NBUF,th+2,wbp,l), jnp.bfloat16), pltpu.SemaphoreType.DMA((NBUF,))],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(xp, t)
    def loop(xp, t):
        # carry the (tiny) weights, close over the big input: the timing loop
        # itself must not move the activation array
        def body(tc, _):
            y = call(xp, tc)
            return tc + (jnp.mean(y.astype(jnp.float32))*1e-12).astype(tc.dtype), ()
        tc,_ = jax.lax.scan(body, t, None, length=10)
        return jnp.mean(tc)
    f = jax.jit(loop)
    v = f(xp, t); np.asarray(v)
    t0 = time.perf_counter(); v = f(xp, t); np.asarray(v)
    print(f"{mode:8s}: {(time.perf_counter()-t0)/10*1e3:6.2f} ms")

for mode in ("dma", "full"):
    run(mode)
