"""Per-shape conv cost probe for the flagship UNet++/MobileNetV3 step.

Round-1 analysis (CLAUDE.md): the 512x512 b32 train step is memory-bound at
~257 GB/step because XLA lowers small-channel 3x3 convs through materialized
im2col. This probe times every 3x3 stride-1 conv shape in the flagship model
(decoder grid + final blocks + head), fwd and fwd+bwd, so kernel work targets
the shapes that actually dominate. Also times a channel-padded variant
(zero-pad Cin/Cout up to a multiple of 64) to test whether XLA switches to a
cheaper lowering at larger channel counts.

Timing methodology (CLAUDE.md backend facts): ops are iterated *inside* one
jit via lax.scan (per-call dispatch over the axon tunnel costs ~40 ms, which
would swamp 1-20 ms convs); device->host fetch of a scalar is the only
reliable sync. A scalar mix-back (x + mean(y)*1e-12) keeps the loop honest
without changing shapes; its reduction cost (~one extra read of y) is noted.

Writes JSON lines to stdout; run as
  python benchmarks/probe_convs.py | tee /tmp/probe_convs.out
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 32
ITERS = 10

# (H, Cin, Cout) for every 3x3 s1 conv in UnetPlusPlusModel @512^2 input,
# tu-mobilenetv3_small_100 encoder (rows 256/128/64/32 px, row_ch 32/64/128/256).
SHAPES = [
    # row 0 @256^2
    (256, 32, 32), (256, 112, 32), (256, 144, 32), (256, 176, 32),
    # row 1 @128^2
    (128, 40, 64), (128, 208, 64), (128, 272, 64), (128, 64, 64),
    # row 2 @64^2
    (64, 72, 128), (64, 408, 128), (64, 128, 128),
    # row 3 @32^2
    (32, 144, 256), (32, 256, 256),
    # final block + head @512^2
    (512, 32, 16), (512, 16, 16), (512, 16, 10),
]


def conv(x, w):
    # no preferred_element_type: mirrors flax nn.Conv(dtype=bf16) in the model
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timed(fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]  # compile+sync
    t0 = time.perf_counter()
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / ITERS


def fwd_loop(x, w):
    def body(c, _):
        y = conv(c, w)
        return c + jnp.mean(y).astype(c.dtype) * 1e-12, ()
    c, _ = jax.lax.scan(body, x, None, length=ITERS)
    return jnp.mean(c)


def fwdbwd_loop(x, w):
    def loss(xx, ww):
        return jnp.sum(conv(xx, ww).astype(jnp.float32) * 1e-6)

    def body(carry, _):
        xx, ww = carry
        (dx, dw) = jax.grad(loss, argnums=(0, 1))(xx, ww)
        return (xx + dx.astype(xx.dtype) * 1e-12,
                ww + dw.astype(ww.dtype) * 1e-12), ()
    (xx, ww), _ = jax.lax.scan(body, (x, w), None, length=ITERS)
    return jnp.mean(xx)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    key = jax.random.key(0)
    for (h, cin, cout) in SHAPES:
        x = jax.random.normal(key, (B, h, h, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        rec = {"h": h, "cin": cin, "cout": cout}
        rec["fwd_ms"] = round(timed(fwd_loop, x, w) * 1e3, 3)
        rec["fwdbwd_ms"] = round(timed(fwdbwd_loop, x, w) * 1e3, 3)
        # ideal-traffic ms at 819 GB/s: read x + write y once (bf16), fwd
        ideal_gb = B * h * h * (cin + cout) * 2 / 1e9
        rec["fwd_ideal_ms"] = round(ideal_gb / 819 * 1e3, 3)
        rec["flops_g"] = round(2 * 9 * B * h * h * cin * cout / 1e9, 1)
        print(json.dumps(rec), flush=True)

        # channel-padded variant for the wide/odd ones
        pin = -(-cin // 64) * 64
        pout = -(-cout // 64) * 64
        if (pin, pout) != (cin, cout):
            xp = jnp.pad(x, [(0, 0)] * 3 + [(0, pin - cin)])
            wp = jnp.pad(w, [(0, 0), (0, 0), (0, pin - cin), (0, pout - cout)])
            rec2 = {"h": h, "cin": pin, "cout": pout, "variant": "pad64"}
            rec2["fwd_ms"] = round(timed(fwd_loop, xp, wp) * 1e3, 3)
            rec2["fwdbwd_ms"] = round(timed(fwdbwd_loop, xp, wp) * 1e3, 3)
            print(json.dumps(rec2), flush=True)


if __name__ == "__main__":
    main()
