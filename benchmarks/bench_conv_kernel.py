"""Autotune the packed conv3x3 kernel vs XLA per conv shape, on the real chip.

Times fwd and fwd+bwd (relu epilogue keeps the forward live under grad) for
every 3x3 s1 conv shape in the flagship model (+ any extras passed on the
command line as H,CIN,COUT triples) and writes the winners into
``mmr_tpu/ops/pallas/conv_table.json`` — the dispatch table consulted by
``conv3x3p_bias_act`` at trace time.

Usage: python benchmarks/bench_conv_kernel.py [--batch 32] [--dry]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPES = [
    (256, 32, 32), (256, 112, 32), (256, 144, 32), (256, 176, 32),
    (128, 40, 64), (128, 208, 64), (128, 272, 64), (128, 64, 64),
    (64, 72, 128), (64, 408, 128), (64, 128, 128),
    (32, 144, 256), (32, 256, 256),
    (512, 32, 16), (512, 16, 16), (512, 16, 10),
]

ITERS = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dry", action="store_true", help="print, don't write")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import mmr_tpu.ops.pallas.conv3x3_packed as K
    from mmr_tpu.ops.pallas.dispatch import shape_key, record

    def timed(fn, *fargs):
        f = jax.jit(fn)
        out = f(*fargs)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        t0 = time.perf_counter()
        out = f(*fargs)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        return (time.perf_counter() - t0) / ITERS

    # the scan carries only the (tiny) weights — carrying the activation
    # array would add ~3 ms/iter of hidden carry traffic on this chip
    def fwd_loop(x, w, b):
        def body(wc, _):
            y = K.conv3x3p_bias_act(x, wc, b, True)
            return wc + jnp.mean(y.astype(jnp.float32)) * 1e-12, ()
        wc, _ = jax.lax.scan(body, w, None, length=ITERS)
        return jnp.mean(wc)

    def fwdbwd_loop(x, w, b):
        def loss(xx, ww, bb):
            return jnp.sum(K.conv3x3p_bias_act(xx, ww, bb, True)
                           .astype(jnp.float32) * 1e-6)

        def body(wc, _):
            dx, dw = jax.grad(loss, argnums=(0, 1))(x, wc, b)
            return wc + dw * 1e-12 + jnp.mean(dx.astype(jnp.float32)) * 1e-12, ()
        wc, _ = jax.lax.scan(body, w, None, length=ITERS)
        return jnp.mean(wc)

    results = {}
    key = jax.random.key(0)
    for (h, cin, cout) in SHAPES:
        x = jax.random.normal(key, (args.batch, h, h, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05
        b = jnp.zeros((cout,), jnp.float32)
        entry = {"batch": args.batch}
        for mode, force in (("xla", False), ("packed", True)):
            K._FORCE = force
            if force and K.plan(h, h, cin, cout) is None:
                entry[mode] = None
                continue
            try:
                entry[f"{mode}_fwd_ms"] = round(timed(fwd_loop, x, w, b) * 1e3, 3)
                entry[f"{mode}_fwdbwd_ms"] = round(timed(fwdbwd_loop, x, w, b) * 1e3, 3)
            except Exception as e:  # noqa: BLE001 — record and move on
                entry[f"{mode}_error"] = str(e)[:200]
        K._FORCE = None
        pk, xk = entry.get("packed_fwdbwd_ms"), entry.get("xla_fwdbwd_ms")
        entry["packed_wins"] = bool(pk and xk and pk < xk)
        results[shape_key(h, h, cin, cout)] = entry
        print(json.dumps({shape_key(h, h, cin, cout): entry}), flush=True)

    if not args.dry:
        record(results)
        print("table written", flush=True)


if __name__ == "__main__":
    main()
