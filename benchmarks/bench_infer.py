"""Secondary benchmark: full-HD (1080×1920) sliding-window inference
throughput on the flagship model — the reference's per-video-FPS surface
(``Main_MMR_SegModel.py:1274-1290``: fp16 + channels_last, roi 512×640,
sw_batch 24, overlap 0.5). Not run by the driver (which runs ``bench.py``);
tracked manually across rounds.

Usage: python benchmarks/bench_infer.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from mmr_tpu.infer.sliding_window import make_sliding_window_fn
    from mmr_tpu.models import create_model
    from mmr_tpu.models.factory import get_preprocessing

    model, _ = create_model("UnetPlusPlus",
                            encoder_name="tu-mobilenetv3_small_100", classes=10,
                            packed=True, packed_frontend=True)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init({"params": jax.random.key(0)},
                               jnp.zeros((1, 128, 128, 3), jnp.float32),
                               train=False)
    variables = jax.device_put(variables)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    pre = get_preprocessing("tu-mobilenetv3_small_100")
    # bf16 window surface (evaluator default; reference runs fp16 autocast
    # end-to-end on its real-time path). --sweep tries sw_batch sizes.
    sw_batch = int(sys.argv[sys.argv.index("--sw_batch") + 1]) \
        if "--sw_batch" in sys.argv else 24
    # packed-canvas blend is the evaluator default for the packed flagship
    # (measured 35.69/36.63 vs 34.93/35.82 fused-NHWC, 34.34/35.12 chunked)
    fuse_blend = "--fuse_blend" in sys.argv
    # (no flags) = packed; --fuse_blend = fused NHWC; --no_packed_blend
    # alone = the chunked sw_batch loop
    packed_blend = "--no_packed_blend" not in sys.argv \
        and "--fuse_blend" not in sys.argv
    sw = make_sliding_window_fn(model, variables, (512, 640), 10,
                                sw_batch_size=sw_batch, overlap=0.5,
                                preprocess=pre,
                                compute_dtype=jnp.bfloat16,
                                fuse_blend=fuse_blend,
                                packed_blend=packed_blend)

    # Two temporal-batch shapes (VERDICT r3 'do this' #4 — report both):
    # - 6 frames: the reference's DEFAULT ``infer_batch_size``
    #   (``common_utils.py:208``, mirrored at ``config/config.py``) —
    #   120 windows = 5 exact sw_batch-24 chunks, the honest default-config
    #   number.
    # - 12 frames: the steady-state per-video shape (the reference reports
    #   per-VIDEO fps over hundreds of frames, Main_MMR_SegModel.py:1274-1290)
    #   — 240 windows = 10 exact chunks.
    # Both are exactly chunkable, so neither pays tail-padding waste (a
    # 4-frame batch pads 80→96 window slots and measured 25.13 fps in r3).
    def measure(n_frames: int) -> float:
        frames = jax.device_put(
            np.random.rand(n_frames, 1080, 1920, 3).astype(np.float32))
        out = sw(frames)
        np.asarray(out[0, 0, 0, 0])  # hard sync (block_until_ready is a
        # no-op on the axon tunnel)
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            out = sw(frames)
        np.asarray(out[0, 0, 0, 0])
        dt = time.perf_counter() - t0
        return n * n_frames / dt

    fps6 = measure(6)
    fps12 = measure(12)
    print(json.dumps({
        "metric": "infer_fullhd_frames_per_sec@1080x1920_sw512x640_ov0.5",
        "value": round(fps12, 2),
        "unit": "frames/s/chip",
        "default_6frame": round(fps6, 2),
        "steadystate_12frame": round(fps12, 2),
        "sw_batch_size": sw_batch,
        "compute_dtype": "bfloat16",
        "fuse_blend": fuse_blend,
        "packed_blend": packed_blend,
    }))


if __name__ == "__main__":
    main()
