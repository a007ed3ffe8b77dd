"""Capture a jax.profiler device trace of the full-HD sliding-window
inference step (the reference's real-time surface,
``Main_MMR_SegModel.py:1274-1317``: fp16 + channels_last, roi 512×640,
sw_batch 24, overlap 0.5) at the reference-default 6-frame temporal batch.

Produces /tmp/mmr_infer_trace for ``parse_trace.py`` — the decomposition
evidence for the inference ledger section in docs/PERF.md (VERDICT r4
'do this' #2: the infer step had throughput tables but no trace
decomposition anywhere).

Usage: python benchmarks/profile_infer.py [n_frames=6] [--fuse_blend]
       [--packed_blend]
"""

from __future__ import annotations

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

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    fuse_blend = "--fuse_blend" in sys.argv
    packed_blend = "--packed_blend" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(argv[0]) if argv else 6
    model, _ = create_model("UnetPlusPlus",
                            encoder_name="tu-mobilenetv3_small_100",
                            classes=10, packed=True, packed_frontend=True)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init({"params": jax.random.key(0)},
                               jnp.zeros((1, 128, 128, 3), jnp.float32),
                               train=False)
    variables = jax.device_put(variables)
    pre = get_preprocessing("tu-mobilenetv3_small_100")
    sw = make_sliding_window_fn(model, variables, (512, 640), 10,
                                sw_batch_size=24, overlap=0.5,
                                preprocess=pre,
                                compute_dtype=jnp.bfloat16,
                                fuse_blend=fuse_blend,
                                packed_blend=packed_blend)

    frames = jax.device_put(
        np.random.rand(n_frames, 1080, 1920, 3).astype(np.float32))
    out = sw(frames)  # compile + warm
    np.asarray(out[0, 0, 0, 0])  # hard sync (block_until_ready is a no-op
    # over the axon tunnel)
    print("warm; tracing...", flush=True)

    jax.profiler.start_trace("/tmp/mmr_infer_trace")
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = sw(frames)
    np.asarray(out[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"{n} calls x {n_frames} frames in {dt:.3f}s -> "
          f"{n * n_frames / dt:.2f} fps", flush=True)


if __name__ == "__main__":
    main()
