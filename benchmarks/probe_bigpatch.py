"""Big-patch regime probe: the flagship engine at the reference's
best-result geometry (PKG-INFO Examples 2/3 train at patch 864×1280 —
SURVEY.md §6 / BASELINE.md; VERDICT r4 'do this' #3).

At 864×1280 the decoder rows land at p=4/p=2 packing factors
(tests/test_geometry_864.py proves correctness CPU-side); this measures
whether the packed lowering actually WINS there on the real chip, and at
what margin, so the engine's geometry gate picks the fast path:

  python benchmarks/probe_bigpatch.py train          # packed vs XLA step
  python benchmarks/probe_bigpatch.py infer          # sw roi 864×1280

Results + the keep/gate verdict live in docs/PERF.md ("big-patch regime").
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HW = (864, 1280)
BATCH = 8  # ~same pixel budget as the 512² b32 flagship bench (8.8M px)


def _setup(packed: bool, packed_frontend: bool):
    import jax
    import jax.numpy as jnp

    from mmr_tpu.core.mesh import create_mesh
    from mmr_tpu.models import create_model
    from mmr_tpu.models.factory import get_preprocessing

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    mesh = create_mesh()
    model, _ = create_model("UnetPlusPlus",
                            encoder_name="tu-mobilenetv3_small_100",
                            classes=10, packed=packed,
                            packed_frontend=packed_frontend)
    pre = get_preprocessing("tu-mobilenetv3_small_100")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init({"params": jax.random.key(0)},
                               jnp.zeros((1, 128, 128, 3), jnp.float32),
                               train=False)
    return mesh, model, pre, variables


def train_probe(packed: bool, packed_frontend: bool, n_steps=20):
    import jax
    import jax.numpy as jnp

    from mmr_tpu.core.mesh import shard_batch
    from mmr_tpu.data.augment import AugmentConfig
    from mmr_tpu.losses import dice_ce_loss
    from mmr_tpu.train.optim import build_optimizer
    from mmr_tpu.train.state import TrainState
    from mmr_tpu.train.steps import make_train_step

    mesh, model, pre, variables = _setup(packed, packed_frontend)
    optimizer = build_optimizer("adamw", clip_grad_norm=12.0,
                                weight_decay=1e-4)
    state = TrainState.create(jax.device_put(variables), optimizer)
    step = make_train_step(model, optimizer, dice_ce_loss, 10, mesh=mesh,
                           n_accum=1, augment=AugmentConfig(patch_size=HW),
                           preprocess=pre)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (1, BATCH, *HW, 3)).astype(np.uint8)
    masks = rng.randint(0, 10, (1, BATCH, *HW)).astype(np.uint8)
    d_imgs, d_masks = shard_batch(mesh, (imgs, masks), axis=1)
    for i in range(3):
        state, met = step(state, d_imgs, d_masks, jnp.float32(1e-4),
                          jax.random.key(100 + i))
    np.asarray(met["loss"])
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, met = step(state, d_imgs, d_masks, jnp.float32(1e-4),
                          jax.random.key(i))
    np.asarray(met["loss"])
    dt = time.perf_counter() - t0
    fps = n_steps * BATCH / dt
    print(json.dumps({
        "metric": "train_frames_per_sec@864x1280",
        "value": round(fps, 2), "unit": "frames/s/chip",
        "batch": BATCH, "packed": packed,
        "packed_frontend": packed_frontend,
        "ms_per_step": round(1e3 * dt / n_steps, 1),
    }), flush=True)
    return fps


def infer_probe(n_frames=6):
    import jax
    import jax.numpy as jnp

    from mmr_tpu.infer.sliding_window import make_sliding_window_fn

    mesh, model, pre, variables = _setup(True, True)
    variables = jax.device_put(variables)
    sw = make_sliding_window_fn(model, variables, HW, 10, sw_batch_size=8,
                                overlap=0.5, preprocess=pre,
                                compute_dtype=jnp.bfloat16)
    frames = jax.device_put(
        np.random.rand(n_frames, 1080, 1920, 3).astype(np.float32))
    out = sw(frames)
    np.asarray(out[0, 0, 0, 0])
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = sw(frames)
    np.asarray(out[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "infer_fullhd_frames_per_sec@roi864x1280",
        "value": round(n * n_frames / dt, 2), "unit": "frames/s/chip",
        "n_frames": n_frames, "sw_batch_size": 8,
    }), flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "train"
    if what == "train":
        train_probe(packed=True, packed_frontend=True)
        train_probe(packed=False, packed_frontend=False)
    elif what == "train_packed":
        train_probe(packed=True, packed_frontend=True)
    elif what == "train_xla":
        train_probe(packed=False, packed_frontend=False)
    else:
        infer_probe()
