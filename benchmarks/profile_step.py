"""Capture a jax.profiler device trace of the flagship train step.

Produces a TensorBoard-format trace under /tmp/mmr_trace (op-level device
timings) — the decomposition evidence for the round-2 perf attack. Also the
smoke test for the TrainingMonitor trace hook (VERDICT r1 next-step #8).
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

    try:  # reuse the bench's persistent compile cache (tunnel compiles are
        # 8-20 min; the trace should never pay them twice)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    from mmr_tpu.core.mesh import create_mesh, shard_batch
    from mmr_tpu.data.augment import AugmentConfig
    from mmr_tpu.losses import dice_ce_loss
    from mmr_tpu.models import create_model
    from mmr_tpu.models.factory import get_preprocessing
    from mmr_tpu.train.optim import build_optimizer
    from mmr_tpu.train.state import TrainState
    from mmr_tpu.train.steps import make_train_step

    classes, hw, batch = 10, (512, 512), 32
    mesh = create_mesh()
    model, _ = create_model("UnetPlusPlus",
                            encoder_name="tu-mobilenetv3_small_100",
                            classes=classes, packed=True,
                            packed_frontend=True)
    pre = get_preprocessing("tu-mobilenetv3_small_100")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init({"params": jax.random.key(0)},
                               jnp.zeros((1, 128, 128, 3), jnp.float32), train=False)
    optimizer = build_optimizer("adamw", clip_grad_norm=12.0, weight_decay=1e-4)
    state = TrainState.create(jax.device_put(variables), optimizer)
    step = make_train_step(model, optimizer, dice_ce_loss, classes, mesh=mesh,
                           n_accum=1, augment=AugmentConfig(patch_size=hw),
                           preprocess=pre)

    rng = np.random.RandomState(0)
    # compact-transfer contract (match bench.py): u8 images + u8 masks
    imgs = rng.randint(0, 256, (1, batch, *hw, 3)).astype(np.uint8)
    masks = rng.randint(0, classes, (1, batch, *hw)).astype(np.uint8)
    d_imgs, d_masks = shard_batch(mesh, (imgs, masks), axis=1)

    for i in range(2):  # compile + warm
        state, met = step(state, d_imgs, d_masks, jnp.float32(1e-4),
                          jax.random.key(i))
    np.asarray(met["loss"])
    print("warm; tracing...", flush=True)

    jax.profiler.start_trace("/tmp/mmr_trace")
    t0 = time.perf_counter()
    for i in range(3):
        state, met = step(state, d_imgs, d_masks, jnp.float32(1e-4),
                          jax.random.key(10 + i))
    np.asarray(met["loss"])
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"3 steps in {dt:.3f}s -> {dt / 3 * 1e3:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
