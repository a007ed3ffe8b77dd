"""Packed smp-Unet probe on the real chip: fwd+bwd step time at 512x512 b32,
packed vs standard (the VERDICT r2 #7 'measured probe number')."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from mmr_tpu.models.decoders import UnetDecoderModel
from mmr_tpu.losses import dice_ce_loss
from mmr_tpu.ops.pallas.packed_chain import assemble_dice_ce

B, HW = 32, (512, 512)
x = jax.device_put(np.random.rand(B, *HW, 3).astype(np.float32))
masks = jax.device_put(np.random.randint(0, 10, (B, *HW)).astype(np.int32))

def timeit(f, *a, n=5):
    v = f(*a); np.asarray(v)
    t0 = time.perf_counter()
    for _ in range(n): v = f(*a)
    np.asarray(v)
    return (time.perf_counter() - t0) / n

import itertools
for packed, min_hw in ((True, 128*128), (True, 256*256)):
    model = UnetDecoderModel(num_classes=10,
                             encoder_name="tu-mobilenetv3_small_100",
                             packed=packed, packed_min_hw=min_hw)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init({"params": jax.random.key(0)},
                               jnp.zeros((1, 128, 256, 3), jnp.float32),
                               train=False)
    variables = jax.device_put(variables)

    def loss_fn(params, bs, x, masks):
        kw = {"labels": masks} if packed else {}
        out, _ = model.apply({"params": params, "batch_stats": bs}, x,
                             train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(1)}, **kw)
        if isinstance(out, dict):
            loss, _ = assemble_dice_ce(out["spec"], out["stats"],
                                       out["conf"], out["n_pixels"])
            return loss
        return dice_ce_loss(out, masks)

    @jax.jit
    def step(params, bs, x, masks):
        l, g = jax.value_and_grad(loss_fn)(params, bs, x, masks)
        return l + sum(jnp.sum(jnp.abs(v)) for v in
                       jax.tree_util.tree_leaves(g)) * 0.0

    dt = timeit(step, variables["params"], variables["batch_stats"], x, masks)
    print(f"packed={packed} min_hw={min_hw}: fwd+bwd {dt*1e3:.1f} ms -> {B/dt:.1f} frames/s",
          flush=True)
