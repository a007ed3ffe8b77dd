"""Trial the packed UNet++ decoder on the real chip: fwd + train-step timing
at 512x512 b32 vs the standard path."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

from mmr_tpu.models.decoders import UnetPlusPlusModel
from mmr_tpu.models.factory import get_preprocessing
from mmr_tpu.losses import dice_ce_loss

B, HW = 32, (512, 512)

def build(packed):
    model = UnetPlusPlusModel(num_classes=10, packed=packed)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init({"params": jax.random.key(0)},
                               jnp.zeros((1, 128, 256, 3), jnp.float32), train=False)
    return model, jax.device_put(variables)

def timeit(f, *a, n=5):
    v = f(*a); np.asarray(v)
    t0 = time.perf_counter(); v = f(*a); np.asarray(v)
    return (time.perf_counter() - t0) / n

x = jax.device_put(np.random.rand(B, *HW, 3).astype(np.float32))
masks = jax.device_put(np.random.randint(0, 10, (B, *HW)).astype(np.int32))

# encoder-only baseline
model0, vars0 = build(False)
from mmr_tpu.models.encoders import get_encoder
spec = get_encoder("tu-mobilenetv3_small_100")
enc = spec.build(jnp.bfloat16, "encoder")
enc_vars = {"params": vars0["params"]["encoder"],
            "batch_stats": vars0["batch_stats"]["encoder"]}
def enc_fwd(v, x):
    def body(c, _):
        fs = enc.apply(v, x * c, train=False)
        return c + (jnp.mean(fs[-1].astype(jnp.float32)) * 1e-12).astype(c.dtype), ()
    c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=5)
    return c
print(f"encoder-only fwd: {timeit(jax.jit(enc_fwd), enc_vars, x)*1e3:.1f} ms", flush=True)

for packed in (True, False):
    model, variables = build(packed)
    def fwd(v, x):
        def body(c, _):
            y = model.apply(v, x * c, train=False)
            return c + (jnp.mean(y) * 1e-12).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=5)
        return c
    t = timeit(jax.jit(fwd), variables, x)
    print(f"packed={packed} fwd: {t*1e3:.1f} ms", flush=True)

    def step(v, x, masks):
        def loss_fn(params):
            out, new_stats = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(0)})
            return dice_ce_loss(out, masks), new_stats
        def body(c, _):
            (l, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(c)
            return jax.tree_util.tree_map(lambda p, g: p - 1e-12 * g.astype(p.dtype), c, grads), l
        c, ls = jax.lax.scan(body, v["params"], None, length=5)
        return ls[-1]
    t = timeit(jax.jit(step), variables, x, masks)
    print(f"packed={packed} train fwd+bwd: {t*1e3:.1f} ms", flush=True)
