"""Training engine tests: optimizer parity vs torch, schedules, sharded train
step on the emulated 8-device mesh, checkpoint last/best policy."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from flax import linen as nn

from mmr_tpu.train.optim import build_optimizer
from mmr_tpu.train.schedules import step_lr, polynomial_lr, build_lr_schedule
from mmr_tpu.train.state import TrainState
from mmr_tpu.train.steps import make_train_step, make_eval_step
from mmr_tpu.train.checkpoint import CheckpointManager, export_torch_checkpoint
from mmr_tpu.core.mesh import create_mesh, shard_batch
from mmr_tpu.losses import dice_ce_loss


class TinySeg(nn.Module):
    """Small conv net for fast CPU compiles."""

    classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)])(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        return nn.Conv(self.classes, (1, 1))(x).astype(jnp.float32)


# ----------------------------------------------------------- optimizer parity

@pytest.mark.parametrize("name,kw,torch_cls,torch_kw", [
    ("adam", {"weight_decay": 1e-2}, torch.optim.Adam, {"weight_decay": 1e-2}),
    ("adamw", {"weight_decay": 1e-2}, torch.optim.AdamW, {"weight_decay": 1e-2}),
    ("sgd", {"momentum": 0.9, "weight_decay": 1e-3}, torch.optim.SGD,
     {"momentum": 0.9, "weight_decay": 1e-3}),
])
def test_optimizer_matches_torch(rng, name, kw, torch_cls, torch_kw):
    w0 = rng.randn(4, 5).astype(np.float32)
    lr = 0.01

    # torch side: loss = sum(w * g_fixed) so grad == g_fixed each step
    g = rng.randn(4, 5).astype(np.float32)
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch_cls([wt], lr=lr, **torch_kw)
    for _ in range(5):
        opt_t.zero_grad()
        (wt * torch.from_numpy(g)).sum().backward()
        opt_t.step()

    opt = build_optimizer(name, **kw)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for _ in range(5):
        params, state = opt.apply_updates(params, state, {"w": jnp.asarray(g)}, lr)
    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(),
                               atol=1e-5)


def test_clip_grad_norm_matches_torch(rng):
    w0 = rng.randn(6, 6).astype(np.float32)
    g = (rng.randn(6, 6) * 100).astype(np.float32)
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch.optim.SGD([wt], lr=0.1)
    wt.grad = torch.from_numpy(g.copy())
    torch.nn.utils.clip_grad_norm_([wt], max_norm=12.0)
    opt_t.step()

    opt = build_optimizer("sgd", clip_grad_norm=12.0, momentum=0.0)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    params, _ = opt.apply_updates(params, state, {"w": jnp.asarray(g)}, 0.1)
    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), atol=1e-6)


def test_fused_adamw_matches_optax_chain(rng):
    """FusedAdamW (one flat-buffer reduction + one fused update) must be
    numerically equivalent to the per-leaf optax chain clip→adam→decay it
    replaces, including clip(12) and differential LR, over several steps on
    a mixed-shape tree (the dispatch-fusion is a pure perf transform)."""
    def tree(f):
        return {"encoder": {"w": f((3, 4, 5)), "b": f((5,))},
                "decoder": {"k": f((2, 7)), "g": f((1,))}}

    params = tree(lambda s: jnp.asarray(rng.randn(*s).astype(np.float32)))
    fused = build_optimizer("adamw", clip_grad_norm=12.0, weight_decay=1e-2,
                            differential_lr=True)
    ref = build_optimizer("adamw", clip_grad_norm=12.0, weight_decay=1e-2,
                          differential_lr=True, fused=False)
    from mmr_tpu.train.optim import FusedAdamW
    assert isinstance(fused, FusedAdamW)
    pf, sf = params, fused.init(params)
    pr, sr = params, ref.init(params)
    for i in range(4):
        grads = tree(lambda s: jnp.asarray(
            (rng.randn(*s) * (50 if i == 0 else 1)).astype(np.float32)))
        pf, sf = fused.apply_updates(pf, sf, grads, 0.01)
        pr, sr = ref.apply_updates(pr, sr, grads, 0.01)
    flat_f = jax.tree_util.tree_leaves(pf)
    flat_r = jax.tree_util.tree_leaves(pr)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_differential_lr_scales_non_encoder(rng):
    opt = build_optimizer("sgd", momentum=0.0, differential_lr=True)
    params = {"encoder": {"w": jnp.ones((2,))}, "head": {"w": jnp.ones((2,))}}
    grads = {"encoder": {"w": jnp.ones((2,))}, "head": {"w": jnp.ones((2,))}}
    state = opt.init(params)
    new, _ = opt.apply_updates(params, state, grads, 0.1)
    np.testing.assert_allclose(np.asarray(new["encoder"]["w"]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new["head"]["w"]), 0.99, rtol=1e-6)


# ----------------------------------------------------------------- schedules

def test_step_lr_matches_reference_formula():
    # step_size = epochs // (lr_steps+1) = 20 // 3 = 6 (ModelTraining.py:386-391)
    sched = step_lr(1e-3, epochs=20, lr_steps=2, gamma=0.1)
    assert sched(0) == pytest.approx(1e-3)
    assert sched(5) == pytest.approx(1e-3)
    assert sched(6) == pytest.approx(1e-4)
    assert sched(12) == pytest.approx(1e-5)


def test_polynomial_lr_matches_torch():
    sched = polynomial_lr(1e-4, total_iters=200, power=0.9)
    for e in [0, 50, 199, 200, 300]:
        expect = 1e-4 * (1 - min(e, 200) / 200) ** 0.9
        assert sched(e) == pytest.approx(expect)


def test_build_lr_schedule_from_config():
    s = build_lr_schedule({"name": "PolynomialLR", "total_iters": 10, "power": 0.9},
                          1e-4, 10)
    assert s(0) == pytest.approx(1e-4)
    with pytest.raises(ValueError):
        build_lr_schedule({"name": "Mystery"}, 1e-4, 10)


# ---------------------------------------------------------------- train step

def test_sharded_train_step_decreases_loss(rng):
    mesh = create_mesh()
    assert mesh.devices.size == 8  # 8 emulated devices (conftest XLA_FLAGS)
    model = TinySeg()
    x = jnp.zeros((8, 16, 16, 3), jnp.float32)
    vs = model.init(jax.random.key(0), x, train=False)
    opt = build_optimizer("adam")
    state = TrainState.create(vs, opt)
    step = make_train_step(model, opt, dice_ce_loss, 3, mesh=mesh, n_accum=2)
    ev = make_eval_step(model, dice_ce_loss, 3, mesh=mesh)

    masks_np = rng.randint(0, 3, (2, 8, 16, 16))
    imgs_np = (np.eye(3)[masks_np] * 0.8 + 0.1).astype(np.float32)
    imgs = shard_batch(mesh, imgs_np, axis=1)   # (n_accum, B, ...) → B sharded
    masks = shard_batch(mesh, masks_np, axis=1)
    losses = []
    for i in range(20):
        state, met = step(state, imgs, masks, jnp.float32(1e-2), jax.random.key(i))
        losses.append(float(met["loss"]))
    assert losses[-1] < losses[0] * 0.7
    emet = ev(state, imgs[0], masks[0])
    assert float(emet["iou"]) > 0.3
    assert emet["tp"].shape == (3,)
    assert int(state.step) == 20


# --------------------------------------------------------------- checkpoints

def test_checkpoint_last_best_policy(tmp_path, rng):
    model = TinySeg()
    vs = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
    opt = build_optimizer("adam")
    state = TrainState.create(vs, opt)
    cm = CheckpointManager(tmp_path)
    assert cm.save(state, epoch=1, validation_loss=1.0) is True   # first → best
    assert cm.save(state, epoch=2, validation_loss=2.0) is False  # worse
    assert cm.save(state, epoch=3, validation_loss=0.5) is True   # better
    restored, meta = cm.load(state, "last_model")
    assert meta["epoch"] == 3
    restored_b, meta_b = cm.load(state, "best_model")
    assert meta_b["validation_loss"] == 0.5
    chex_tree = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params)
    assert all(jax.tree_util.tree_leaves(chex_tree))


def test_checkpoint_opt_format_drift(tmp_path):
    """Resuming a checkpoint whose optimizer-state format differs from the
    current optimizer (e.g. a per-leaf optax AdamW run restored into the
    flat-buffer FusedAdamW template) must restore weights + step and reset
    the moments instead of raising — the reference's strict=False torch-load
    tolerance (``ModelTraining.py:308-337``)."""
    model = TinySeg()
    vs = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
    old = TrainState.create(
        vs, build_optimizer("adamw", fused=False)).replace(
            step=jnp.asarray(7))
    cm = CheckpointManager(tmp_path)
    assert cm.save(old, epoch=7, validation_loss=1.0)
    new_opt = build_optimizer("adamw")  # fused: different opt_state tree
    template = TrainState.create(vs, new_opt)
    restored, meta = cm.load(template, "last_model")
    assert meta["epoch"] == 7
    assert int(restored.step) == 7
    same = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        old.params, restored.params)
    assert all(jax.tree_util.tree_leaves(same))
    assert set(restored.opt_state.keys()) == {"mu", "nu", "count"}


def test_best_f1_policy(tmp_path):
    model = TinySeg()
    vs = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
    opt = build_optimizer("adam")
    state = TrainState.create(vs, opt)
    cm = CheckpointManager(tmp_path)
    assert cm.save_best_by_f1(state, 1, 0.3) is True
    assert cm.save_best_by_f1(state, 2, 0.2) is False
    assert cm.save_best_by_f1(state, 3, 0.4) is True


def test_torch_export_readable(tmp_path):
    model = TinySeg()
    vs = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
    opt = build_optimizer("adam")
    state = TrainState.create(vs, opt)
    out = tmp_path / "last_model.pth"
    export_torch_checkpoint(out, state, epoch=4, validation_loss=0.7)
    ckpt = torch.load(out, weights_only=True)
    assert ckpt["epoch"] == 4 and ckpt["validation_loss"] == 0.7
    # conv kernels exported in torch OIHW layout
    k = ckpt["network_state_dict"]["Conv_0.kernel"]
    assert k.shape == (8, 3, 3, 3)


def test_torch_checkpoint_roundtrip(tmp_path, rng):
    """Our .pth export loads back bit-exactly (torch-interchange format)."""
    from mmr_tpu.train.checkpoint import import_torch_checkpoint

    model = TinySeg()
    vs = model.init(jax.random.key(3), jnp.zeros((1, 8, 8, 3)), train=False)
    opt = build_optimizer("adam")
    state = TrainState.create(vs, opt)
    out = tmp_path / "model.pth"
    export_torch_checkpoint(out, state, epoch=7, validation_loss=0.42)

    template = TrainState.create(
        model.init(jax.random.key(9), jnp.zeros((1, 8, 8, 3)), train=False), opt)
    restored, meta = import_torch_checkpoint(out, template)
    assert meta == {"epoch": 7, "validation_loss": 0.42}
    same = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.params, restored.params)
    assert all(jax.tree_util.tree_leaves(same))
    x = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(model.apply({"params": state.params,
                                "batch_stats": state.batch_stats}, x)),
        np.asarray(model.apply({"params": restored.params,
                                "batch_stats": restored.batch_stats}, x)),
        atol=0)


def test_weights_only_load_across_optimizers(tmp_path):
    """Eval-side loads must not depend on the training optimizer's opt-state
    structure (the bug class found while driving eval_path_a)."""
    model = TinySeg()
    vs = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
    train_opt = build_optimizer("adamw", clip_grad_norm=12.0, weight_decay=1e-4)
    state = TrainState.create(vs, train_opt)
    cm = CheckpointManager(tmp_path)
    cm.save(state, epoch=1, validation_loss=0.5)

    eval_opt = build_optimizer("adam")  # different opt-state pytree
    template = TrainState.create(
        model.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)), train=False), eval_opt)
    restored, meta = cm.load(template, "best_model", weights_only=True)
    assert meta["epoch"] == 1
    same = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.params, restored.params)
    assert all(jax.tree_util.tree_leaves(same))


def test_load_checkpoint_path_variants(tmp_path):
    """Path-A ``--resume <path>`` (ModelTraining.py:308-337): the flag names a
    checkpoint — .pth file, orbax dir, or another run's directory — and loads
    tolerantly (missing entries keep template values)."""
    from mmr_tpu.train.checkpoint import load_checkpoint_path

    model = TinySeg()
    vs = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
    opt = build_optimizer("adam")
    state = TrainState.create(vs, opt)
    run_dir = tmp_path / "runA"
    cm = CheckpointManager(run_dir / "checkpoints")
    cm.save_best_by_f1(state, epoch=5, mean_f1=0.8)
    pth = tmp_path / "ckpt.pth"
    export_torch_checkpoint(pth, state, epoch=9)

    template = TrainState.create(
        model.init(jax.random.key(4), jnp.zeros((1, 8, 8, 3)), train=False), opt)

    def assert_same(restored):
        same = jax.tree_util.tree_map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            state.params, restored.params)
        assert all(jax.tree_util.tree_leaves(same))

    # 1. torch file
    st, meta = load_checkpoint_path(pth, template)
    assert meta["epoch"] == 9
    assert_same(st)
    # 2. another run's directory (resolves checkpoints/best_f1)
    st, meta = load_checkpoint_path(run_dir, template)
    assert meta["epoch"] == 5
    assert_same(st)
    # 3. the orbax checkpoint dir itself
    st, meta = load_checkpoint_path(run_dir / "checkpoints" / "best_f1", template)
    assert meta["epoch"] == 5
    assert_same(st)
    # 4. missing path raises (CLI prints "no checkpoint found" and continues)
    with pytest.raises(FileNotFoundError):
        load_checkpoint_path(tmp_path / "nope", template)


def test_import_torch_checkpoint_tolerant(tmp_path):
    """strict=False keeps template values for missing keys and reports them —
    the reference resume's key filtering + load_state_dict(strict=False)."""
    from mmr_tpu.train.checkpoint import import_torch_checkpoint

    model = TinySeg()
    vs = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)), train=False)
    opt = build_optimizer("adam")
    state = TrainState.create(vs, opt)
    pth = tmp_path / "partial.pth"
    export_torch_checkpoint(pth, state, epoch=2)
    # drop the head conv from the saved dict
    ckpt = torch.load(pth, weights_only=True)
    removed = [k for k in ckpt["network_state_dict"] if k.startswith("Conv_1")]
    for k in removed:
        del ckpt["network_state_dict"][k]
    torch.save(ckpt, pth)

    template = TrainState.create(
        model.init(jax.random.key(4), jnp.zeros((1, 8, 8, 3)), train=False), opt)
    with pytest.raises(KeyError):
        import_torch_checkpoint(pth, template)  # strict default
    restored, meta = import_torch_checkpoint(pth, template, strict=False)
    assert sorted(meta["skipped"]) == sorted(removed)
    # loaded layer matches source, skipped layer keeps template init
    np.testing.assert_array_equal(
        np.asarray(restored.params["Conv_0"]["kernel"]),
        np.asarray(state.params["Conv_0"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(restored.params["Conv_1"]["kernel"]),
        np.asarray(template.params["Conv_1"]["kernel"]))
