"""Multi-device (emulated 8-chip CPU mesh) coverage: sharded sliding-window
inference and the driver's dryrun entry."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

from mmr_tpu.core.mesh import create_mesh, shard_batch
from mmr_tpu.infer.sliding_window import make_sliding_window_fn


class Tiny(nn.Module):
    classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(self.classes, (3, 3), padding=[(1, 1), (1, 1)])(x).astype(jnp.float32)


def test_sliding_window_sharded_matches_single(rng):
    mesh = create_mesh()
    assert mesh.devices.size == 8
    model = Tiny()
    vs = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    frames = rng.rand(8, 40, 48, 3).astype(np.float32)

    sw_single = make_sliding_window_fn(model, vs, (16, 16), 3, sw_batch_size=4)
    sw_sharded = make_sliding_window_fn(model, vs, (16, 16), 3, sw_batch_size=4,
                                        mesh=mesh)
    ref = np.asarray(sw_single(jnp.asarray(frames)))
    got = np.asarray(sw_sharded(shard_batch(mesh, frames)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally
