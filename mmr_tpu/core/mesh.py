"""Device mesh + sharding helpers — the framework's parallelism substrate.

The reference has *no* distributed machinery (SURVEY.md §2.4: no
torch.distributed / NCCL anywhere; training is single-GPU, e.g.
``MMR_Seg_Unet/MMR_Core_ModelData/ModelTraining.py:138-141``). This module is
the new, first-class TPU-native component the rebuild requires: a named
``jax.sharding.Mesh`` over ICI (+ an optional DCN axis for multi-slice), with
batch-axis data parallelism expressed through ``NamedSharding`` so XLA inserts
the gradient allreduce. Scaling to wider meshes is config-only.

Axes:
    ``data``   — data parallel (batch sharded, grads allreduced over ICI)
    ``model``  — reserved for intra-op sharding of very wide layers; the
                 segmentation families here are 3.7M–15M params, so it is 1 by
                 default but the plumbing is generic.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def all_reduce_moments(moments, count: int):
    """psum BN moment sums over the data axis when tracing inside a
    ``shard_map`` (the packed multi-device train path) — sync-BN semantics
    matching the GSPMD path's global batch statistics. A no-op outside a
    sharded context (single device, or GSPMD where XLA globalizes the
    reductions itself). Returns ``(moments, global_count)``."""
    try:
        n = jax.lax.psum(1, DATA_AXIS)
    except NameError:
        return moments, count
    return jax.lax.psum(moments, DATA_AXIS), count * n


def psum_if_sharded(x):
    """psum over the data axis iff it is bound (shard_map context)."""
    try:
        return jax.lax.psum(x, DATA_AXIS)
    except NameError:
        return x


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh description (config-level object).

    ``data=-1`` means "all remaining devices on the data axis".
    """

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"MeshSpec(data={self.data}, model={self.model}) does not tile "
                f"{n_devices} devices"
            )
        return data, model


def initialize_multihost() -> None:
    """Initialize JAX's multi-host runtime when launched under a cluster.

    Single-process runs (the common case, matching the reference's single-GPU
    scope) skip this; multi-host coordination env vars trigger
    ``jax.distributed.initialize()``.
    """
    if jax.process_count() > 1:
        return  # already initialized
    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def create_mesh(
    spec: MeshSpec | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh over the given (default: all) devices."""
    spec = spec or MeshSpec()
    devices = list(devices if devices is not None else jax.devices())
    data, model = spec.resolve(len(devices))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Sharding that splits axis 0 (batch) over the data axis, replicating rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: int = 0):
    """Place a host pytree of arrays onto the mesh with ``axis`` sharded over
    the data mesh axis (axis 0 for plain batches; axis 1 for the train step's
    stacked ``(n_accum, B, ...)`` microbatches).

    Uses ``jax.device_put`` with NamedSharding — on multi-host this expects
    per-host batches produced by :func:`local_batch_slice` and assembles the
    global array from host-local shards.
    """

    single = mesh.devices.size == 1
    n_data = dict(zip(mesh.axis_names, mesh.devices.shape)).get(DATA_AXIS, 1)

    def _put(x):
        x = np.asarray(x)
        if single:  # plain transfer; NamedSharding costs extra on axon
            return jax.device_put(x, mesh.devices.flat[0])
        if x.shape[axis] % n_data != 0:
            raise ValueError(
                f"batch axis {axis} has size {x.shape[axis]}, not divisible by "
                f"the data-parallel mesh size {n_data}; choose batch_size as a "
                f"multiple of {n_data} (shape {x.shape})")
        spec = [None] * x.ndim
        spec[axis] = DATA_AXIS
        sh = NamedSharding(mesh, P(*spec))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(_put, batch)


def local_batch_slice(global_batch_size: int) -> slice:
    """The slice of the global batch this host is responsible for loading.

    Host-local data loading sharded by ``jax.process_index()`` (SURVEY.md §5.8).
    """
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
