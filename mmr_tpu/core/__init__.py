from mmr_tpu.core.mesh import (  # noqa: F401
    MeshSpec,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    local_batch_slice,
)
from mmr_tpu.core.precision import Precision, DEFAULT_PRECISION  # noqa: F401
from mmr_tpu.core.prng import RngStream, seed_everything  # noqa: F401
