"""Device meshes, sharding rules, and multi-host helpers."""

from voicesplit_tpu.parallel.mesh import make_mesh, local_batch_size
from voicesplit_tpu.parallel.sharding import (
    batch_sharding,
    param_partition_spec,
    shard_train_state,
)
