"""Device meshes, sharding rules, and multi-host helpers."""

from voicesplit_tpu.parallel.mesh import (
    initialize_distributed,
    local_batch_size,
    make_mesh,
)
from voicesplit_tpu.parallel.sequence import (
    make_seq_mesh,
    make_sp_mask_fn,
    separate_long,
)
from voicesplit_tpu.parallel.sharding import (
    batch_sharding,
    param_partition_spec,
    put_batch,
    shard_train_state,
)
