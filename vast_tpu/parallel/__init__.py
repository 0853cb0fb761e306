from vast_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
)
