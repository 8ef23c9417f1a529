from vct.parallel.mesh import (  # noqa: F401
    batch_sharding,
    host_to_device,
    make_mesh,
    replicated,
    shard_batch,
)
