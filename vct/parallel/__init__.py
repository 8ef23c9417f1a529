from vct.parallel.mesh import (  # noqa: F401
    activate_mesh,
    ambient_mesh,
    batch_sharding,
    host_to_device,
    make_mesh,
    replicated,
    shard_batch,
)
from vct.parallel.multihost import initialize, is_primary, process_shard  # noqa: F401
from vct.parallel.shard import shard_params, shard_state_like_params  # noqa: F401
