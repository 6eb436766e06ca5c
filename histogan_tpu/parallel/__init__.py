from histogan_tpu.parallel.mesh import (  # noqa: F401
    batch_spec,
    local_shard_info,
    make_mesh,
    maybe_initialize_distributed,
    replicate,
    shard_batch,
)
from histogan_tpu.parallel.fsdp import (  # noqa: F401
    fsdp_spec,
    shard_state,
    sharded_bytes_per_device,
    state_shardings,
    unshard,
)
