from histogan_tpu.parallel.mesh import (  # noqa: F401
    batch_spec,
    local_shard_info,
    make_mesh,
    maybe_initialize_distributed,
    replicate,
    shard_batch,
)
