from clipcap_tpu.parallel.mesh import (
    MeshConfig,
    make_mesh,
    batch_sharding,
    replicated,
    shard_params,
    shard_opt_state_zero1,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_params",
    "shard_opt_state_zero1",
]
