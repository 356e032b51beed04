from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
)
