from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    POINTS_AXIS,
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
)
from .pipeline import (
    PIPE_AXIS,
    encoder_pipeline_apply,
    make_pipe_mesh,
    pipeline_apply,
    stack_stage_params,
)
