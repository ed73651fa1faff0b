from analysisgnn_tpu.distributed.mesh import (
    make_mesh,
    shard_params_tp,
    stack_batches,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "shard_params_tp",
    "stack_batches",
    "make_sharded_train_step",
]
