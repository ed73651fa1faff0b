from analysisgnn_tpu.train.losses import (
    masked_cross_entropy,
    multi_task_loss,
    init_mt_params,
)
from analysisgnn_tpu.train.schedules import warmup_cosine_schedule

__all__ = [
    "masked_cross_entropy",
    "multi_task_loss",
    "init_mt_params",
    "warmup_cosine_schedule",
]
