from .build import (
    build_lr_schedule,
    build_optimizer,
    ema_update,
    warmup_cosine_lr,
    warmup_multistep_lr,
)

__all__ = [
    "build_lr_schedule",
    "build_optimizer",
    "ema_update",
    "warmup_cosine_lr",
    "warmup_multistep_lr",
]
