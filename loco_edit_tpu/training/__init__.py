from loco_edit_tpu.training.trainer import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
)
from loco_edit_tpu.training.resample import (
    UniformSampler,
    LossSecondMomentResampler,
)

__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "UniformSampler",
    "LossSecondMomentResampler",
]
