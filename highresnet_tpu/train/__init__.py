from highresnet_tpu.train.schedule import ReduceLROnPlateau
from highresnet_tpu.train.state import TrainState, create_train_state
from highresnet_tpu.train.step import build_eval_step, build_train_step
from highresnet_tpu.train.loop import train_and_get_best_model

__all__ = [
    "TrainState",
    "create_train_state",
    "build_train_step",
    "build_eval_step",
    "ReduceLROnPlateau",
    "train_and_get_best_model",
]
