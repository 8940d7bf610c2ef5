from pose3d_tpu.train.state import TrainState, create_train_state, torch_style_adam, multistep_lr
from pose3d_tpu.train import steps, evaluate

__all__ = [
    "TrainState",
    "create_train_state",
    "torch_style_adam",
    "multistep_lr",
    "steps",
    "evaluate",
]
