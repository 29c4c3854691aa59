from vadcl_tpu.train.optim import torch_adam, cosine_epoch_lr, param_gate_thresholds
from vadcl_tpu.train.step import TrainState, make_train_step, create_train_state
from vadcl_tpu.train.checkpoint import CheckpointManager

__all__ = [
    "torch_adam",
    "cosine_epoch_lr",
    "param_gate_thresholds",
    "TrainState",
    "make_train_step",
    "create_train_state",
    "CheckpointManager",
]
