"""L6 training: config, jit train step, DP loop, checkpoints, metrics, CLI.

TPU-native replacement for edflow (SURVEY.md §1 L6): the whole
forward+losses+update is ONE compiled train_step, pjit-partitioned over
the data mesh; host↔device crosses once per step with raw images.
"""

from partseg_tpu.train.config import TrainConfig, LossConfig, OptimConfig, load_config
from partseg_tpu.train.state import TrainState, create_state
from partseg_tpu.train.step import make_train_period, make_train_step
from partseg_tpu.train.loop import train

__all__ = [
    "TrainConfig",
    "LossConfig",
    "OptimConfig",
    "load_config",
    "TrainState",
    "create_state",
    "make_train_step",
    "make_train_period",
    "train",
]
