from pcaudio.train.optim import adam_l2
from pcaudio.train.step import (
    TrainState,
    make_train_step,
    make_eval_step,
    jit_train_step,
)
from pcaudio.train.glue import pointcloud_apply, dropout_apply

__all__ = [
    "adam_l2", "TrainState", "make_train_step", "make_eval_step",
    "jit_train_step", "pointcloud_apply", "dropout_apply",
]
