from pcaudio.train.optim import adam_l2
from pcaudio.train.step import (
    TrainState,
    make_train_step,
    make_eval_step,
    jit_train_step,
)
from pcaudio.train.glue import pointcloud_apply, dropout_apply
from pcaudio.train.loop import fit
from pcaudio.train.recipes import (
    RECIPES,
    fst_config,
    fb_config,
    st3_config,
    cnn_temp_config,
    build_trainer,
    prepare_framewise_data,
    prepare_temporal_data,
)

__all__ = [
    "adam_l2", "TrainState", "make_train_step", "make_eval_step",
    "jit_train_step", "pointcloud_apply", "dropout_apply",
    "fit", "RECIPES", "fst_config", "fb_config", "st3_config",
    "cnn_temp_config", "build_trainer", "prepare_framewise_data",
    "prepare_temporal_data",
]
