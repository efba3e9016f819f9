from torch_ekpose_tpu.training.loss import cpm_loss, loss_series_names
from torch_ekpose_tpu.training.metrics import (
    AverageMeter,
    Logger,
    MetricsWriter,
)
from torch_ekpose_tpu.training.schedule import ReduceLROnPlateau
from torch_ekpose_tpu.training.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)
from torch_ekpose_tpu.training.trainer import Trainer

__all__ = [
    "AverageMeter",
    "Logger",
    "MetricsWriter",
    "ReduceLROnPlateau",
    "TrainState",
    "Trainer",
    "cpm_loss",
    "create_train_state",
    "loss_series_names",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "set_learning_rate",
]
