from . import losses, metrics, schedules  # noqa: F401
from .checkpoints import CheckpointManager  # noqa: F401
from .logging import AverageMeter, ScalarWriter, create_logger  # noqa: F401
from .train_state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_depthnet_eval,
    make_depthnet_step,
    make_full_net_eval,
    make_full_net_step,
    set_learning_rate,
)
from .sim2real import Sim2RealTrainer, make_sim2real_step  # noqa: F401
from .trainer import Trainer, get_dataloaders  # noqa: F401
