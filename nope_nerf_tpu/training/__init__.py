from .state import TrainState, create_train_state, ModelConfigs
from .trainer import Trainer, train_step, compute_step_loss
from .scheduler import anneal_weight, AutoScheduler, lr_at_epoch
