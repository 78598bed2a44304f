"""Training: jitted steps, optimizer state, checkpointing, the train loop."""

from voicesplit_tpu.train.state import TrainState, create_train_state, make_optimizer
from voicesplit_tpu.train.steps import make_ema_update, make_eval_step, make_train_step
from voicesplit_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    partial_restore,
    save_checkpoint,
)
from voicesplit_tpu.train.trainer import Trainer
