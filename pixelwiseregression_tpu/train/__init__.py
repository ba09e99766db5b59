from pixelwiseregression_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_optimizer,
    stage_losses,
    total_loss,
    make_train_step,
    make_eval_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "stage_losses",
    "total_loss",
    "make_train_step",
    "make_eval_step",
]
