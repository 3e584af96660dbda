from .checkpoint import (
    find_checkpoints,
    latest_checkpoint,
    restore_checkpoint,
    restore_params,
    save_checkpoint,
)
from .train import (
    TrainState,
    init_train,
    make_eval_step,
    make_grad_fn,
    make_lr_schedule,
    named_grad_leaves,
    make_optimizer,
    make_train_step,
)
