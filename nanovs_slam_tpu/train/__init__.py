from .multitask_loss import multitask_loss, LossWeights, default_loss_weights  # noqa: F401
from .train_step import TrainState, create_train_state, make_train_step  # noqa: F401
