"""L7 training harness."""
from .step import TrainState, init_train_state, make_optimizer, make_train_step  # noqa: F401
