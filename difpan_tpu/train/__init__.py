from .state import TrainState, create_train_state, make_optimizer, ema_update
from .engine import TrainConfig, train, make_train_step, make_sample_fn
