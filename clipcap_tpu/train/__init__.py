from clipcap_tpu.train.state import TrainState, create_train_state, make_optimizer
from clipcap_tpu.train.step import make_train_step

__all__ = ["TrainState", "create_train_state", "make_optimizer", "make_train_step"]
