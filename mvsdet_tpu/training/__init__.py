from mvsdet_tpu.training.optim import build_optimizer, lr_schedule
from mvsdet_tpu.training.loop import TrainState, create_train_state, train_step
