from miso_tpu.train import checkpoint, optim  # noqa: F401
from miso_tpu.train.trainer import GridTrainer, Trainer, make_train_step  # noqa: F401
