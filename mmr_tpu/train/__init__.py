from mmr_tpu.train.optim import build_optimizer  # noqa: F401
from mmr_tpu.train.schedules import build_lr_schedule  # noqa: F401
from mmr_tpu.train.state import TrainState  # noqa: F401
from mmr_tpu.train.steps import make_train_step, make_eval_step  # noqa: F401
