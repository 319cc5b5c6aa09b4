from gta_tpu.train.schedule import warmup_exp_decay
from gta_tpu.train.trainer import Trainer, TrainState
