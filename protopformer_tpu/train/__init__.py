from protopformer_tpu.train.scheduler import (
    cosine_epoch_schedule,
    step_epoch_schedule,
    make_group_schedules,
)
from protopformer_tpu.train.optimizer import make_optimizer, param_group_label
from protopformer_tpu.train.state import TrainState, create_train_state
from protopformer_tpu.train.steps import (
    make_train_step,
    make_eval_step,
    cross_entropy_loss,
)
