"""Training engine: WGAN-GP step functions, growth schedulers, train loop."""

from pgx.train.schedule import (  # noqa: F401
    LegacySchedule,
    ProperSchedule,
    ScheduleState,
    schedule_from_dict,
    schedule_to_dict,
)
from pgx.train.wgan import (  # noqa: F401
    TrainConfig,
    init_train_state,
    make_eval_generate,
    make_optimizer,
    make_train_multi_step,
    make_train_step,
    make_train_step_body,
)
