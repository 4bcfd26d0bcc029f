"""Training/eval engine: optax schedules, sharded train steps, evaluation."""

from egm_unet_tpu.engine.schedule import warmup_poly_schedule  # noqa: F401
from egm_unet_tpu.engine.state import TrainState, create_train_state  # noqa: F401
from egm_unet_tpu.engine.train import (  # noqa: F401
    eval_step,
    make_eval_step,
    make_train_multistep,
    make_train_step,
    make_train_step_accum,
)
