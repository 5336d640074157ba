"""Training: pjit data-parallel PoseNet training with reference-faithful loss."""

from flope_tpu.train.posenet_train import (
    TrainConfig,
    TrainState,
    chordal_loss,
    angle_error_deg,
    make_optimizer,
    create_train_state,
    make_train_step,
    make_eval_step,
    train_posenet,
    param_shardings,
)
