from human_body_proportion_estimation_tpu.training.trainer import (  # noqa: F401
    PoseTrainState,
    create_train_state,
    make_sharded_train_step,
    train_step,
)
