from stableanimator_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    train_loss,
)
