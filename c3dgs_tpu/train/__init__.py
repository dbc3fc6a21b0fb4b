from .trainer import TrainState, create_train_state, train_step  # noqa: F401
