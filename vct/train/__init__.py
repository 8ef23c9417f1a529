from vct.train.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from vct.train.engine import (  # noqa: F401
    TrainState,
    Trainer,
    compute_class_weights,
    count_parameters,
)
