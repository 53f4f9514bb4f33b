from mulactseg_tpu.engine.state import TrainState, create_train_state
from mulactseg_tpu.engine.train import make_train_step, CRITERIA
from mulactseg_tpu.engine.evaluate import Evaluator

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "CRITERIA",
    "Evaluator",
]
