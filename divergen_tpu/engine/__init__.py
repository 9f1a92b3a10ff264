from .events import CommonMetricPrinter, EventStorage, JSONWriter
from .train_loop import TrainState, create_train_state, make_train_step

__all__ = [
    "CommonMetricPrinter",
    "EventStorage",
    "JSONWriter",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
