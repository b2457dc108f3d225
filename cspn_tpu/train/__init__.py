"""Training/eval runtime (reference L3/L4 layers): losses, metrics, LR
schedule, train state, checkpointing, drivers."""

from cspn_tpu.train.loss import masked_l1_loss, berhu_loss
from cspn_tpu.train.metrics import evaluate_error, ErrorAverager, METRIC_KEYS
from cspn_tpu.train.lr_schedule import ReduceLROnPlateau
from cspn_tpu.train.state import TrainState, create_train_state, partial_restore

__all__ = [
    "masked_l1_loss",
    "berhu_loss",
    "evaluate_error",
    "ErrorAverager",
    "METRIC_KEYS",
    "ReduceLROnPlateau",
    "TrainState",
    "create_train_state",
    "partial_restore",
]
