from .buffer import RolloutBuffer, compute_returns
from .mappo import GRMAPPOTrainer, TrainState
from .valuenorm import ValueNormState, vn_denormalize, vn_init, vn_normalize, vn_update

__all__ = [
    "RolloutBuffer",
    "compute_returns",
    "GRMAPPOTrainer",
    "TrainState",
    "ValueNormState",
    "vn_init",
    "vn_update",
    "vn_normalize",
    "vn_denormalize",
]
