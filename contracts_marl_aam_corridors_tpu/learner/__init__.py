from .buffer import RolloutBuffer, compute_returns
from .mappo import GRMAPPOTrainer, TrainState
from .mpe_runner import MPERunner, make_env
from .separated import SeparatedMPERunner, SeparatedTrainer
from .valuenorm import ValueNormState, vn_denormalize, vn_init, vn_normalize, vn_update

__all__ = [
    "RolloutBuffer",
    "compute_returns",
    "GRMAPPOTrainer",
    "TrainState",
    "MPERunner",
    "make_env",
    "SeparatedMPERunner",
    "SeparatedTrainer",
    "ValueNormState",
    "vn_init",
    "vn_update",
    "vn_normalize",
    "vn_denormalize",
]
