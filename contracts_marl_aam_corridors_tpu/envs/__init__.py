from .env import CorridorEnv, reset, step
from .mpe_classic import ClassicMPEEnv, MPEParams, TagParams
from .types import EnvParams, EnvState, TimeStep, TubeParams

__all__ = [
    "CorridorEnv",
    "reset",
    "step",
    "ClassicMPEEnv",
    "MPEParams",
    "TagParams",
    "EnvParams",
    "EnvState",
    "TimeStep",
    "TubeParams",
]
