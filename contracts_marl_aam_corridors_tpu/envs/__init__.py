from .env import CorridorEnv
from .env import reset as env_reset
from .env import step as env_step
from .mpe_classic import ClassicMPEEnv, MPEParams, TagParams
from .mpe_scenarios import SCENARIOS as MPE_SCENARIOS
from .mpe_scenarios import ScenarioEnv, make_scenario
from .types import EnvParams, EnvState, TimeStep, TubeParams

# NOTE: do NOT re-export the bare names ``reset``/``step`` here — they would
# shadow the ``envs.reset`` submodule (`from ...envs import reset as
# reset_mod` must keep resolving to the module).

__all__ = [
    "CorridorEnv",
    "env_reset",
    "env_step",
    "ClassicMPEEnv",
    "MPEParams",
    "TagParams",
    "MPE_SCENARIOS",
    "ScenarioEnv",
    "make_scenario",
    "EnvParams",
    "EnvState",
    "TimeStep",
    "TubeParams",
]
