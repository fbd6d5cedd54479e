from .actor_critic import GRActor, GRCritic
from .config import ModelConfig
from .policy import GRMAPPOPolicy, PolicyDims, PolicyParams

__all__ = [
    "GRActor",
    "GRCritic",
    "GRMAPPOPolicy",
    "ModelConfig",
    "PolicyDims",
    "PolicyParams",
]
