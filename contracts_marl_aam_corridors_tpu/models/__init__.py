from .actor_critic import GRActor, GRCritic, MLPActor, MLPCritic
from .config import ModelConfig
from .policy import GRMAPPOPolicy, PolicyDims, PolicyParams
from .mlp_policy import FlatPolicyDims, RMAPPOPolicy

__all__ = [
    "GRActor",
    "GRCritic",
    "GRMAPPOPolicy",
    "MLPActor",
    "MLPCritic",
    "RMAPPOPolicy",
    "FlatPolicyDims",
    "ModelConfig",
    "PolicyDims",
    "PolicyParams",
]
