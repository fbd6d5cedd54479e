"""Gym-style space descriptions (reference ``MultiAgentBaseEnv`` space
construction, environment.py:92-208 + ``set_graph_obs_space``:986-1018).

The kernels never consult gym spaces (all shapes are static in EnvParams),
but external tooling expects them; built from gymnasium when available.
"""
from __future__ import annotations

import numpy as np

from .types import EnvParams


def action_space(params: EnvParams):
    import gymnasium as gym

    return gym.spaces.Discrete(params.num_actions)


def observation_space(params: EnvParams):
    import gymnasium as gym

    return gym.spaces.Box(-np.inf, np.inf, shape=(params.obs_dim,), dtype=np.float32)


def node_observation_space(params: EnvParams):
    import gymnasium as gym

    return gym.spaces.Box(
        -np.inf, np.inf,
        shape=(params.num_entities, params.node_feat_dim), dtype=np.float32,
    )


def adj_space(params: EnvParams):
    import gymnasium as gym

    E = params.num_entities
    return gym.spaces.Box(-np.inf, np.inf, shape=(E, E), dtype=np.float32)


def edge_space(params: EnvParams):
    """edge_dim = 1 (distance), hardcoded like the reference (:997)."""
    import gymnasium as gym

    return gym.spaces.Box(-np.inf, np.inf, shape=(1,), dtype=np.float32)


def agent_id_space(params: EnvParams):
    import gymnasium as gym

    return gym.spaces.Box(0, params.num_agents, shape=(1,), dtype=np.int32)


def all_spaces(params: EnvParams) -> dict:
    return {
        "action_space": [action_space(params)] * params.num_agents,
        "observation_space": [observation_space(params)] * params.num_agents,
        "node_observation_space": [node_observation_space(params)] * params.num_agents,
        "adj_observation_space": [adj_space(params)] * params.num_agents,
        "edge_observation_space": [edge_space(params)] * params.num_agents,
        "agent_id_observation_space": [agent_id_space(params)] * params.num_agents,
    }
