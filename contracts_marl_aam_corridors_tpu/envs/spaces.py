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


def mpe_spaces(params) -> dict:
    """Spaces for the classic-MPE scenario kernels (vendored
    environment.py:55-109): Discrete movement and/or comm components,
    simplified to MultiDiscrete when an agent both moves and speaks
    (environment.py:85-96).  ``params`` is any mpe_classic/mpe_scenarios
    params dataclass exposing ``action_nvec`` and ``obs_dim``."""
    import gymnasium as gym

    nvec = tuple(getattr(params, "action_nvec", (5,)))
    if len(nvec) == 1:
        act = gym.spaces.Discrete(nvec[0])
    else:
        act = gym.spaces.MultiDiscrete(np.asarray(nvec, dtype=np.int64))
    obs = gym.spaces.Box(-np.inf, np.inf, shape=(params.obs_dim,), dtype=np.float32)
    n = params.num_agents
    share = gym.spaces.Box(
        -np.inf, np.inf, shape=(params.obs_dim * n,), dtype=np.float32
    )
    return {
        "action_space": [act] * n,
        "observation_space": [obs] * n,
        "share_observation_space": [share] * n,
    }
