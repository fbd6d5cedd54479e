"""User-facing environment API: reset/step with auto-reset, vmapped vector env.

The TPU-native replacement for the reference's process-based vectorization
(``GraphSubprocVecEnv``/``graphworker``, onpolicy/envs/env_wrappers.py:851-1036):
instead of one OS process + pipe per environment, the env batch lives on
device as a stacked ``EnvState`` pytree and one jitted, ``vmap``-ed step
advances all of them in lockstep.  Auto-reset replicates the worker's
"reset when all agents done, return the fresh observation" behavior
(env_wrappers.py:866-870).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import corridor, reset as reset_mod
from .types import EnvParams, EnvState, TimeStep

Array = jax.Array


def _select_tree(pred: Array, a, b):
    """Per-leaf ``where(pred, a, b)`` with pred broadcast over leaf dims."""

    def sel(x, y):
        p = pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim))
        return jnp.where(p, x, y)

    return jax.tree.map(sel, a, b)


def reset(params: EnvParams, key: Array, dtype=jnp.float32):
    """Fresh episode + initial observations.

    Returns ``(state, timestep)`` where reward/done are zeros (the reference's
    ``reset()`` returns only observations; we pack them in a TimeStep for a
    uniform scan carry).
    """
    state = reset_mod.reset(params, key, dtype)
    state, obs, node_obs, adj, agent_id = corridor.reset_outputs(params, state)
    n = params.num_agents
    ts = TimeStep(
        obs=obs,
        agent_id=agent_id,
        node_obs=node_obs,
        adj=adj,
        reward=jnp.zeros((n,), dtype),
        done=jnp.zeros((n,), bool),
        info={},
        truncated=jnp.zeros((n,), bool),
    )
    return state, ts


def step(params: EnvParams, state: EnvState, action_idx: Array, hj_data=None):
    """One step with auto-reset on all-done.

    Reward/done/info come from the terminal step; obs/node_obs/adj are the
    fresh episode's when every agent is done (env_wrappers.py:866-870).
    ``prev_phase`` carries across the reset boundary, replicating the
    reference's never-cleared ``agent.previous_phase``.
    """
    state2, ts = corridor.step(params, state, action_idx, hj_data)
    all_done = jnp.all(ts.done)

    key_next, rkey = jax.random.split(state2.key)
    dtype = state.agent_states.dtype
    fresh = reset_mod.reset(params, rkey, dtype)
    fresh = fresh.replace(prev_phase=state2.prev_phase)
    if state2.frozen_pos is not None:
        # v4oct's stale position cache persists across episodes (the scenario
        # object is never rebuilt, see EnvState.frozen_pos)
        fresh = fresh.replace(frozen_pos=state2.frozen_pos)
    fresh, obs_r, node_r, adj_r, _ = corridor.reset_outputs(params, fresh)
    state2 = state2.replace(key=key_next)

    new_state = _select_tree(all_done, fresh, state2)
    ts = ts.replace(
        obs=jnp.where(all_done, obs_r, ts.obs),
        node_obs=jnp.where(all_done, node_r, ts.node_obs),
        adj=jnp.where(all_done, adj_r, ts.adj),
    )
    return new_state, ts


class CorridorEnv:
    """Convenience bundle of params + jitted single/vector reset & step.

    Vector forms take a leading batch axis on keys/states/actions; they are
    plain ``vmap`` over the pure functions, so they compose with ``jit``,
    ``lax.scan`` (rollouts) and ``shard_map`` (multi-host) without change.
    """

    def __init__(self, params: EnvParams, dtype=jnp.float32, hj_data=None):
        self.params = params
        self.dtype = dtype
        self.reset = jax.jit(partial(reset, params, dtype=dtype))
        self.step = jax.jit(partial(step, params, hj_data=hj_data))
        self.vec_reset = jax.jit(jax.vmap(partial(reset, params, dtype=dtype)))
        self.vec_step = jax.jit(jax.vmap(partial(step, params, hj_data=hj_data)))

    @property
    def num_actions(self) -> int:
        return self.params.num_actions

    @property
    def obs_dim(self) -> int:
        return self.params.obs_dim

    @property
    def num_entities(self) -> int:
        return self.params.num_entities
