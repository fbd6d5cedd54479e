"""Classic force-based MPE world + ``simple_spread``.

Vectorized re-design of the reference's vendored original MPE
(``onpolicy/envs/mpe/core.py`` + ``scenarios/simple_spread.py``): the
force-integration path that the corridor ``World.step`` abandoned but the
classic scenarios still use —

    apply_action_force (core.py:204-214) -> softmax-penetration collision
    forces (get_entity_collision_force:264-295) -> damped-Euler integration
    (integrate_state:240-252) with max-speed rescaling.

One pure ``step`` over struct-of-arrays state; vmap for env batches.  Done is
episode-length only (environment.py:190-197); auto-reset mirrors the
subprocess worker.  Landmarks don't collide/move in simple_spread, so only
agent-agent forces are materialized.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MPEParams:
    num_agents: int = 3
    num_landmarks: int = 3
    episode_length: int = 25
    agent_size: float = 0.15
    dt: float = 0.1
    damping: float = 0.25
    contact_force: float = 1e2
    contact_margin: float = 1e-3
    sensitivity: float = 5.0  # environment.py _set_action default accel
    dim_c: int = 2

    @property
    def obs_dim(self) -> int:
        # [vel(2), pos(2), rel landmarks (2L), rel others (2(N-1)), comm (2(N-1))]
        return 4 + 2 * self.num_landmarks + 4 * (self.num_agents - 1)

    @property
    def num_actions(self) -> int:
        return 5


@struct.dataclass
class MPEState:
    agent_pos: Array  # (N, 2)
    agent_vel: Array  # (N, 2)
    landmark_pos: Array  # (L, 2)
    t: Array  # () int32
    key: Array


# one-hot slot weights for the 5-action map: u = [a1 - a2, a3 - a4]
# (environment.py discrete_action_space branch)
_ACTION_TABLE = jnp.asarray(
    [[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]]
)


def reset(params: MPEParams, key: Array, dtype=jnp.float32) -> MPEState:
    """simple_spread.reset_world: agents ~ U(-1,1)^2, landmarks ~ 0.8 U(-1,1)^2."""
    key, ka, kl = jax.random.split(key, 3)
    return MPEState(
        agent_pos=jax.random.uniform(ka, (params.num_agents, 2), dtype, -1.0, 1.0),
        agent_vel=jnp.zeros((params.num_agents, 2), dtype),
        landmark_pos=0.8 * jax.random.uniform(kl, (params.num_landmarks, 2), dtype, -1.0, 1.0),
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def _collision_forces(params: MPEParams, pos: Array) -> Array:
    """Pairwise softmax-penetration forces between agents (core.py:264-295).

    force_ab = contact_force * dvec/dist * margin*logaddexp(0, -(d-dmin)/margin)
    with equal masses the ratio terms are 1/-1."""
    n = params.num_agents
    dvec = pos[:, None, :] - pos[None, :, :]
    dist = jnp.linalg.norm(dvec, axis=-1)
    dist = jnp.where(jnp.eye(n, dtype=bool), 1.0, dist)
    dmin = 2 * params.agent_size
    k = params.contact_margin
    pen = jnp.logaddexp(0.0, -(dist - dmin) / k) * k
    f = params.contact_force * dvec / dist[..., None] * pen[..., None]
    f = jnp.where(jnp.eye(n, dtype=bool)[..., None], 0.0, f)
    return f.sum(axis=1)  # net force on each agent


def observations(params: MPEParams, state: MPEState) -> Array:
    """simple_spread.observation:86-106, comm slots are zeros (silent)."""
    n = params.num_agents
    rel_lm = state.landmark_pos[None, :, :] - state.agent_pos[:, None, :]
    rel_other = state.agent_pos[None, :, :] - state.agent_pos[:, None, :]
    # others exclude self, in id order (reference loops agents skipping ego)
    idx = jnp.asarray(
        [[j for j in range(n) if j != i] for i in range(n)], jnp.int32
    )
    rel_other = jnp.take_along_axis(rel_other, idx[..., None], axis=1)
    comm = jnp.zeros((n, (n - 1) * params.dim_c), state.agent_pos.dtype)
    return jnp.concatenate(
        [
            state.agent_vel,
            state.agent_pos,
            rel_lm.reshape(n, -1),
            rel_other.reshape(n, -1),
            comm,
        ],
        axis=-1,
    )


def rewards(params: MPEParams, state: MPEState) -> Array:
    """simple_spread.reward:72-84 + the env's shared-reward sum.

    Per-agent: -sum(min dist per landmark) and -1 per collision — INCLUDING
    the agent itself (the reference's loop doesn't skip ego and dist(0) <
    dist_min always holds, simple_spread:80-83 — a classic-MPE quirk).  The
    env then sums across agents and hands everyone the total
    (environment.py shared_reward path; world.collaborative=True)."""
    d = jnp.linalg.norm(
        state.agent_pos[:, None, :] - state.landmark_pos[None, :, :], axis=-1
    )
    base = -jnp.sum(jnp.min(d, axis=0))
    n = params.num_agents
    da = jnp.linalg.norm(state.agent_pos[:, None] - state.agent_pos[None, :], axis=-1)
    coll = da < 2 * params.agent_size  # eye included: self-collision quirk
    per_agent = base - jnp.sum(coll, axis=1).astype(state.agent_pos.dtype)
    return jnp.broadcast_to(jnp.sum(per_agent), (n,))


def step(params: MPEParams, state: MPEState, action_idx: Array):
    """One world step + per-agent obs/reward/done, with auto-reset."""
    dtype = state.agent_pos.dtype
    u = jnp.take(_ACTION_TABLE.astype(dtype), action_idx, axis=0) * params.sensitivity
    force = u + _collision_forces(params, state.agent_pos)
    vel = state.agent_vel * (1 - params.damping) + force * params.dt
    pos = state.agent_pos + vel * params.dt
    t_new = state.t + 1
    state = state.replace(agent_pos=pos, agent_vel=vel, t=t_new)

    obs = observations(params, state)
    rew = rewards(params, state)
    done = jnp.broadcast_to(t_new >= params.episode_length, (params.num_agents,))

    key, rkey = jax.random.split(state.key)
    fresh = reset(params, rkey, dtype)
    all_done = jnp.all(done)
    state = jax.tree.map(
        lambda f, s: jnp.where(
            jnp.reshape(all_done, (1,) * f.ndim), f, s
        ),
        fresh,
        state.replace(key=key),
    )
    obs = jnp.where(all_done, observations(params, fresh), obs)
    return state, (obs, rew, done)


class ClassicMPEEnv:
    """Jitted single/vector classic-MPE env (simple_spread)."""

    def __init__(self, params: MPEParams, dtype=jnp.float32):
        self.params = params
        self.dtype = dtype
        self.reset = jax.jit(partial(reset, params, dtype=dtype))
        self.step = jax.jit(partial(step, params))
        self.vec_reset = jax.jit(jax.vmap(partial(reset, params, dtype=dtype)))
        self.vec_step = jax.jit(jax.vmap(partial(step, params)))
