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

    @property
    def action_nvec(self):
        return (5,)


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


# ---------------------------------------------------------------------------
# simple_tag: heterogeneous predator-prey (onpolicy/envs/mpe/scenarios/
# simple_tag.py).  Adversaries are larger/slower (size .075, accel 3, max
# speed 1.0), good agents smaller/faster (.05, 4, 1.3); landmarks are solid
# obstacles (size .2, collide).  Rewards are per-agent (non-collaborative).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TagParams:
    num_adversaries: int = 3
    num_good: int = 1
    num_landmarks: int = 2
    episode_length: int = 25
    dt: float = 0.1
    damping: float = 0.25
    contact_force: float = 1e2
    contact_margin: float = 1e-3
    landmark_size: float = 0.2

    @property
    def num_agents(self) -> int:
        return self.num_adversaries + self.num_good

    def sizes(self):
        import numpy as _np

        return _np.array(
            [0.075] * self.num_adversaries + [0.05] * self.num_good
        )

    def accels(self):
        import numpy as _np

        return _np.array([3.0] * self.num_adversaries + [4.0] * self.num_good)

    def max_speeds(self):
        import numpy as _np

        return _np.array([1.0] * self.num_adversaries + [1.3] * self.num_good)

    @property
    def action_nvec(self):
        return (5,)

    @property
    def obs_dim(self) -> int:
        # padded to the max per-agent dim: [vel, pos, rel landmarks,
        # rel others, other_vel of good others] — adversaries see num_good
        # velocity slots, good agents see num_good-1
        return 4 + 2 * self.num_landmarks + 2 * (self.num_agents - 1) + 2 * self.num_good


def tag_reset(params: TagParams, key: Array, dtype=jnp.float32) -> MPEState:
    key, ka, kl = jax.random.split(key, 3)
    return MPEState(
        agent_pos=jax.random.uniform(ka, (params.num_agents, 2), dtype, -1.0, 1.0),
        agent_vel=jnp.zeros((params.num_agents, 2), dtype),
        landmark_pos=0.8 * jax.random.uniform(kl, (params.num_landmarks, 2), dtype, -1.0, 1.0),
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def _tag_forces(params: TagParams, pos: Array, lm: Array, dtype) -> Array:
    """Agent-agent and agent-landmark softmax-penetration forces."""
    n = params.num_agents
    sizes = jnp.asarray(params.sizes(), dtype)
    k = params.contact_margin

    dvec = pos[:, None, :] - pos[None, :, :]
    dist = jnp.where(jnp.eye(n, dtype=bool), 1.0, jnp.linalg.norm(dvec, axis=-1))
    dmin = sizes[:, None] + sizes[None, :]
    pen = jnp.logaddexp(0.0, -(dist - dmin) / k) * k
    f = params.contact_force * dvec / dist[..., None] * pen[..., None]
    f = jnp.where(jnp.eye(n, dtype=bool)[..., None], 0.0, f)
    force = f.sum(axis=1)

    dvec_l = pos[:, None, :] - lm[None, :, :]
    dist_l = jnp.maximum(jnp.linalg.norm(dvec_l, axis=-1), 1e-9)
    dmin_l = sizes[:, None] + params.landmark_size
    pen_l = jnp.logaddexp(0.0, -(dist_l - dmin_l) / k) * k
    force += (params.contact_force * dvec_l / dist_l[..., None] * pen_l[..., None]).sum(axis=1)
    return force


def tag_observations(params: TagParams, state: MPEState) -> Array:
    """Per-agent obs zero-padded to a common width (the reference emits
    ragged per-agent arrays; upstream tag training uses separated policies)."""
    n, na = params.num_agents, params.num_adversaries
    dtype = state.agent_pos.dtype
    rel_lm = (state.landmark_pos[None] - state.agent_pos[:, None]).reshape(n, -1)
    rows = []
    for i in range(n):
        others = [j for j in range(n) if j != i]
        rel_o = jnp.concatenate([state.agent_pos[j] - state.agent_pos[i] for j in others])
        good_vels = [state.agent_vel[j] for j in others if j >= na]
        ov = jnp.concatenate(good_vels) if good_vels else jnp.zeros((0,), dtype)
        row = jnp.concatenate([state.agent_vel[i], state.agent_pos[i], rel_lm[i], rel_o, ov])
        pad = params.obs_dim - row.shape[0]
        rows.append(jnp.pad(row, (0, pad)))
    return jnp.stack(rows)


def tag_rewards(params: TagParams, state: MPEState) -> Array:
    """simple_tag.reward:60-97: good agents -10 per adversary contact plus an
    escape-the-arena bound penalty; every adversary +10 per colliding
    (good, adversary) pair."""
    n, na = params.num_agents, params.num_adversaries
    dtype = state.agent_pos.dtype
    sizes = jnp.asarray(params.sizes(), dtype)
    d = jnp.linalg.norm(state.agent_pos[:, None] - state.agent_pos[None, :], axis=-1)
    coll = (d < sizes[:, None] + sizes[None, :]) & ~jnp.eye(n, dtype=bool)
    adv = jnp.arange(n) < na
    pair_coll = coll & adv[:, None] & ~adv[None, :]  # [adversary, good]
    total_pairs = jnp.sum(pair_coll).astype(dtype)

    good_hits = jnp.sum(pair_coll, axis=0).astype(dtype)  # per good agent

    x = jnp.abs(state.agent_pos)
    bound = jnp.where(
        x < 0.9, 0.0, jnp.where(x < 1.0, (x - 0.9) * 10.0, jnp.minimum(jnp.exp(2 * x - 2), 10.0))
    ).sum(axis=-1)

    rew_good = -10.0 * good_hits - bound
    rew_adv = jnp.broadcast_to(10.0 * total_pairs, (n,))
    return jnp.where(adv, rew_adv, rew_good)


def tag_step(params: TagParams, state: MPEState, action_idx: Array):
    dtype = state.agent_pos.dtype
    accel = jnp.asarray(params.accels(), dtype)
    max_speed = jnp.asarray(params.max_speeds(), dtype)
    # the reference applies accel TWICE: as the action 'sensitivity'
    # (environment.py _set_action) and again as mass*accel in
    # apply_action_force (core.py:207-214) — force = accel^2 * u
    u = jnp.take(_ACTION_TABLE.astype(dtype), action_idx, axis=0) * (accel**2)[:, None]
    force = u + _tag_forces(params, state.agent_pos, state.landmark_pos, dtype)
    vel = state.agent_vel * (1 - params.damping) + force * params.dt
    speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    vel = jnp.where(
        speed > max_speed[:, None],
        vel / jnp.maximum(speed, 1e-12) * max_speed[:, None],
        vel,
    )
    pos = state.agent_pos + vel * params.dt
    t_new = state.t + 1
    state = state.replace(agent_pos=pos, agent_vel=vel, t=t_new)

    obs = tag_observations(params, state)
    rew = tag_rewards(params, state)
    done = jnp.broadcast_to(t_new >= params.episode_length, (params.num_agents,))

    key, rkey = jax.random.split(state.key)
    fresh = tag_reset(params, rkey, dtype)
    all_done = jnp.all(done)
    state = jax.tree.map(
        lambda f, s: jnp.where(jnp.reshape(all_done, (1,) * f.ndim), f, s),
        fresh,
        state.replace(key=key),
    )
    obs = jnp.where(all_done, tag_observations(params, fresh), obs)
    return state, (obs, rew, done)
