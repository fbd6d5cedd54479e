"""Remaining classic-MPE scenario kernels (vendored reference
``onpolicy/envs/mpe/scenarios/``): simple_adversary, simple_push,
simple_reference, simple_speaker_listener, simple_crypto, simple_attack,
simple_world_comm.  (simple_spread / simple_tag live in ``mpe_classic.py``;
``simple_crypto_display`` is a rendering-only variant of simple_crypto with
fixed spawn positions and is covered by the renderer, not a separate kernel.)

Each scenario is a pure, jittable (reset, observations, rewards, step)
quadruple over struct-of-arrays state — ``vmap`` for env batches — following
the conventions of ``mpe_classic.py``.  New machinery added here:

* the **communication channel**: non-silent agents publish a one-hot comm
  vector each step (core.py:254-261 ``update_agent_state``: ``state.c =
  action.c``, no noise by default), observed by others *after* the world
  step;
* **MultiDiscrete actions**: agents that both move and speak take a
  ``[move_idx, comm_idx]`` pair (environment.py:85-96 builds MultiDiscrete
  spaces, :210-268 splits the concatenated one-hots).  Here every scenario
  takes an ``(N, 2)`` int action array ``[move, comm]``; components an agent
  lacks (immovable / silent) are ignored, matching the reference's per-agent
  ragged spaces;
* **agent-landmark collision forces** for scenarios with solid landmarks
  (get_entity_collision_force core.py:264-295: immovable colliders push the
  movable side only);
* heterogeneous ragged observations are zero-padded on the right to the
  scenario's max width, as ``mpe_classic.tag_observations`` already does.

Reference quirks preserved (verified against the vendored code, which is the
runnable oracle):

* the "accel applied twice" force scaling — ``_set_action`` multiplies the
  unit action by ``sensitivity=accel`` (environment.py:247-250) and
  ``apply_action_force`` multiplies by ``mass*accel`` again (core.py:207-214)
  — so agents with ``accel=a`` feel ``a**2 * u`` while agents with the
  default ``accel=None`` feel ``5.0 * u``;
* ``simple_adversary``'s asymmetric rewards: good agents get *distances*
  (positive for far adversaries), the adversary gets *squared* distance;
* ``simple_reference`` / ``simple_speaker_listener`` are ``collaborative``
  worlds, so the env hands every agent the SUM of per-agent rewards
  (environment.py:151-154) — for speaker_listener that doubles the shared
  term;
* ``simple_crypto`` agents are all immovable and all speak (dim_c=4); the
  reward gates on "has this agent ever uttered" via the all-zeros check
  (simple_crypto.py:104-120);
* ``simple_world_comm``'s forest visibility masking (observation:253-262),
  its dead ``prey_forest`` blocks (computed upstream but never concatenated,
  :264-278 — not reproduced), and the good agents' ``+0.05 * min dist to
  food`` term that *rewards being far from food* (simple_world_comm.py:180);
* ``simple_attack`` is NOT runnable upstream: its rewards call ``bound(x)``
  as a global that doesn't exist (simple_attack.py:90-119 define ``bound``
  as a method whose ``self`` is shadowed by ``x``) — behavior reconstructed
  with ``bound`` as the obvious static function, documented here in lieu of
  golden parity.  Its adversaries are *penalized* −0.5 per (good, adv)
  colliding pair (simple_attack.py:136-140), unlike tag.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from .mpe_classic import _ACTION_TABLE

Array = jax.Array

_DAMPING = 0.25
_DT = 0.1
_CONTACT_FORCE = 1e2
_CONTACT_MARGIN = 1e-3


# ---------------------------------------------------------------------------
# shared physics / helpers
# ---------------------------------------------------------------------------


def _agent_agent_forces(pos: Array, sizes: Array, collide: Array) -> Array:
    """Pairwise softmax-penetration forces among agents (core.py:264-295).

    ``collide`` is a per-agent bool; a pair interacts only if both collide.
    Equal masses, so the force ratios are +1/-1."""
    n = pos.shape[0]
    dtype = pos.dtype
    dvec = pos[:, None, :] - pos[None, :, :]
    dist = jnp.where(jnp.eye(n, dtype=bool), 1.0, jnp.linalg.norm(dvec, axis=-1))
    dmin = sizes[:, None] + sizes[None, :]
    pen = jnp.logaddexp(0.0, -(dist - dmin) / _CONTACT_MARGIN) * _CONTACT_MARGIN
    f = _CONTACT_FORCE * dvec / dist[..., None] * pen[..., None]
    mask = (collide[:, None] & collide[None, :]) & ~jnp.eye(n, dtype=bool)
    f = jnp.where(mask[..., None], f, jnp.zeros((), dtype))
    return f.sum(axis=1)


def _agent_landmark_forces(
    pos: Array, sizes: Array, collide: Array, lm_pos: Array, lm_sizes: Array,
    lm_collide: Array,
) -> Array:
    """Forces solid (collide, immovable) landmarks exert on agents."""
    dvec = pos[:, None, :] - lm_pos[None, :, :]
    dist = jnp.maximum(jnp.linalg.norm(dvec, axis=-1), 1e-9)
    dmin = sizes[:, None] + lm_sizes[None, :]
    pen = jnp.logaddexp(0.0, -(dist - dmin) / _CONTACT_MARGIN) * _CONTACT_MARGIN
    f = _CONTACT_FORCE * dvec / dist[..., None] * pen[..., None]
    mask = collide[:, None] & lm_collide[None, :]
    f = jnp.where(mask[..., None], f, jnp.zeros((), pos.dtype))
    return f.sum(axis=1)


def _integrate(pos, vel, force, movable, max_speed=None):
    """Damped-Euler integration with optional per-agent speed cap
    (core.py:239-252); immovable agents stay put."""
    new_vel = vel * (1 - _DAMPING) + force * _DT
    if max_speed is not None:
        speed = jnp.linalg.norm(new_vel, axis=-1, keepdims=True)
        cap = max_speed[:, None]
        new_vel = jnp.where(
            speed > cap, new_vel / jnp.maximum(speed, 1e-12) * cap, new_vel
        )
    new_vel = jnp.where(movable[:, None], new_vel, vel)
    new_pos = jnp.where(movable[:, None], pos + new_vel * _DT, pos)
    return new_pos, new_vel


def _move_force(action_move: Array, mult: Array, dtype) -> Array:
    """Decode discrete move index -> physical force, per-agent multiplier
    (sensitivity x accel quirk folded into ``mult``)."""
    u = jnp.take(_ACTION_TABLE.astype(dtype), action_move, axis=0)
    return u * jnp.reshape(mult, (-1, 1)).astype(dtype)


def _bound(x: Array) -> Array:
    """Escape-the-arena penalty curve (simple_tag.py:63-69 and clones)."""
    return jnp.where(
        x < 0.9,
        0.0,
        jnp.where(x < 1.0, (x - 0.9) * 10.0, jnp.minimum(jnp.exp(2 * x - 2), 10.0)),
    )


def _autoreset(reset_fn, obs_fn, state, obs, done):
    """Swap in a freshly-reset state/obs when the episode ends, mirroring the
    subprocess worker's in-place reset (env_wrappers.py:866-870)."""
    key, rkey = jax.random.split(state.key)
    fresh = reset_fn(rkey)
    all_done = jnp.all(done)
    state = jax.tree.map(
        lambda f, s: jnp.where(jnp.reshape(all_done, (1,) * f.ndim), f, s),
        fresh,
        state.replace(key=key),
    )
    obs = jnp.where(all_done, obs_fn(fresh), obs)
    return state, obs


def _pad_rows(rows, width):
    return jnp.stack([jnp.pad(r, (0, width - r.shape[0])) for r in rows])


def _onehot_row(idx, table):
    """Gather ``table[idx]`` with a traced scalar via one-hot matvec
    (dynamic-slice gathers are slow / fragile on TPU under vmap)."""
    return jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype) @ table


# ---------------------------------------------------------------------------
# simple_adversary — physical deception (1 adversary, N-1 landmarks)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AdversaryParams:
    num_agents: int = 3  # agent 0 is the adversary (simple_adversary.py:23)
    episode_length: int = 25

    @property
    def num_landmarks(self) -> int:
        return self.num_agents - 1

    @property
    def obs_dim(self) -> int:
        # good row: [goal_rel(2), lm rels, other rels]; adversary row is 2 shorter
        return 2 + 2 * self.num_landmarks + 2 * (self.num_agents - 1)

    @property
    def num_actions(self) -> int:
        return 5

    @property
    def action_nvec(self):
        return (5,)


@struct.dataclass
class AdversaryState:
    agent_pos: Array  # (N, 2)
    agent_vel: Array  # (N, 2)
    landmark_pos: Array  # (L, 2)
    goal: Array  # () int32 — index of the goal landmark
    t: Array
    key: Array


def adversary_reset(params: AdversaryParams, key: Array, dtype=jnp.float32) -> AdversaryState:
    """simple_adversary.reset_world:36-53: goal = random landmark, agents and
    landmarks all ~ U(-1,1)^2 (landmarks NOT scaled by 0.8 here)."""
    key, kg, ka, kl = jax.random.split(key, 4)
    return AdversaryState(
        agent_pos=jax.random.uniform(ka, (params.num_agents, 2), dtype, -1.0, 1.0),
        agent_vel=jnp.zeros((params.num_agents, 2), dtype),
        landmark_pos=jax.random.uniform(kl, (params.num_landmarks, 2), dtype, -1.0, 1.0),
        goal=jax.random.randint(kg, (), 0, params.num_landmarks),
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def adversary_observations(params: AdversaryParams, state: AdversaryState) -> Array:
    """simple_adversary.observation:119-137 — good agents see [goal_rel, lm
    rels, other rels]; the adversary sees [lm rels, other rels] (no goal, no
    velocity for anyone).  Rows zero-padded to the good width."""
    n = params.num_agents
    goal_pos = _onehot_row(state.goal, state.landmark_pos)
    rel_lm = (state.landmark_pos[None] - state.agent_pos[:, None]).reshape(n, -1)
    rows = []
    for i in range(n):
        others = [state.agent_pos[j] - state.agent_pos[i] for j in range(n) if j != i]
        rel_o = jnp.concatenate(others)
        if i == 0:  # adversary
            rows.append(jnp.concatenate([rel_lm[i], rel_o]))
        else:
            rows.append(jnp.concatenate([goal_pos - state.agent_pos[i], rel_lm[i], rel_o]))
    return _pad_rows(rows, params.obs_dim)


def adversary_rewards(params: AdversaryParams, state: AdversaryState) -> Array:
    """simple_adversary.reward:74-116 (shaped branches): good agents share
    ``-min_good dist(a, goal) + sum_adv dist(adv, goal)``; the adversary gets
    ``-dist^2(adv, goal)`` (squared — asymmetric on purpose)."""
    n = params.num_agents
    goal_pos = _onehot_row(state.goal, state.landmark_pos)
    d = jnp.linalg.norm(state.agent_pos - goal_pos[None], axis=-1)
    adv_rew = d[0]  # single adversary
    pos_rew = -jnp.min(d[1:])
    good = pos_rew + adv_rew
    adv = -jnp.sum(jnp.square(state.agent_pos[0] - goal_pos))
    return jnp.concatenate([adv[None], jnp.broadcast_to(good, (n - 1,))]).astype(
        state.agent_pos.dtype
    )


def adversary_step(params: AdversaryParams, state: AdversaryState, action: Array):
    """Actions: (N,) or (N,2) ints (move component only)."""
    dtype = state.agent_pos.dtype
    move = action[..., 0] if action.ndim == 2 else action
    n = params.num_agents
    force = _move_force(move, jnp.full((n,), 5.0), dtype)  # accel None -> 5.0
    movable = jnp.ones((n,), bool)
    pos, vel = _integrate(state.agent_pos, state.agent_vel, force, movable)
    state = state.replace(agent_pos=pos, agent_vel=vel, t=state.t + 1)

    obs = adversary_observations(params, state)
    rew = adversary_rewards(params, state)
    done = jnp.broadcast_to(state.t >= params.episode_length, (n,))
    state, obs = _autoreset(
        partial(adversary_reset, params, dtype=dtype),
        partial(adversary_observations, params),
        state, obs, done,
    )
    return state, (obs, rew, done)


# ---------------------------------------------------------------------------
# simple_push — keep-away (1 adversary pushes agents off the goal)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PushParams:
    num_agents: int = 2  # agent 0 is the adversary (simple_push.py:17-28)
    num_landmarks: int = 2
    episode_length: int = 25
    agent_size: float = 0.05  # Entity default (core.py:52)

    @property
    def obs_dim(self) -> int:
        # good row: [vel(2), goal_rel(2), color(3), lm rels, lm colors(3L), others]
        return 7 + 5 * self.num_landmarks + 2 * (self.num_agents - 1)

    @property
    def num_actions(self) -> int:
        return 5

    @property
    def action_nvec(self):
        return (5,)


@struct.dataclass
class PushState:
    agent_pos: Array
    agent_vel: Array
    landmark_pos: Array
    goal: Array  # () int32
    t: Array
    key: Array


def _push_landmark_colors(params: PushParams, dtype) -> Array:
    # landmark i color = [0.1,0.1,0.1] with [i+1] += 0.8 (simple_push.py:43-45)
    base = jnp.full((params.num_landmarks, 3), 0.1, dtype)
    idx = jnp.minimum(jnp.arange(params.num_landmarks) + 1, 2)
    return base + 0.8 * jax.nn.one_hot(idx, 3, dtype=dtype)


def push_reset(params: PushParams, key: Array, dtype=jnp.float32) -> PushState:
    """simple_push.reset_world:41-64: goal = random landmark; agents U(-1,1),
    landmarks 0.8*U(-1,1)."""
    key, kg, ka, kl = jax.random.split(key, 4)
    return PushState(
        agent_pos=jax.random.uniform(ka, (params.num_agents, 2), dtype, -1.0, 1.0),
        agent_vel=jnp.zeros((params.num_agents, 2), dtype),
        landmark_pos=0.8 * jax.random.uniform(kl, (params.num_landmarks, 2), dtype, -1.0, 1.0),
        goal=jax.random.randint(kg, (), 0, params.num_landmarks),
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def push_observations(params: PushParams, state: PushState) -> Array:
    """simple_push.observation:84-104.  Good agents additionally see their own
    color (keyed to the goal index: [0.25]*3 with [goal+1]+=0.5) and every
    landmark's constant color — that's how the goal is communicated."""
    n = params.num_agents
    dtype = state.agent_pos.dtype
    lm_colors = _push_landmark_colors(params, dtype)
    goal_pos = _onehot_row(state.goal, state.landmark_pos)
    goal_idx3 = jnp.minimum(state.goal + 1, 2)
    self_color = jnp.full((3,), 0.25, dtype) + 0.5 * jax.nn.one_hot(goal_idx3, 3, dtype=dtype)
    rel_lm = (state.landmark_pos[None] - state.agent_pos[:, None]).reshape(n, -1)
    rows = []
    for i in range(n):
        rel_o = jnp.concatenate(
            [state.agent_pos[j] - state.agent_pos[i] for j in range(n) if j != i]
        )
        if i == 0:  # adversary: [vel, lm rels, other rels]
            rows.append(jnp.concatenate([state.agent_vel[i], rel_lm[i], rel_o]))
        else:
            rows.append(
                jnp.concatenate(
                    [state.agent_vel[i], goal_pos - state.agent_pos[i], self_color,
                     rel_lm[i], lm_colors.reshape(-1), rel_o]
                )
            )
    return _pad_rows(rows, params.obs_dim)


def push_rewards(params: PushParams, state: PushState) -> Array:
    """simple_push.reward:66-82: good ``-dist(a, goal)``; adversary
    ``min_good dist(good, goal) - dist(adv, goal)``."""
    goal_pos = _onehot_row(state.goal, state.landmark_pos)
    d = jnp.linalg.norm(state.agent_pos - goal_pos[None], axis=-1)
    adv = jnp.min(d[1:]) - d[0]
    return jnp.concatenate([adv[None], -d[1:]]).astype(state.agent_pos.dtype)


def push_step(params: PushParams, state: PushState, action: Array):
    dtype = state.agent_pos.dtype
    move = action[..., 0] if action.ndim == 2 else action
    n = params.num_agents
    force = _move_force(move, jnp.full((n,), 5.0), dtype)
    sizes = jnp.full((n,), params.agent_size, dtype)
    collide = jnp.ones((n,), bool)
    force = force + _agent_agent_forces(state.agent_pos, sizes, collide)
    pos, vel = _integrate(state.agent_pos, state.agent_vel, force, jnp.ones((n,), bool))
    state = state.replace(agent_pos=pos, agent_vel=vel, t=state.t + 1)

    obs = push_observations(params, state)
    rew = push_rewards(params, state)
    done = jnp.broadcast_to(state.t >= params.episode_length, (n,))
    state, obs = _autoreset(
        partial(push_reset, params, dtype=dtype),
        partial(push_observations, params),
        state, obs, done,
    )
    return state, (obs, rew, done)


# ---------------------------------------------------------------------------
# simple_reference — 2 symmetric speaker-movers, dim_c = 10, collaborative
# ---------------------------------------------------------------------------

_REFERENCE_LM_COLORS = jnp.asarray(
    [[0.75, 0.25, 0.25], [0.25, 0.75, 0.25], [0.25, 0.25, 0.75]]
)


@dataclasses.dataclass(frozen=True)
class ReferenceParams:
    num_agents: int = 2  # hard requirement (simple_reference.py:15)
    num_landmarks: int = 3
    episode_length: int = 25
    dim_c: int = 10

    @property
    def obs_dim(self) -> int:
        # [vel(2), lm rels(2L), goal color(3), other comm(C)]
        return 2 + 2 * self.num_landmarks + 3 + self.dim_c

    @property
    def action_nvec(self):
        return (5, self.dim_c)  # MultiDiscrete [move, comm]


@struct.dataclass
class ReferenceState:
    agent_pos: Array  # (2, 2)
    agent_vel: Array
    comm: Array  # (2, C) — published utterances
    landmark_pos: Array  # (L, 2)
    goal_b: Array  # (2,) int32: agent i wants the OTHER agent at lm goal_b[i]
    t: Array
    key: Array


def reference_reset(params: ReferenceParams, key: Array, dtype=jnp.float32) -> ReferenceState:
    key, kg, ka, kl = jax.random.split(key, 4)
    return ReferenceState(
        agent_pos=jax.random.uniform(ka, (2, 2), dtype, -1.0, 1.0),
        agent_vel=jnp.zeros((2, 2), dtype),
        comm=jnp.zeros((2, params.dim_c), dtype),
        landmark_pos=0.8 * jax.random.uniform(kl, (params.num_landmarks, 2), dtype, -1.0, 1.0),
        goal_b=jax.random.randint(kg, (2,), 0, params.num_landmarks),
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def reference_observations(params: ReferenceParams, state: ReferenceState) -> Array:
    """simple_reference.observation:69-97: [own vel, lm rels, own goal_b's
    color, the other agent's utterance]."""
    dtype = state.agent_pos.dtype
    colors = _REFERENCE_LM_COLORS.astype(dtype)[: params.num_landmarks]
    rel_lm = (state.landmark_pos[None] - state.agent_pos[:, None]).reshape(2, -1)
    rows = []
    for i in range(2):
        goal_color = _onehot_row(state.goal_b[i], colors)
        rows.append(
            jnp.concatenate([state.agent_vel[i], rel_lm[i], goal_color, state.comm[1 - i]])
        )
    return jnp.stack(rows)


def reference_rewards(params: ReferenceParams, state: ReferenceState) -> Array:
    """reward(agent i) = -||pos_other - lm[goal_b_i]||^2; the collaborative
    world then hands BOTH agents the sum (environment.py:151-154)."""
    r = []
    for i in range(2):
        target = _onehot_row(state.goal_b[i], state.landmark_pos)
        r.append(-jnp.sum(jnp.square(state.agent_pos[1 - i] - target)))
    total = r[0] + r[1]
    return jnp.broadcast_to(total, (2,)).astype(state.agent_pos.dtype)


def reference_step(params: ReferenceParams, state: ReferenceState, action: Array):
    """Actions (2, 2) int: [move_idx, comm_idx] per agent."""
    dtype = state.agent_pos.dtype
    force = _move_force(action[:, 0], jnp.full((2,), 5.0), dtype)
    pos, vel = _integrate(state.agent_pos, state.agent_vel, force, jnp.ones((2,), bool))
    comm = jax.nn.one_hot(action[:, 1], params.dim_c, dtype=dtype)
    state = state.replace(agent_pos=pos, agent_vel=vel, comm=comm, t=state.t + 1)

    obs = reference_observations(params, state)
    rew = reference_rewards(params, state)
    done = jnp.broadcast_to(state.t >= params.episode_length, (2,))
    state, obs = _autoreset(
        partial(reference_reset, params, dtype=dtype),
        partial(reference_observations, params),
        state, obs, done,
    )
    return state, (obs, rew, done)


# ---------------------------------------------------------------------------
# simple_speaker_listener — immobile speaker (dim_c=3) guides a mute mover
# ---------------------------------------------------------------------------

_SPEAKER_LM_COLORS = jnp.asarray(
    [[0.65, 0.15, 0.15], [0.15, 0.65, 0.15], [0.15, 0.15, 0.65]]
)


@dataclasses.dataclass(frozen=True)
class SpeakerListenerParams:
    num_agents: int = 2  # agent 0 speaker (immovable), agent 1 listener (silent)
    num_landmarks: int = 3
    episode_length: int = 25
    dim_c: int = 3

    @property
    def obs_dim(self) -> int:
        # listener row: [vel(2), lm rels(2L), comm(C)]; speaker row: color(3)
        return 2 + 2 * self.num_landmarks + self.dim_c

    @property
    def action_nvec(self):
        # shared-policy superset: [move, comm]; the env ignores the speaker's
        # move and the listener's comm (upstream uses per-agent ragged spaces
        # with separated policies)
        return (5, self.dim_c)


@struct.dataclass
class SpeakerListenerState:
    agent_pos: Array  # (2, 2)
    agent_vel: Array
    comm: Array  # (C,) — the speaker's channel
    landmark_pos: Array
    goal: Array  # () int32 — landmark the listener must reach
    t: Array
    key: Array


def speaker_listener_reset(
    params: SpeakerListenerParams, key: Array, dtype=jnp.float32
) -> SpeakerListenerState:
    """simple_speaker_listener.reset_world:38-63 (landmarks ~ U(-1,1), NOT
    scaled by 0.8 in this scenario)."""
    key, kg, ka, kl = jax.random.split(key, 4)
    return SpeakerListenerState(
        agent_pos=jax.random.uniform(ka, (2, 2), dtype, -1.0, 1.0),
        agent_vel=jnp.zeros((2, 2), dtype),
        comm=jnp.zeros((params.dim_c,), dtype),
        landmark_pos=jax.random.uniform(kl, (params.num_landmarks, 2), dtype, -1.0, 1.0),
        goal=jax.random.randint(kg, (), 0, params.num_landmarks),
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def speaker_listener_observations(
    params: SpeakerListenerParams, state: SpeakerListenerState
) -> Array:
    """simple_speaker_listener.observation:75-98: speaker sees only the goal
    landmark's color (3-dim); listener sees [vel, lm rels, speaker comm]."""
    dtype = state.agent_pos.dtype
    colors = _SPEAKER_LM_COLORS.astype(dtype)[: params.num_landmarks]
    goal_color = _onehot_row(state.goal, colors)
    rel_lm = (state.landmark_pos - state.agent_pos[1][None]).reshape(-1)
    listener = jnp.concatenate([state.agent_vel[1], rel_lm, state.comm])
    return _pad_rows([goal_color, listener], params.obs_dim)


def speaker_listener_rewards(
    params: SpeakerListenerParams, state: SpeakerListenerState
) -> Array:
    """Both agents: -dist^2(listener, goal lm); the collaborative sum doubles
    it (each receives r0+r1 = 2x the shared term)."""
    target = _onehot_row(state.goal, state.landmark_pos)
    r = -jnp.sum(jnp.square(state.agent_pos[1] - target))
    return jnp.broadcast_to(2.0 * r, (2,)).astype(state.agent_pos.dtype)


def speaker_listener_step(
    params: SpeakerListenerParams, state: SpeakerListenerState, action: Array
):
    """Actions (2, 2) int: agent 0 uses [., comm_idx], agent 1 [move_idx, .]."""
    dtype = state.agent_pos.dtype
    force = _move_force(action[:, 0], jnp.full((2,), 5.0), dtype)
    movable = jnp.asarray([False, True])
    pos, vel = _integrate(state.agent_pos, state.agent_vel, force, movable)
    comm = jax.nn.one_hot(action[0, 1], params.dim_c, dtype=dtype)
    state = state.replace(agent_pos=pos, agent_vel=vel, comm=comm, t=state.t + 1)

    obs = speaker_listener_observations(params, state)
    rew = speaker_listener_rewards(params, state)
    done = jnp.broadcast_to(state.t >= params.episode_length, (2,))
    state, obs = _autoreset(
        partial(speaker_listener_reset, params, dtype=dtype),
        partial(speaker_listener_observations, params),
        state, obs, done,
    )
    return state, (obs, rew, done)


# ---------------------------------------------------------------------------
# simple_crypto — alice/bob/eve over a 4-dim channel; nobody moves
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CryptoParams:
    num_agents: int = 3  # 0 = eve (adversary), 1 = bob, 2 = alice (speaker)
    num_landmarks: int = 2
    episode_length: int = 25
    dim_c: int = 4

    @property
    def obs_dim(self) -> int:
        return 2 * self.dim_c  # alice [goal(4), key(4)]; others padded

    @property
    def action_nvec(self):
        return (self.dim_c,)  # comm-only (nobody moves)


@struct.dataclass
class CryptoState:
    agent_pos: Array  # (3, 2) — static (all immovable), kept for rendering
    comm: Array  # (3, C)
    landmark_pos: Array
    goal: Array  # () int32 — landmark whose color is the secret
    crypt_key: Array  # () int32 — landmark whose color is the shared key
    t: Array
    key: Array


def _crypto_colors(params: CryptoParams, dtype) -> Array:
    # landmark i color = e_i in dim_c space (simple_crypto.py:55-59)
    return jnp.eye(params.dim_c, dtype=dtype)[: params.num_landmarks]


def crypto_reset(params: CryptoParams, key: Array, dtype=jnp.float32) -> CryptoState:
    key, kg, kk, ka, kl = jax.random.split(key, 5)
    return CryptoState(
        agent_pos=jax.random.uniform(ka, (params.num_agents, 2), dtype, -1.0, 1.0),
        comm=jnp.zeros((params.num_agents, params.dim_c), dtype),
        landmark_pos=jax.random.uniform(kl, (params.num_landmarks, 2), dtype, -1.0, 1.0),
        goal=jax.random.randint(kg, (), 0, params.num_landmarks),
        crypt_key=jax.random.randint(kk, (), 0, params.num_landmarks),
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def crypto_observations(params: CryptoParams, state: CryptoState) -> Array:
    """simple_crypto.observation:124-171: alice [goal_color, key]; bob [key,
    alice's utterance]; eve [alice's utterance] — only the speaker's channel
    is audible (``not other.speaker: continue``)."""
    dtype = state.comm.dtype
    colors = _crypto_colors(params, dtype)
    goal_color = _onehot_row(state.goal, colors)
    key_color = _onehot_row(state.crypt_key, colors)
    alice_c = state.comm[2]
    rows = [alice_c, jnp.concatenate([key_color, alice_c]),
            jnp.concatenate([goal_color, key_color])]
    # rows in agent order: eve(0), bob(1), alice(2)
    return _pad_rows(rows, params.obs_dim)


def crypto_rewards(params: CryptoParams, state: CryptoState) -> Array:
    """simple_crypto.reward:94-121.  Good agents (bob+alice): ``-||bob.c -
    goal||^2 + ||eve.c - goal||^2``; eve: ``-||eve.c - goal||^2``.  Terms gate
    on "has uttered yet" (all-zeros channel contributes 0)."""
    dtype = state.comm.dtype
    colors = _crypto_colors(params, dtype)
    goal_color = _onehot_row(state.goal, colors)
    bob_c, eve_c = state.comm[1], state.comm[0]
    bob_spoke = jnp.any(bob_c != 0)
    eve_spoke = jnp.any(eve_c != 0)
    good_rew = jnp.where(bob_spoke, -jnp.sum(jnp.square(bob_c - goal_color)), 0.0)
    adv_rew = jnp.where(eve_spoke, jnp.sum(jnp.square(eve_c - goal_color)), 0.0)
    good = good_rew + adv_rew
    eve = jnp.where(eve_spoke, -jnp.sum(jnp.square(eve_c - goal_color)), 0.0)
    return jnp.stack([eve, good, good]).astype(dtype)


def crypto_step(params: CryptoParams, state: CryptoState, action: Array):
    """Actions (3,) or (3,2) int comm indices (every agent speaks, nobody
    moves — simple_crypto.py:30-35)."""
    dtype = state.comm.dtype
    comm_idx = action[..., 1] if action.ndim == 2 else action
    comm = jax.nn.one_hot(comm_idx, params.dim_c, dtype=dtype)
    state = state.replace(comm=comm, t=state.t + 1)

    obs = crypto_observations(params, state)
    rew = crypto_rewards(params, state)
    done = jnp.broadcast_to(state.t >= params.episode_length, (params.num_agents,))
    state, obs = _autoreset(
        partial(crypto_reset, params, dtype=dtype),
        partial(crypto_observations, params),
        state, obs, done,
    )
    return state, (obs, rew, done)


# ---------------------------------------------------------------------------
# simple_attack — goal-seeking with adversary contact penalties
# (reference file is un-runnable: reward calls an undefined global ``bound``;
# reconstructed with the intended static bound curve)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AttackParams:
    num_adversaries: int = 3
    num_good: int = 1
    episode_length: int = 25
    agent_size: float = 0.075
    landmark_size: float = 0.2
    accel: float = 3.0
    max_speed: float = 1.0

    @property
    def num_agents(self) -> int:
        return self.num_adversaries + self.num_good

    @property
    def num_landmarks(self) -> int:
        return self.num_agents  # asserted equal upstream (simple_attack.py:14)

    @property
    def obs_dim(self) -> int:
        return 4 + 2 * self.num_landmarks + 4 * (self.num_agents - 1)

    @property
    def action_nvec(self):
        return (5,)


@struct.dataclass
class AttackState:
    agent_pos: Array
    agent_vel: Array
    landmark_pos: Array  # (N, 2); agent i's goal is landmark i
    t: Array
    key: Array


def attack_reset(params: AttackParams, key: Array, dtype=jnp.float32) -> AttackState:
    key, ka, kl = jax.random.split(key, 3)
    return AttackState(
        agent_pos=jax.random.uniform(ka, (params.num_agents, 2), dtype, -1.0, 1.0),
        agent_vel=jnp.zeros((params.num_agents, 2), dtype),
        landmark_pos=0.8 * jax.random.uniform(kl, (params.num_landmarks, 2), dtype, -1.0, 1.0),
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def attack_observations(params: AttackParams, state: AttackState) -> Array:
    """simple_attack.observation:148-163: symmetric [vel, pos, lm rels, other
    rels, other vels] — same width for every agent."""
    n = params.num_agents
    rel_lm = (state.landmark_pos[None] - state.agent_pos[:, None]).reshape(n, -1)
    rows = []
    for i in range(n):
        others = [j for j in range(n) if j != i]
        rel_o = jnp.concatenate([state.agent_pos[j] - state.agent_pos[i] for j in others])
        ov = jnp.concatenate([state.agent_vel[j] for j in others])
        rows.append(jnp.concatenate([state.agent_vel[i], state.agent_pos[i], rel_lm[i], rel_o, ov]))
    return jnp.stack(rows)


def attack_rewards(params: AttackParams, state: AttackState) -> Array:
    """simple_attack.reward:84-146 reconstructed.  Every agent: -dist to its
    own landmark, +0.5 inside it, minus the arena bound.  Good agents lose
    0.1 per adversary within 0.15 and another 0.5 per adversary in contact
    (same 0.15 radius at these sizes).  Adversaries lose 0.5 per (good, adv)
    colliding pair — attackers are penalized for contact in this variant."""
    n, na = params.num_agents, params.num_adversaries
    dtype = state.agent_pos.dtype
    goal_d = jnp.linalg.norm(state.agent_pos - state.landmark_pos, axis=-1)
    rew = -goal_d + 0.5 * (goal_d < params.landmark_size)
    rew = rew - _bound(jnp.abs(state.agent_pos)).sum(axis=-1)

    d = jnp.linalg.norm(state.agent_pos[:, None] - state.agent_pos[None, :], axis=-1)
    adv = jnp.arange(n) < na
    contact = (d < 2 * params.agent_size) & ~jnp.eye(n, dtype=bool)
    near = (d < 0.15) & ~jnp.eye(n, dtype=bool)
    # good agent i: sum over adversaries
    good_pen = 0.1 * (near & adv[None, :]).sum(axis=1) + 0.5 * (contact & adv[None, :]).sum(axis=1)
    pair_coll = (contact & adv[:, None] & ~adv[None, :]).sum()
    rew = jnp.where(adv, rew - 0.5 * pair_coll, rew - good_pen)
    return rew.astype(dtype)


def attack_step(params: AttackParams, state: AttackState, action: Array):
    dtype = state.agent_pos.dtype
    move = action[..., 0] if action.ndim == 2 else action
    n = params.num_agents
    # accel-applied-twice quirk: u * accel (sensitivity) * accel (force)
    force = _move_force(move, jnp.full((n,), params.accel**2), dtype)
    sizes = jnp.full((n,), params.agent_size, dtype)
    collide = jnp.ones((n,), bool)
    force = force + _agent_agent_forces(state.agent_pos, sizes, collide)
    force = force + _agent_landmark_forces(
        state.agent_pos, sizes, collide, state.landmark_pos,
        jnp.full((params.num_landmarks,), params.landmark_size, dtype),
        jnp.ones((params.num_landmarks,), bool),
    )
    pos, vel = _integrate(
        state.agent_pos, state.agent_vel, force, jnp.ones((n,), bool),
        jnp.full((n,), params.max_speed, dtype),
    )
    state = state.replace(agent_pos=pos, agent_vel=vel, t=state.t + 1)

    obs = attack_observations(params, state)
    rew = attack_rewards(params, state)
    done = jnp.broadcast_to(state.t >= params.episode_length, (n,))
    state, obs = _autoreset(
        partial(attack_reset, params, dtype=dtype),
        partial(attack_observations, params),
        state, obs, done,
    )
    return state, (obs, rew, done)


# ---------------------------------------------------------------------------
# simple_world_comm — led predators, food, forests, leader broadcast
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WorldCommParams:
    num_adversaries: int = 4  # agent 0 is the speaking leader
    num_good: int = 2
    num_landmarks: int = 1  # solid obstacles
    num_food: int = 2
    num_forests: int = 2
    episode_length: int = 25
    dim_c: int = 4
    adv_size: float = 0.075
    good_size: float = 0.045
    landmark_size: float = 0.2
    food_size: float = 0.03
    forest_size: float = 0.3
    adv_accel: float = 3.0
    good_accel: float = 4.0
    adv_max_speed: float = 1.0
    good_max_speed: float = 1.3

    @property
    def num_agents(self) -> int:
        return self.num_adversaries + self.num_good

    @property
    def num_entities(self) -> int:
        # world.landmarks grows to landmarks + food + forests upstream (:51-52)
        return self.num_landmarks + self.num_food + self.num_forests

    @property
    def obs_dim(self) -> int:
        # adversary/leader row: [vel(2), pos(2), entity rels, other rels,
        # good others' vels, in_forest(2), leader comm(C)]
        return (
            4 + 2 * self.num_entities + 2 * (self.num_agents - 1)
            + 2 * self.num_good + 2 + self.dim_c
        )

    @property
    def action_nvec(self):
        return (5, self.dim_c)


@struct.dataclass
class WorldCommState:
    agent_pos: Array  # (N, 2)
    agent_vel: Array
    comm: Array  # (C,) — the leader's broadcast
    landmark_pos: Array  # (num_landmarks, 2) solid obstacles
    food_pos: Array  # (num_food, 2)
    forest_pos: Array  # (num_forests, 2)
    t: Array
    key: Array


def world_comm_reset(params: WorldCommParams, key: Array, dtype=jnp.float32) -> WorldCommState:
    key, ka, kl, kf, kw = jax.random.split(key, 5)
    return WorldCommState(
        agent_pos=jax.random.uniform(ka, (params.num_agents, 2), dtype, -1.0, 1.0),
        agent_vel=jnp.zeros((params.num_agents, 2), dtype),
        comm=jnp.zeros((params.dim_c,), dtype),
        landmark_pos=0.8 * jax.random.uniform(kl, (params.num_landmarks, 2), dtype, -1.0, 1.0),
        food_pos=0.8 * jax.random.uniform(kf, (params.num_food, 2), dtype, -1.0, 1.0),
        forest_pos=0.8 * jax.random.uniform(kw, (params.num_forests, 2), dtype, -1.0, 1.0),
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def _wc_sizes(params: WorldCommParams, dtype) -> Array:
    import numpy as _np

    return jnp.asarray(
        _np.array([params.adv_size] * params.num_adversaries
                  + [params.good_size] * params.num_good), dtype,
    )


def world_comm_observations(params: WorldCommParams, state: WorldCommState) -> Array:
    """simple_world_comm.observation:225-288.  Entity rels cover obstacles +
    food + forests (upstream appends them all to world.landmarks).  Forest
    rule: another agent's position (and, if good, velocity) reads as zeros
    unless ego shares a forest with it, both are outside every forest, or ego
    is the leader.  Rows: adversaries end [..., good vels, in_forest, leader
    comm]; good agents end [..., in_forest, good-other vels] (ordering swap
    preserved) and are right-padded (no comm)."""
    p = params
    n, na = p.num_agents, p.num_adversaries
    dtype = state.agent_pos.dtype
    sizes = _wc_sizes(p, dtype)

    entity_pos = jnp.concatenate([state.landmark_pos, state.food_pos, state.forest_pos])
    # in-forest flags: strict < on size sums (is_collision:125-129)
    fd = jnp.linalg.norm(
        state.agent_pos[:, None, :] - state.forest_pos[None, :, :], axis=-1
    )
    in_forest = fd < (sizes[:, None] + p.forest_size)  # (N, F)
    any_forest = jnp.any(in_forest, axis=1)

    rows = []
    for i in range(n):
        rel_e = (entity_pos - state.agent_pos[i][None]).reshape(-1)
        others = [j for j in range(n) if j != i]
        op, ov = [], []
        for j in others:
            shares = jnp.any(in_forest[i] & in_forest[j])
            both_out = ~any_forest[i] & ~any_forest[j]
            visible = shares | both_out | (i == 0)  # leader sees everyone
            op.append(jnp.where(visible, state.agent_pos[j] - state.agent_pos[i],
                                jnp.zeros(2, dtype)))
            if j >= na:  # good agents' velocities
                ov.append(jnp.where(visible, state.agent_vel[j], jnp.zeros(2, dtype)))
        inf = jnp.where(in_forest[i], 1.0, -1.0).astype(dtype)
        head = [state.agent_vel[i], state.agent_pos[i], rel_e, jnp.concatenate(op)]
        if i < na:
            rows.append(jnp.concatenate(head + [jnp.concatenate(ov), inf, state.comm]))
        else:
            rows.append(jnp.concatenate(head + [inf, jnp.concatenate(ov)]))
    return _pad_rows(rows, p.obs_dim)


def world_comm_rewards(params: WorldCommParams, state: WorldCommState) -> Array:
    """simple_world_comm.reward:154-199.  Good: -5 per adversary contact,
    double bound penalty, +2 per food touched, +0.05 * min dist to food (the
    upstream sign quirk — farther food pays more).  Adversaries: -0.1 * dist
    to the nearest good agent, +5 per (good, adv) colliding pair."""
    p = params
    n, na = p.num_agents, p.num_adversaries
    dtype = state.agent_pos.dtype
    sizes = _wc_sizes(p, dtype)
    adv = jnp.arange(n) < na

    d = jnp.linalg.norm(state.agent_pos[:, None] - state.agent_pos[None, :], axis=-1)
    contact = (d < sizes[:, None] + sizes[None, :]) & ~jnp.eye(n, dtype=bool)
    adv_good = contact & adv[:, None] & ~adv[None, :]

    # good agents
    hits = adv_good.sum(axis=0).astype(dtype)  # per good agent
    bound_pen = 2.0 * _bound(jnp.abs(state.agent_pos)).sum(axis=-1)
    food_d = jnp.linalg.norm(
        state.agent_pos[:, None, :] - state.food_pos[None, :, :], axis=-1
    )
    food_touch = (food_d < sizes[:, None] + p.food_size).sum(axis=1).astype(dtype)
    good_rew = -5.0 * hits - bound_pen + 2.0 * food_touch + 0.05 * jnp.min(food_d, axis=1)

    # adversaries
    d_to_good = jnp.where(~adv[None, :], d, jnp.inf)
    shape = -0.1 * jnp.min(d_to_good, axis=1)
    pair_total = adv_good.sum().astype(dtype)
    adv_rew = shape + 5.0 * pair_total

    return jnp.where(adv, adv_rew, good_rew).astype(dtype)


def world_comm_step(params: WorldCommParams, state: WorldCommState, action: Array):
    """Actions (N, 2) int [move, comm]; only agent 0's comm is live."""
    p = params
    dtype = state.agent_pos.dtype
    n, na = p.num_agents, p.num_adversaries
    import numpy as _np

    accels = jnp.asarray(
        _np.array([p.adv_accel] * na + [p.good_accel] * p.num_good) ** 2, dtype
    )
    max_speed = jnp.asarray(
        _np.array([p.adv_max_speed] * na + [p.good_max_speed] * p.num_good), dtype
    )
    force = _move_force(action[:, 0], accels, dtype)
    sizes = _wc_sizes(p, dtype)
    collide = jnp.ones((n,), bool)
    force = force + _agent_agent_forces(state.agent_pos, sizes, collide)
    force = force + _agent_landmark_forces(
        state.agent_pos, sizes, collide, state.landmark_pos,
        jnp.full((p.num_landmarks,), p.landmark_size, dtype),
        jnp.ones((p.num_landmarks,), bool),
    )
    pos, vel = _integrate(state.agent_pos, state.agent_vel, force,
                          jnp.ones((n,), bool), max_speed)
    comm = jax.nn.one_hot(action[0, 1], p.dim_c, dtype=dtype)
    state = state.replace(agent_pos=pos, agent_vel=vel, comm=comm, t=state.t + 1)

    obs = world_comm_observations(p, state)
    rew = world_comm_rewards(p, state)
    done = jnp.broadcast_to(state.t >= p.episode_length, (n,))
    state, obs = _autoreset(
        partial(world_comm_reset, p, dtype=dtype),
        partial(world_comm_observations, p),
        state, obs, done,
    )
    return state, (obs, rew, done)


# ---------------------------------------------------------------------------
# registry — uniform jitted single/vector wrappers
# ---------------------------------------------------------------------------


class ScenarioEnv:
    """Jitted single/vector env for any scenario in this module."""

    def __init__(self, params, reset_fn, step_fn, dtype=jnp.float32):
        self.params = params
        self.dtype = dtype
        self.reset = jax.jit(partial(reset_fn, params, dtype=dtype))
        self.step = jax.jit(partial(step_fn, params))
        self.vec_reset = jax.jit(jax.vmap(partial(reset_fn, params, dtype=dtype)))
        self.vec_step = jax.jit(jax.vmap(partial(step_fn, params)))


SCENARIOS = {
    "simple_adversary": (AdversaryParams, adversary_reset, adversary_step),
    "simple_push": (PushParams, push_reset, push_step),
    "simple_reference": (ReferenceParams, reference_reset, reference_step),
    "simple_speaker_listener": (
        SpeakerListenerParams, speaker_listener_reset, speaker_listener_step,
    ),
    "simple_crypto": (CryptoParams, crypto_reset, crypto_step),
    "simple_attack": (AttackParams, attack_reset, attack_step),
    "simple_world_comm": (WorldCommParams, world_comm_reset, world_comm_step),
}


def make_scenario(name: str, dtype=jnp.float32, **overrides) -> ScenarioEnv:
    params_cls, reset_fn, step_fn = SCENARIOS[name]
    return ScenarioEnv(params_cls(**overrides), reset_fn, step_fn, dtype=dtype)
