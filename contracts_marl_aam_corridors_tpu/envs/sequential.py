"""Sequential two-/three-tube corridor scenarios.

Functional re-design of the reference's
``nav_metered_one_goal_graph_sequential{,_random,_split_tube}.py``: agents
traverse a vertical tube, then switch to a horizontal tube (right, coin-flip
left/right, or split by ``id % 3``), with their goal landmark re-placed past
the second tube's far end at switch time.

NOTE ON FIDELITY: these reference scenario files are **not runnable as
shipped** — they import the absent external ``marl_fair_assign`` module
(sequential:25) and call ``set_landmarks_in_point`` without its
``tube_angle`` positional arg (sequential:413, TypeError).  Behavior here is
reconstructed from the code; where the crash hides an unknowable choice we
use ``tube_angle = pi/2`` (tube 1's angle) for the initial point placement
and document it.  No golden parity is possible for this family.

Scenario variants (EnvParams.scenario):
    "sequential"        tube 2 to the right (sequential:533-541)
    "sequential_random" coin flip left/right (random:534-548)
    "sequential_split"  3 tubes; agent.id%3==0 -> left tube 2, else right
                        tube 1 (split:901-911)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.physics import DynamicsType
from . import dynamics
from .types import EnvParams, EnvState, TubeParams

Array = jax.Array

SEQ_SCENARIOS = ("sequential", "sequential_random", "sequential_split")


def num_tubes(params: EnvParams) -> int:
    return 3 if params.scenario == "sequential_split" else 2


def _tube_entry(entrance, exit_, width, angle, dtype) -> TubeParams:
    entrance = jnp.asarray(entrance, dtype)
    exit_ = jnp.asarray(exit_, dtype)
    span = exit_ - entrance
    frame_length = jnp.linalg.norm(span) + 1e-9
    e = span / frame_length
    n = jnp.stack([-e[1], e[0]])
    return TubeParams(
        entrance=entrance,
        exit=exit_,
        width=jnp.asarray(width, dtype),
        angle=jnp.asarray(angle, dtype),
        length=jnp.linalg.norm(span).astype(dtype),
        e=e.astype(dtype),
        n=n.astype(dtype),
        frame_length=frame_length.astype(dtype),
        half_width=jnp.asarray(width * 0.5, dtype),
    )


def make_tubes(params: EnvParams, key: Array, dtype) -> tuple[Array, TubeParams, Array]:
    """Build the stacked tube list (sequential ``setup_tube_params``:503-556).

    Returns (key, stacked TubeParams with leading axis num_tubes, tube_choice).
    """
    ws = params.world_size
    agent_size = 0.06
    width = max(3 * agent_size * 2.5, ws * 0.15)
    entrance1 = jnp.asarray([0.0, ws / 2 * 0.5], dtype)
    exit1 = jnp.asarray([0.0, -ws / 2 * 0.5], dtype)
    t1 = _tube_entry(entrance1, exit1, width, jnp.pi / 2, dtype)

    right_entrance = exit1 + jnp.asarray([ws / 5, -ws / 5], dtype)
    right_exit = jnp.asarray([ws * 0.5, -ws / 2 * 0.5 - ws / 5], dtype)
    left_entrance = exit1 + jnp.asarray([-ws / 5, -ws / 5], dtype)
    left_exit = jnp.asarray([-ws * 0.5, -ws / 2 * 0.5 - ws / 5], dtype)

    if params.scenario == "sequential_split":
        t2 = _tube_entry(right_entrance, right_exit, width, 0.0, dtype)
        t3 = _tube_entry(left_entrance, left_exit, width, 0.0, dtype)
        tubes = jax.tree.map(lambda *xs: jnp.stack(xs), t1, t2, t3)
        # split keeps the reset default tube_choice = 0 (reset_world:297)
        return key, tubes, jnp.zeros((), jnp.int32)
    if params.scenario == "sequential_random":
        key, ck = jax.random.split(key)
        choice = jax.random.randint(ck, (), 0, 2)
        ent = jnp.where(choice == 1, right_entrance, left_entrance)
        ext = jnp.where(choice == 1, right_exit, left_exit)
        t2 = _tube_entry(ent, ext, width, 0.0, dtype)
        tubes = jax.tree.map(lambda *xs: jnp.stack(xs), t1, t2)
        return key, tubes, choice.astype(jnp.int32)
    t2 = _tube_entry(right_entrance, right_exit, width, 0.0, dtype)
    tubes = jax.tree.map(lambda *xs: jnp.stack(xs), t1, t2)
    return key, tubes, jnp.ones((), jnp.int32)


def initial_landmarks(params: EnvParams, tubes: TubeParams, dtype) -> Array:
    """Initial point placement at tube-1's exit.

    The reference's call is broken (missing tube_angle); we use tube 1's
    angle pi/2: offset R(pi/2) @ [0, -ws/3] = [-ws/3, 0] from the exit.
    Only observed pre-switch (goals are re-placed per agent at switch time).
    """
    ws = params.world_size
    exit1 = jax.tree.map(lambda x: x[0], tubes).exit
    pos = exit1 + jnp.asarray([-ws / 3.0, 0.0], dtype)
    return jnp.broadcast_to(pos, (params.num_landmarks, 2)).astype(dtype)


def tube_of(tubes: TubeParams, idx: Array) -> TubeParams:
    return jax.tree.map(lambda x: x[idx], tubes)


def in_tube(tube: TubeParams, pos: Array) -> Array:
    """Axis-aligned membership (split ``is_in_tube``, min/max form)."""
    vertical = jnp.abs(jnp.abs(tube.angle) - jnp.pi / 2) < 1e-2
    hw = tube.width / 2
    in_v = (
        (tube.exit[1] <= pos[..., 1])
        & (pos[..., 1] <= tube.entrance[1])
        & (jnp.abs(pos[..., 0] - tube.entrance[0]) <= hw)
    )
    lo = jnp.minimum(tube.entrance[0], tube.exit[0])
    hi = jnp.maximum(tube.entrance[0], tube.exit[0])
    in_h = (
        (lo <= pos[..., 0])
        & (pos[..., 0] <= hi)
        & (jnp.abs(pos[..., 1] - tube.entrance[1]) <= hw)
    )
    return jnp.where(vertical, in_v, in_h)


def passed_tube(tube: TubeParams, pos: Array) -> Array:
    """Past the exit, direction from geometry (split ``get_agent_phase``)."""
    vertical = jnp.abs(jnp.abs(tube.angle) - jnp.pi / 2) < 1e-2
    rightward = tube.exit[0] > tube.entrance[0]
    passed_h = jnp.where(
        rightward, pos[..., 0] > tube.exit[0], pos[..., 0] < tube.exit[0]
    )
    return jnp.where(vertical, pos[..., 1] < tube.exit[1], passed_h)


def agent_phase(tube: TubeParams, pos: Array) -> Array:
    """Pure geometric 3-phase (sequential:1028-1053): no gates, no history."""
    it = in_tube(tube, pos)
    pt = passed_tube(tube, pos)
    return jnp.where(it, 1, jnp.where(pt, 2, 0)).astype(jnp.int32)


def _front_back(values: Array, i) -> tuple[Array, Array, Array, Array]:
    """Global descending-y ordering (sequential reward:803-812): front is the
    next-lower-y agent, back the next-higher-y one."""
    y = values[:, 1]
    order = jnp.argsort(-y, stable=True)
    rank = jnp.argsort(order, stable=True)[i]
    n = values.shape[0]
    has_front = rank < n - 1
    has_back = rank > 0
    front_idx = order[jnp.minimum(rank + 1, n - 1)]
    back_idx = order[jnp.maximum(rank - 1, 0)]
    return front_idx, back_idx, has_front, has_back


def _spacing_error(values: Array, i, desired: Array) -> Array:
    front_idx, back_idx, has_front, has_back = _front_back(values, i)
    pos = values[:, :2]
    df = jnp.linalg.norm(pos[front_idx] - pos[i]) - desired
    db = jnp.linalg.norm(pos[back_idx] - pos[i]) - desired
    err = jnp.where(has_front & (df < 0), jnp.abs(df), 0.0) + jnp.where(
        has_back & (db < 0), jnp.abs(db), 0.0
    )
    return err.astype(values.dtype)


def replaced_landmark(params: EnvParams, tubes: TubeParams, new_tube: Array, dtype) -> Array:
    """set_landmarks_in_point_seq (utils.py:196-228): the agent's goal moves
    to +-0.5*ws in x from the target tube's entrance.  sequential/random pass
    ``tube_params[-1]`` + global tube_choice; split passes the agent's own
    tube + its index as the parity selector."""
    ws = params.world_size
    if params.scenario == "sequential_split":
        ent = tube_of(tubes, new_tube).entrance
        parity = new_tube % 2
    else:
        last = jax.tree.map(lambda x: x[-1], tubes)
        ent = last.entrance
        # right tube <=> tube_choice 1; geometry encodes the same bit
        parity = (last.exit[0] > last.entrance[0]).astype(jnp.int32)
    dx = jnp.where(parity == 1, 0.5 * ws, -0.5 * ws)
    return jnp.stack([ent[0] + dx, ent[1]]).astype(dtype)


def observation_row(params: EnvParams, state: EnvState, values: Array, i) -> Array:
    """19-dim obs (sequential:1168-1266): [pos, vel, rel_goal, occupied,
    rel_goal(again), 2 nearest neighbors, rel_entrance, rel_exit, width,
    phase], all w.r.t. the agent's CURRENT tube."""
    cfg = params.cfg
    pos = values[:, :2]
    vel = dynamics.velocity_of(values, cfg)
    tube = tube_of(state.tubes, state.current_tube[i])
    goal = state.landmark_pos[state.goal_match[i]]
    rel_goal = goal - pos[i]
    occupied = state.occupied[state.goal_match[i]][None]

    n = params.num_agents
    rel = pos - pos[i]
    d = jnp.where(jnp.arange(n) == i, jnp.inf, jnp.linalg.norm(rel, axis=-1))
    order = jnp.argsort(d)[:2]
    neighbors = rel[order].reshape(4)

    phase = agent_phase(tube, pos[i])
    return jnp.concatenate(
        [
            pos[i],
            vel[i],
            rel_goal,
            occupied,
            rel_goal,
            neighbors,
            tube.entrance - pos[i],
            tube.exit - pos[i],
            tube.width[None],
            jnp.asarray(phase, values.dtype)[None],
        ]
    )


def node_obs_row(params: EnvParams, state: EnvState, values: Array, i) -> Array:
    """8-dim node features (sequential ``_get_entity_feat_relative``):
    agent goal = landmark_poses[entity.id]; occupied 0 for agents (the
    sequential obs path never marks occupancy), 1 for landmarks/obstacles."""
    cfg = params.cfg
    n, l, o = params.num_agents, params.num_landmarks, params.num_obstacles
    pos = values[:, :2]
    vel = dynamics.velocity_of(values, cfg)
    entity_pos = jnp.concatenate([pos, state.landmark_pos, state.obstacle_pos], axis=0)
    entity_vel = jnp.concatenate([vel, jnp.zeros((l + o, 2), values.dtype)], axis=0)
    rel_pos = entity_pos - pos[i]
    rel_vel = entity_vel - vel[i]
    agent_goal_rel = state.landmark_pos[jnp.arange(n) % l] - pos[i]
    rel_goal = jnp.concatenate([agent_goal_rel, rel_pos[n:]], axis=0)
    occ_agents = state.occupied[state.goal_match[jnp.arange(n)]]
    occupied = jnp.concatenate([occ_agents, jnp.ones((l + o,), values.dtype)])[:, None]
    etype = jnp.concatenate(
        [
            jnp.zeros((n,), values.dtype),
            jnp.ones((l,), values.dtype),
            jnp.full((o,), 2.0, values.dtype),
        ]
    )[:, None]
    return jnp.concatenate([rel_vel, rel_pos, rel_goal, occupied, etype], axis=-1)


def reward_one_agent(params: EnvParams, state: EnvState, values: Array, i: int):
    """Sequential reward (sequential:762-973), agent-id order with in-place
    mutations (tube switch + landmark re-placement visible to later agents)."""
    cfg = params.cfg
    dtype = values.dtype
    n = params.num_agents
    pos = values[:, :2]
    pos_i = pos[i]
    tube = tube_of(state.tubes, state.current_tube[i])
    prev_i = state.prev_phase[i]
    reached_i = state.phase_reached[i]

    cur = agent_phase(tube, pos_i)
    rew = jnp.zeros((), dtype)

    # collisions x4 agent / x3 obstacle (sequential:786-799)
    d_agents = jnp.linalg.norm(pos - pos_i, axis=-1)
    colliding = (
        (d_agents < cfg.separation_distance)
        & ~state.status
        & ~state.status[i]
        & (jnp.arange(n) != i)
    )
    rew -= params.collision_rew * 4 * jnp.sum(colliding).astype(dtype)
    if params.num_obstacles:
        d_obs = jnp.linalg.norm(state.obstacle_pos - pos_i, axis=-1)
        rew -= params.collision_rew * 3 * jnp.any(d_obs < 2 * (0.06 + 0.06)).astype(dtype)

    # tube "length" = entrance_y - exit_y of the CURRENT tube — 0 for the
    # horizontal tubes, a reference quirk preserved (sequential:801)
    tube_length = tube.entrance[1] - tube.exit[1]
    desired = tube_length / 5.0

    # skip penalty -3g (sequential:829-833)
    rew -= params.goal_rew * 3 * ((cur == 2) & (cur > prev_i + 1)).astype(dtype)

    # transition bonuses +3g (sequential:834-845)
    trans = (cur == prev_i + 1) & (reached_i == cur - 1)
    enter_ok = trans & (cur == 1) & (pos_i[1] >= tube.entrance[1] - 0.2 * tube_length)
    exit_ok = trans & (cur == 2)
    rew += params.goal_rew * 3 * (enter_ok | exit_ok).astype(dtype)

    spacing = _spacing_error(values, i, desired)
    is_p0, is_p1 = cur == 0, cur == 1

    # phase 0: -dist_to_entrance + spacing (sequential:847-866)
    rew -= is_p0.astype(dtype) * (jnp.linalg.norm(tube.entrance - pos_i) + spacing * params.formation_rew)

    # phase 1: spacing + -dist_to_exit (sequential:868-905)
    state = state.replace(
        spacing_violation=state.spacing_violation.at[i].add(
            (is_p1 & (spacing > 0)).astype(dtype)
        ),
        delta_spacing_sum=state.delta_spacing_sum + is_p1.astype(dtype) * spacing,
        steps_in_corridor=state.steps_in_corridor.at[i].add(is_p1.astype(dtype)),
    )
    rew -= is_p1.astype(dtype) * (
        spacing * params.formation_rew + jnp.linalg.norm(tube.exit - pos_i)
    )

    # phase 2 branches (sequential:907-940)
    demote = (cur == 2) & (reached_i == 0)
    switch = (cur == 2) & ~demote & (state.current_tube[i] == 0)
    goal_branch = (cur == 2) & ~demote & ~switch

    # tube switch: next tube + reset trackers + landmark re-placement
    if params.scenario == "sequential_split":
        new_tube_val = jnp.where(i % 3 == 0, 2, 1)
    else:
        new_tube_val = jnp.ones((), jnp.int32)
    new_tube = jnp.where(switch, new_tube_val, state.current_tube[i])
    new_goal_pos = replaced_landmark(params, state.tubes, new_tube, dtype)
    landmark_pos = state.landmark_pos.at[state.goal_match[i]].set(
        jnp.where(switch, new_goal_pos, state.landmark_pos[state.goal_match[i]])
    )
    # point_seq also zeroes ALL occupancy flags (utils.py:227)
    occupied = jnp.where(switch, jnp.zeros_like(state.occupied), state.occupied)
    reached_i = jnp.where(switch, 0, reached_i)
    prev_after_switch = jnp.where(switch, 0, prev_i)

    # goal seek on the final tube
    goal_pos = landmark_pos[state.goal_match[i]]
    dist_goal = jnp.linalg.norm(pos_i - goal_pos)
    at_goal = goal_branch & (dist_goal < cfg.goal_threshold)
    newly = at_goal & ~state.status[i]
    rew += newly.astype(dtype) * params.goal_rew * 5
    rew -= (goal_branch & (dist_goal >= cfg.goal_threshold)).astype(dtype) * dist_goal
    rew -= goal_branch.astype(dtype) * spacing * params.formation_rew

    key = state.key
    if cfg.dynamics == DynamicsType.DOUBLE_INTEGRATOR:
        reset_vals = values[i].at[2:].set(0.0)
    else:
        if params.parity_fixed_reset_theta is not None:
            theta = jnp.asarray(params.parity_fixed_reset_theta, dtype)
        else:
            key, tkey = jax.random.split(key)
            theta = jax.random.uniform(tkey, (), dtype, 0.0, 2 * jnp.pi)
        reset_vals = values[i].at[2].set(theta).at[3].set(cfg.v_min)
    values = values.at[i].set(jnp.where(newly, reset_vals, values[i]))

    # global formation-uniformity term, agent 0 only (sequential:941-957)
    if n >= 3:
        rel_all = pos[None, :, :] - pos[:, None, :]
        d_all = jnp.linalg.norm(rel_all, axis=-1)
        d_all = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d_all)
        two = jnp.sort(d_all, axis=-1)[:, :2].reshape(-1)
        rew -= (i == 0) * jnp.std(two) * params.formation_rew

    # conformance / phase trackers / regression (sequential:960-973)
    cur2 = jnp.where(demote | switch, 0, cur)
    state = state.replace(
        conformance=state.conformance.at[i].add(
            ((reached_i == 1) & (cur2 == 0)).astype(dtype)
        )
    )
    new_pr = jnp.maximum(reached_i, cur2)
    rew -= params.collision_rew * 3 * (cur2 < prev_after_switch).astype(dtype)
    rew -= params.collision_rew * (cur2 < new_pr).astype(dtype)

    state = state.replace(
        status=state.status.at[i].set(state.status[i] | newly),
        goal_tracker=state.goal_tracker.at[i].set(
            jnp.where(newly, state.goal_match[i], state.goal_tracker[i])
        ),
        current_tube=state.current_tube.at[i].set(new_tube),
        landmark_pos=landmark_pos,
        occupied=occupied,
        phase_reached=state.phase_reached.at[i].set(new_pr),
        prev_phase=state.prev_phase.at[i].set(cur2),
        key=key,
    )
    rew = jnp.clip(rew, -4 * params.collision_rew, params.goal_rew * 5)
    return rew, state, values
