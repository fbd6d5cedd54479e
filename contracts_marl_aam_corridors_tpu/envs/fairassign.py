"""Fair-assignment formation scenario
(reference ``nav_fairassign_fairrew_formation_graph_rotate_tube.py``).

Key behaviors: every step, agent 0's reward re-solves the agent->landmark
assignment over the pairwise-distance cost matrix (ref:760-768; the external
Gurobi ``solve_fair_assignment`` is NOT in the repo, so — like the in-repo
``v4oct`` scenario which falls back to ``scipy.optimize.linear_sum_assignment``
— we use the min-sum optimal assignment, computed by brute force over the n!
permutations, exact and jittable for n <= 7).  Landmark occupancy bookkeeping
runs inside each agent's OBSERVATION (ref ``get_agent_nearby_goals``-style
block :905-1009) with the 1.0 "occupied" sentinel, and the reward uses a
geometric phase machine whose ``passed_tube = dot(pos-exit, e) < 0`` (ref
:751-760) makes pre-entrance agents read as phase 2 — a reference quirk
preserved as-is (the observation's phase uses the y-test instead, :1018-1025).

Like the sequential family, this scenario is not runnable upstream (missing
``marl_fair_assign`` import), so tests are behavioral, not golden parity.
"""
from __future__ import annotations

import itertools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..config.physics import DynamicsType
from . import dynamics
from . import tube as tube_mod
from .types import EnvParams, EnvState, TubeParams

Array = jax.Array

MIN_OBS_DIST = 0.5  # config.py:201 default


def optimal_assignment(costs: Array) -> Array:
    """Min-sum agent->goal assignment by exhaustive permutation search.

    Exact for the scenario's n x n case; n! is tiny for n <= 7.  Replaces the
    absent Gurobi ``solve_fair_assignment`` (see module docstring).
    """
    n = costs.shape[0]
    if n > 7:
        # greedy fallback documented for larger fleets: iteratively pick the
        # globally-smallest remaining (agent, goal) pair
        def body(carry, _):
            c, assign = carry
            idx = jnp.argmin(c)
            a, g = idx // n, idx % n
            assign = assign.at[a].set(g)
            c = c.at[a, :].set(jnp.inf).at[:, g].set(jnp.inf)
            return (c, assign), None

        (_, assign), _ = jax.lax.scan(
            body, (costs, jnp.zeros((n,), jnp.int32)), None, length=n
        )
        return assign
    perms = jnp.asarray(list(itertools.permutations(range(n))), jnp.int32)  # (n!, n)
    total = jnp.take_along_axis(
        jnp.broadcast_to(costs[None], (perms.shape[0],) + costs.shape),
        perms[:, :, None],
        axis=2,
    )[:, :, 0].sum(axis=1)
    return perms[jnp.argmin(total)]


def in_tube(tube: TubeParams, pos: Array) -> Array:
    """ref ``is_in_tube``: projection onto the (un-epsiloned) tube axis."""
    span = tube.exit - tube.entrance
    L = jnp.linalg.norm(span)
    e = span / L
    r = pos - tube.entrance
    proj = r @ e
    perp = jnp.linalg.norm(r - proj[..., None] * e, axis=-1)
    return (proj >= 0) & (proj <= L) & (perp <= tube.width / 2)


def phase_reward(tube: TubeParams, pos: Array) -> Array:
    """Reward-side phase (ref:744-760): passed = dot(pos-exit, e) < 0."""
    span = tube.exit - tube.entrance
    e = span / jnp.linalg.norm(span)
    passed = (pos - tube.exit) @ e < 0
    it = in_tube(tube, pos)
    return jnp.where(it, 1, jnp.where(passed, 2, 0)).astype(jnp.int32)


def phase_obs(tube: TubeParams, pos: Array) -> Array:
    """Observation-side phase (ref:1018-1025): passed = y < exit_y."""
    it = in_tube(tube, pos)
    passed = pos[..., 1] < tube.exit[1]
    return jnp.where(it, 1, jnp.where(passed, 2, 0)).astype(jnp.int32)


def _nearby_goals(params: EnvParams, state: EnvState, values: Array, i):
    """Occupancy bookkeeping + goal choice for agent i's observation
    (ref:905-1009).  Mutates state.occupied / goal_history.  Returns
    (state, goal_pos_world, goal_occupied, second_closest_goal)."""
    L = params.num_landmarks
    dtype = values.dtype
    pos_i = values[i, :2]
    lm = state.landmark_pos
    occ = state.occupied
    hist = state.goal_history
    d = jnp.linalg.norm(lm - pos_i, axis=-1)
    order = jnp.argsort(d)
    chosen0 = order[0]
    second = order[1] if L > 1 else order[0]
    min_dist = d[chosen0]
    thresh = params.cfg.goal_threshold

    within = min_dist < MIN_OBS_DIST

    # -- branch A: a goal is within observation range --
    # A.1 reset falsely-occupied nearby goals (ref:924-935)
    prox = jnp.linalg.norm(
        lm[:, None, :] - values[None, :, :2], axis=-1
    )  # (L, n) distance of each goal to each agent
    prox_min = prox.min(axis=1)
    nearby = d < MIN_OBS_DIST
    falsely = nearby & (occ == 1.0) & ~(jnp.any(prox < thresh, axis=1))
    occ_a = jnp.where(falsely, 1.0 - prox_min, occ)

    # A.2 agent at its goal (ref:936-942)
    at_goal = min_dist < thresh
    occ_set = jnp.where(state.status[i], 1.0, 1.0 - min_dist)
    occ_a2 = occ_a.at[chosen0].set(jnp.where(at_goal, occ_set, occ_a[chosen0]))
    hist_a = hist.at[chosen0].set(jnp.where(at_goal, i, hist[chosen0]))

    # A.3 not at goal: occupancy refresh / divert to nearest unoccupied
    goal_prox_min = prox_min[chosen0]
    someone_at = jnp.any(prox[chosen0] < thresh)
    chosen_occ_full = occ_a2[chosen0] == 1.0
    # divert: nearest goal with occ != 1 (ref:947-952)
    free = occ_a2 != 1.0
    d_free = jnp.where(free, d, jnp.inf)
    divert_goal = jnp.argmin(d_free)
    refresh = ~at_goal & (
        (~chosen_occ_full) | (chosen_occ_full & ~someone_at)
    )
    occ_a3 = occ_a2.at[chosen0].set(
        jnp.where(refresh, 1.0 - goal_prox_min, occ_a2[chosen0])
    )
    divert = ~at_goal & chosen_occ_full & someone_at
    chosen_a = jnp.where(divert, divert_goal, chosen0)

    # -- branch B: no goal within range: nearest unoccupied, else self-pos --
    any_free = jnp.any(occ != 1.0)
    d_free_b = jnp.where(occ != 1.0, d, jnp.inf)
    chosen_b = jnp.argmin(d_free_b)
    occ_b = jnp.where(any_free, occ, jnp.zeros_like(occ))

    occ_new = jnp.where(within, occ_a3, occ_b)
    hist_new = jnp.where(within, hist_a, hist)
    chosen = jnp.where(within, chosen_a, jnp.where(any_free, chosen_b, i))
    goal_pos = jnp.where(
        within | any_free, state.landmark_pos[chosen], pos_i
    )
    goal_occupied = occ_new[chosen]
    state = state.replace(occupied=occ_new, goal_history=hist_new)
    return state, goal_pos, goal_occupied.astype(dtype), lm[second]


def observation_row(params: EnvParams, state: EnvState, values: Array, i):
    """19-dim obs (ref:883-1049): [vel, pos, rel_goal, occupied, rel_second,
    2 neighbors, rel_entrance, rel_exit, width, phase_obs].  Mutates
    occupancy state (call in agent order)."""
    cfg = params.cfg
    pos = values[:, :2]
    vel = dynamics.velocity_of(values, cfg)
    n = params.num_agents
    tube = state.tube

    rel = pos - pos[i]
    dists = jnp.where(jnp.arange(n) == i, jnp.inf, jnp.linalg.norm(rel, axis=-1))
    neighbors = rel[jnp.argsort(dists)[:2]].reshape(4)

    state, goal_pos, goal_occ, second = _nearby_goals(params, state, values, i)
    ph = phase_obs(tube, pos[i])
    obs = jnp.concatenate(
        [
            vel[i],
            pos[i],
            goal_pos - pos[i],
            goal_occ[None],
            second - pos[i],
            neighbors,
            tube.entrance - pos[i],
            tube.exit - pos[i],
            tube.width[None],
            jnp.asarray(ph, values.dtype)[None],
        ]
    )
    return state, obs


def node_obs_row(params: EnvParams, state: EnvState, values: Array, i) -> Array:
    """13-dim node features (ref ``_get_entity_feat_relative``:  [rel_vel(2),
    rel_pos(2), rel_goal(2), occupied(1), goal_history(1), rel_pos(2),
    rel_pos(2), type(1)]; agents' goal via the nearest/unoccupied rule
    WITHOUT mutating occupancy)."""
    cfg = params.cfg
    n, l, o = params.num_agents, params.num_landmarks, params.num_obstacles
    dtype = values.dtype
    pos = values[:, :2]
    vel = dynamics.velocity_of(values, cfg)
    entity_pos = jnp.concatenate([pos, state.landmark_pos, state.obstacle_pos], axis=0)
    entity_vel = jnp.concatenate([vel, jnp.zeros((l + o, 2), dtype)], axis=0)
    rel_pos = entity_pos - pos[i]
    rel_vel = entity_vel - vel[i]

    # per-agent goal selection (read-only variant of the occupancy rule)
    d = jnp.linalg.norm(pos[:, None, :] - state.landmark_pos[None, :, :], axis=-1)
    min_d = d.min(axis=1)
    nearest = jnp.argmin(d, axis=1)
    free = state.occupied != 1.0
    d_free = jnp.where(free[None, :], d, jnp.inf)
    nearest_free = jnp.argmin(d_free, axis=1)
    any_free = jnp.any(free)
    chosen = jnp.where(min_d < MIN_OBS_DIST, nearest, jnp.where(any_free, nearest_free, jnp.arange(n) % l))
    agent_goal = jnp.where(
        ((min_d < MIN_OBS_DIST) | any_free)[:, None],
        state.landmark_pos[chosen],
        pos,
    )
    agent_occ = state.occupied[chosen]
    agent_hist = state.goal_history[chosen].astype(dtype)

    rel_goal = jnp.concatenate([agent_goal - pos[i], rel_pos[n:]], axis=0)
    occupied = jnp.concatenate([agent_occ.astype(dtype), jnp.ones((l + o,), dtype)])[:, None]
    hist = jnp.concatenate(
        [agent_hist, jnp.arange(l, dtype=dtype), jnp.arange(o, dtype=dtype)]
    )[:, None]
    etype = jnp.concatenate(
        [jnp.zeros((n,), dtype), jnp.ones((l,), dtype), jnp.full((o,), 2.0, dtype)]
    )[:, None]
    return jnp.concatenate(
        [rel_vel, rel_pos, rel_goal, occupied, hist, rel_pos, rel_pos, etype], axis=-1
    )


def reward_one_agent(params: EnvParams, state: EnvState, values: Array, i: int):
    """Fairassign reward (ref:744-846), agent-id order."""
    cfg = params.cfg
    dtype = values.dtype
    n = params.num_agents
    pos = values[:, :2]
    pos_i = pos[i]
    tube = state.tube
    prev_i = state.prev_phase[i]

    cur = phase_reward(tube, pos_i)
    # phase_reached updated FIRST (ref:748-750)
    reached_i = jnp.maximum(state.phase_reached[i], cur)

    rew = jnp.zeros((), dtype)

    # agent 0 re-solves the fair assignment every step (ref:760-768)
    if n == params.num_landmarks:
        costs = jnp.linalg.norm(
            pos[:, None, :] - state.landmark_pos[None, :, :], axis=-1
        )
        assign = optimal_assignment(costs)
        goal_match = jnp.where(i == 0, assign, state.goal_match)
    else:
        goal_match = state.goal_match
    state = state.replace(goal_match=goal_match)

    # collisions x1 (ref:770-781)
    d_agents = jnp.linalg.norm(pos - pos_i, axis=-1)
    colliding = (
        (d_agents < cfg.separation_distance)
        & ~state.status
        & ~state.status[i]
        & (jnp.arange(n) != i)
    )
    rew -= params.collision_rew * jnp.sum(colliding).astype(dtype)
    if params.num_obstacles:
        d_obs = jnp.linalg.norm(state.obstacle_pos - pos_i, axis=-1)
        rew -= params.collision_rew * jnp.any(d_obs < 2 * (0.06 + 0.06)).astype(dtype)

    # global y-sort spacing, desired = (entrance_y - exit_y)/(n+1) (ref:783-793)
    tube_length = tube.entrance[1] - tube.exit[1]
    desired = tube_length / (n + 1)
    y = pos[:, 1]
    order = jnp.argsort(-y, stable=True)
    rank = jnp.argsort(order, stable=True)[i]
    has_front = rank < n - 1
    has_back = rank > 0
    front_idx = order[jnp.minimum(rank + 1, n - 1)]
    back_idx = order[jnp.maximum(rank - 1, 0)]

    # skip penalty -g; transition +0.1g (ref:795-800; note the transition
    # check uses phase_reached == cur, already updated above)
    rew -= params.goal_rew * ((cur == 2) & (cur > prev_i + 1)).astype(dtype)
    rew += 0.1 * params.goal_rew * ((cur == prev_i + 1) & (reached_i == cur)).astype(dtype)

    is_p0, is_p1 = cur == 0, cur == 1
    rew -= is_p0.astype(dtype) * jnp.linalg.norm(tube.entrance - pos_i)

    # phase 1: |spacing diff| (abs, both signs — unlike the other scenarios)
    sf = jnp.abs(jnp.linalg.norm(pos[front_idx] - pos_i) - desired)
    sb = jnp.abs(jnp.linalg.norm(pos[back_idx] - pos_i) - desired)
    spacing = jnp.where(has_front, sf, 0.0) + jnp.where(has_back, sb, 0.0)
    rew -= is_p1.astype(dtype) * (
        spacing.astype(dtype) + jnp.linalg.norm(tube.exit - pos_i)
    )
    state = state.replace(
        spacing_violation=state.spacing_violation.at[i].add(
            (is_p1 & (spacing > 0)).astype(dtype)
        ),
        delta_spacing_sum=state.delta_spacing_sum + is_p1.astype(dtype) * spacing.astype(dtype),
        steps_in_corridor=state.steps_in_corridor.at[i].add(is_p1.astype(dtype)),
    )

    # phase 2: fair-goal seek, +g freeze (ref:820-832)
    goal_pos = state.landmark_pos[state.goal_match[i]]
    dist_goal = jnp.linalg.norm(pos_i - goal_pos)
    goal_branch = cur == 2
    newly = goal_branch & (dist_goal < cfg.goal_threshold) & ~state.status[i]
    rew += newly.astype(dtype) * params.goal_rew
    rew -= (goal_branch & (dist_goal >= cfg.goal_threshold)).astype(dtype) * dist_goal

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

    state = state.replace(
        status=state.status.at[i].set(state.status[i] | newly),
        goal_tracker=state.goal_tracker.at[i].set(
            jnp.where(newly, state.goal_match[i], state.goal_tracker[i])
        ),
        phase_reached=state.phase_reached.at[i].set(reached_i),
        prev_phase=state.prev_phase.at[i].set(cur),
        key=key,
    )
    rew = jnp.clip(rew, -2 * params.collision_rew, params.goal_rew)
    return rew, state, values
