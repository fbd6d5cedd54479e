"""The rotated-corridor scenario family as one pure, jittable step kernel.

Functional re-design of the reference's live step path — the composition of
``MultiAgentGraphEnv.step`` (multiagent/environment.py:1021-1063),
``World.step`` (multiagent/core.py:687-756) and the july scenario callbacks
``observation``/``reward``/``graph_observation``/``info_callback``
(custom_scenarios/nav_metered_one_goal_graph_rotate_tube_july.py).

The reference evaluates callbacks **per agent, in id order, with in-place
mutation**: agent i's reward sees status flips and velocity resets performed
by rewards of agents j<i within the same step, the phase machine is invoked
twice per agent per step (once from ``observation``, once from ``reward``)
and mutates ``previous_phase``, and every agent receives the *final* masked
adjacency matrix because the scenario zeroes ``world.cached_dist_mag`` in
place.  All of that ordering is load-bearing for bit-exact parity, so this
kernel reproduces it literally: observations (order-independent — each agent's
obs reads only its own mutable state) are vectorized, rewards run as an
unrolled loop over the (static, small) agent count, and the adjacency is
computed once from the post-loop state.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.physics import DynamicsType
from ..ops import distance as dist_ops
from . import actions as action_mod
from . import dynamics
from . import fairassign as fair_mod
from . import sequential as seq_mod
from . import tube as tube_mod
from .types import EnvParams, EnvState, TimeStep

Array = jax.Array

AGENT_SIZE = 0.06
ENTITY_AGENT, ENTITY_LANDMARK, ENTITY_OBSTACLE, ENTITY_WALL = 0.0, 1.0, 2.0, 3.0

# Wall geometry: the reference creates walls with the class DEFAULTS and
# never repositions them (july:315-323; core.py:354-368): horizontal,
# axis_pos 0.0, endpoints (-1, 1), width 0.1.  Multiple walls coincide.
WALL_AXIS_POS = 0.0
WALL_ENDPOINTS = (-1.0, 1.0)
WALL_WIDTH = 0.1


def _wall_positions(params: EnvParams, dtype) -> Array:
    """Nominal wall center positions for the entity distance matrix."""
    cx = (WALL_ENDPOINTS[0] + WALL_ENDPOINTS[1]) / 2.0
    return jnp.broadcast_to(
        jnp.asarray([cx, WALL_AXIS_POS], dtype), (params.num_walls, 2)
    )


def _entity_positions(params: EnvParams, pos: Array, state: EnvState) -> Array:
    parts = [pos, state.landmark_pos, state.obstacle_pos]
    if params.num_walls:
        parts.append(_wall_positions(params, pos.dtype))
    return jnp.concatenate(parts, axis=0)


def _wall_collision(pos_i: Array, entity_size: float = AGENT_SIZE) -> Array:
    """Axis-aligned wall collision with 1.5*size margins (july:877-890)."""
    m = 1.5 * entity_size
    in_y = (WALL_AXIS_POS - m <= pos_i[1]) & (pos_i[1] <= WALL_AXIS_POS + m)
    in_x = (WALL_ENDPOINTS[0] - m <= pos_i[0]) & (pos_i[0] <= WALL_ENDPOINTS[1] + m)
    return in_y & in_x


def _decrement_cooldown(cooldown: Array) -> Array:
    """Each ``get_agent_phase`` call decrements a positive cooldown (july:702-704)."""
    return cooldown - (cooldown > 0).astype(cooldown.dtype)


def _phase_all(params: EnvParams, state_tube, pos: Array, prev_phase: Array):
    return tube_mod.agent_phase(
        state_tube, pos, prev_phase, params.gate_front_ratio, params.gate_back_ratio
    )


def _obstacle_collision(params: EnvParams, state: EnvState, pos_i: Array) -> Array:
    """july ``is_obstacle_collision``:864-890 (obstacles + walls)."""
    hit = jnp.asarray(False)
    if params.num_obstacles:
        d = jnp.linalg.norm(state.obstacle_pos - pos_i, axis=-1)
        hit |= jnp.any(d < 2.0 * (AGENT_SIZE + AGENT_SIZE))
    if params.num_walls:
        hit |= _wall_collision(pos_i)
    return hit


GATED_SCENARIOS = ("rot_inv", "two_phase", "three_phase")


def _f32r(x: Array) -> Array:
    """Round through float32, keeping the working dtype.

    The rot_inv-family scenarios cast observations/node features to float32
    at specific points (rot_inv:1469-1556 ``.astype(np.float32)``); parity
    requires reproducing those rounding sites exactly.
    """
    return x.astype(jnp.float32).astype(x.dtype)


def _rot_into_heading(v: Array, heading: Array) -> Array:
    """Rotate world-frame vectors into the ego heading frame
    (utils.py ``get_rotated_position_from_relative``:66-75:
    R = [[cos, sin], [-sin, cos]])."""
    c, s = jnp.cos(heading), jnp.sin(heading)
    return jnp.stack(
        [c * v[..., 0] + s * v[..., 1], -s * v[..., 0] + c * v[..., 1]], axis=-1
    )


def _gate_levels(params: EnvParams) -> int:
    return {"rot_inv": 0, "two_phase": 1, "three_phase": 2}[params.scenario]


def _gated_phase(params: EnvParams, tube, pos: Array, prev: Array, reached: Array) -> Array:
    return tube_mod.agent_phase_gated(
        tube, pos, prev, reached,
        params.gate_front_ratio, params.gate_back_ratio,
        params.exit_back, params.exit_front_ratio,
        in_tube_exit_levels=_gate_levels(params),
    )


def _two_nearest_rel(params: EnvParams, pos: Array, status: Array) -> Array:
    """Per-agent two nearest neighbor REL vectors, zero-padded.

    rot_inv includes done agents (rot_inv:1477-1494); two/three_phase skip
    ``status`` agents (two_phase observation) — excluded slots pad to zero.
    """
    n = params.num_agents
    rel = pos[None, :, :] - pos[:, None, :]  # [i, j] = pos_j - pos_i
    d = jnp.linalg.norm(rel, axis=-1)
    exclude = jnp.eye(n, dtype=bool)
    if params.scenario in ("two_phase", "three_phase"):
        exclude = exclude | status[None, :]
    d = jnp.where(exclude, jnp.inf, d)
    order = jnp.argsort(d, axis=-1)[:, :2]  # (n, 2)
    vecs = jnp.take_along_axis(rel, order[..., None], axis=1)  # (n, 2, 2)
    valid = jnp.take_along_axis(~exclude, order, axis=1)  # (n, 2)
    return vecs * valid[..., None]


def _obs_gated_row(params: EnvParams, state: EnvState, values: Array, i) -> tuple[EnvState, Array]:
    """Observation row for agent i from CURRENT values/status (used in the
    interleaved two/three_phase sweep where earlier agents' rewards already
    mutated state this step, environment.py:1036-1052)."""
    cfg = params.cfg
    pos = values[:, :2]
    heading = dynamics.heading_of(values, cfg)
    speed = dynamics.speed_of(values, cfg)
    tube = state.tube

    cooldown = state.entry_cooldown.at[i].add(
        -(state.entry_cooldown[i] > 0).astype(state.entry_cooldown.dtype)
    )
    state = state.replace(entry_cooldown=cooldown)
    phase = _gated_phase(
        params, tube, pos[i], state.prev_phase[i], state.phase_reached[i]
    )

    if params.scenario == "two_phase":
        goal_vec = _f32r(tube.exit).astype(pos.dtype) - pos[i]
    else:
        goal_vec = state.landmark_pos[state.goal_match[i]] - pos[i]
    rot_goal = _rot_into_heading(goal_vec, heading[i])

    nb = _f32r(_two_nearest_rel(params, pos, state.status)[i])  # (2, 2)
    rot_nb = _rot_into_heading(nb, heading[i]).reshape(4)

    s, y = tube_mod.tube_coords(tube, pos[i])
    L = tube.frame_length
    dtype = pos.dtype
    cols = [
        jnp.stack([jnp.cos(heading[i]), jnp.sin(heading[i]), speed[i]]),
        rot_goal,
        rot_nb,
        jnp.stack(
            [
                jnp.clip(s / L, -2.0, 2.0),
                jnp.clip(y / (tube.half_width + 1e-9), -2.0, 2.0),
                tube_mod.exit_gate_distance(tube, s, y) / (L + 1e-9),
            ]
        ),
    ]
    if params.scenario in ("two_phase", "three_phase"):
        corridor_heading = jnp.arctan2(tube.e[1], tube.e[0])
        he = jnp.mod(heading[i] - corridor_heading + jnp.pi, 2 * jnp.pi) - jnp.pi
        cols.append(jnp.stack([jnp.cos(he), jnp.sin(he)]))
    cols.append(phase[None].astype(dtype))
    return state, _f32r(jnp.concatenate(cols))


def _observations_gated(params: EnvParams, state: EnvState) -> tuple[EnvState, Array]:
    """13-dim rot_inv obs (rot_inv:1453-1556) / 15-dim two- & three-phase obs
    (adds heading alignment; goal = tube exit for two_phase)."""
    cfg = params.cfg
    pos = state.agent_states[:, :2]
    heading = dynamics.heading_of(state.agent_states, cfg)
    speed = dynamics.speed_of(state.agent_states, cfg)
    tube = state.tube

    cooldown = _decrement_cooldown(state.entry_cooldown)
    phase = _gated_phase(params, tube, pos, state.prev_phase, state.phase_reached)

    if params.scenario == "two_phase":
        goal_vec = _f32r(tube.exit).astype(pos.dtype) - pos  # exit cast f32 first
    else:
        goal_vec = state.landmark_pos[state.goal_match] - pos
    rot_goal = _rot_into_heading(goal_vec, heading)

    # neighbor vectors are cast to f32 BEFORE rotation (rot_inv:1489-1492)
    nb = _f32r(_two_nearest_rel(params, pos, state.status))  # (n, 2, 2)
    rot_nb = _rot_into_heading(nb, heading[:, None]).reshape(params.num_agents, 4)

    s, y = tube_mod.tube_coords(tube, pos)
    L = tube.frame_length
    s_norm = jnp.clip(s / L, -2.0, 2.0)
    y_norm = jnp.clip(y / (tube.half_width + 1e-9), -2.0, 2.0)
    dist_out = tube_mod.exit_gate_distance(tube, s, y) / (L + 1e-9)

    cols = [
        jnp.cos(heading)[:, None],
        jnp.sin(heading)[:, None],
        speed[:, None],
        rot_goal,
        rot_nb,
        s_norm[:, None],
        y_norm[:, None],
        dist_out[:, None],
    ]
    if params.scenario in ("two_phase", "three_phase"):
        corridor_heading = jnp.arctan2(tube.e[1], tube.e[0])
        he = jnp.mod(heading - corridor_heading + jnp.pi, 2 * jnp.pi) - jnp.pi
        cols.append(jnp.cos(he)[:, None])
        cols.append(jnp.sin(he)[:, None])
    cols.append(phase[:, None].astype(pos.dtype))
    obs = _f32r(jnp.concatenate(cols, axis=-1))  # final .astype(np.float32)
    state = state.replace(entry_cooldown=cooldown)
    return state, obs


def _node_obs_gated(params: EnvParams, state: EnvState, values: Array, i) -> Array:
    """Rotation-invariant 7-dim node features
    (rot_inv ``_get_entity_feat_relative``:1690-1740):
    [rot rel_vel(2), rot rel_pos(2), rot rel_goal(2), entity_type(1)]."""
    cfg = params.cfg
    n, l, o = params.num_agents, params.num_landmarks, params.num_obstacles
    # the reference casts positions/velocities to f32 BEFORE the relative
    # subtraction (rot_inv:1702-1715)
    pos = _f32r(values[:, :2])
    vel = _f32r(dynamics.velocity_of(values, cfg))
    heading_i = dynamics.heading_of(values, cfg)[i]
    entity_pos = jnp.concatenate([pos, _f32r(state.landmark_pos), _f32r(state.obstacle_pos)], axis=0)
    entity_vel = jnp.concatenate(
        [vel, jnp.zeros((l + o, 2), values.dtype)], axis=0
    )
    # f32 - f32 is computed IN f32 by numpy; round the differences too
    rel_pos = _f32r(_rot_into_heading(_f32r(entity_pos - pos[i]), heading_i))
    rel_vel = _f32r(_rot_into_heading(_f32r(entity_vel - vel[i]), heading_i))
    if params.scenario == "two_phase":
        agent_goal_world = jnp.broadcast_to(_f32r(state.tube.exit).astype(pos.dtype), (n, 2))
    else:
        agent_goal_world = _f32r(state.landmark_pos)[state.goal_match]
    agent_goal_rel = _f32r(
        _rot_into_heading(_f32r(agent_goal_world - pos[i]), heading_i)
    )
    rel_goal = jnp.concatenate([agent_goal_rel, rel_pos[n:]], axis=0)
    etype = jnp.concatenate(
        [
            jnp.full((n,), ENTITY_AGENT, values.dtype),
            jnp.full((l,), ENTITY_LANDMARK, values.dtype),
            jnp.full((o,), ENTITY_OBSTACLE, values.dtype),
        ]
    )[:, None]
    return jnp.concatenate([rel_vel, rel_pos, rel_goal, etype], axis=-1)


def _reward_one_agent_gated(params: EnvParams, state: EnvState, values: Array, i: int):
    """Reward for the exit-gated scenario family, agent-id order.

    rot_inv ``reward``:1122-1343; two_phase/three_phase variants differ in
    collision terms, freeze-at-exit vs goal-seeking, heading penalties, and
    progress reward (see per-branch citations below).
    """
    cfg = params.cfg
    scenario = params.scenario
    dtype = values.dtype
    n = params.num_agents
    pos = values[:, :2]
    pos_i = pos[i]
    tube = state.tube

    cooldown = state.entry_cooldown.at[i].add(
        -(state.entry_cooldown[i] > 0).astype(state.entry_cooldown.dtype)
    )
    cur = _gated_phase(
        params, tube, pos_i, state.prev_phase[i], state.phase_reached[i]
    )
    prev_i = state.prev_phase[i]
    reached_i = state.phase_reached[i]

    rew = jnp.zeros((), dtype)

    # collisions: rot_inv x4 agent / x3 obstacle (rot_inv:1134-1142);
    # three_phase x1 agent (three_phase reward head); two_phase none.
    d_agents = jnp.linalg.norm(pos - pos_i, axis=-1)
    colliding = (
        (d_agents < cfg.separation_distance)
        & ~state.status
        & ~state.status[i]
        & (jnp.arange(n) != i)
    )
    if scenario == "rot_inv":
        rew -= params.collision_rew * 4 * jnp.sum(colliding).astype(dtype)
        rew -= params.collision_rew * 3 * _obstacle_collision(params, state, pos_i).astype(dtype)
    elif scenario == "three_phase":
        rew -= params.collision_rew * jnp.sum(colliding).astype(dtype)

    # front/back spacing neighbors by own heading (rot_inv:1149-1161)
    heading = dynamics.heading_of(values, cfg)[i]
    heading_vec = jnp.stack([jnp.cos(heading), jnp.sin(heading)])
    proj_h = (pos - pos_i) @ heading_vec
    not_self = jnp.arange(n) != i
    front_mask = not_self & (proj_h > 0)
    back_mask = not_self & (proj_h <= 0)
    inf = jnp.asarray(jnp.inf, dtype)
    front_idx = jnp.argmin(jnp.where(front_mask, proj_h, inf))
    back_idx = jnp.argmax(jnp.where(back_mask, proj_h, -inf))
    has_front = jnp.any(front_mask)
    has_back = jnp.any(back_mask)
    desired = cfg.separation_distance

    s, y = tube_mod.tube_coords(tube, pos_i)
    L = tube.frame_length
    in_tube = tube_mod.in_tube_rect(tube, s, y)
    valid_exit = tube_mod.in_exit_gate(tube, s, y, params.exit_back, params.exit_front_ratio)
    in_gate = tube_mod.in_entrance_gate(
        tube, s, y, params.gate_front_ratio, params.gate_back_ratio
    )
    proj, _ = tube_mod.entrance_projection(tube, pos_i)

    # phase-skip penalty (rot_inv:1177-1181): -goal_rew (1x)
    rew -= params.goal_rew * ((cur == 2) & (cur > prev_i + 1)).astype(dtype)

    # transition bonuses (rot_inv:1189-1216)
    trans = (cur == prev_i + 1) & (reached_i == cur - 1)
    enter_bonus = trans & (cur == 1) & in_gate & (cooldown[i] == 0)
    exit_bonus = trans & (cur == 2)
    rew += params.goal_rew * (enter_bonus | exit_bonus).astype(dtype)
    cooldown = cooldown.at[i].set(
        jnp.where(enter_bonus, params.cooldown_steps, cooldown[i])
    )
    reached_i = jnp.where(enter_bonus, 1, reached_i)
    reached_i = jnp.where(exit_bonus, 2, reached_i)

    # two_phase freezes at the exit transition (+5g, status, reset velocity)
    newly_frozen = jnp.asarray(False)
    if scenario == "two_phase":
        newly_frozen = exit_bonus & ~state.status[i]
        rew += newly_frozen.astype(dtype) * params.goal_rew * 5

    # heading error to corridor axis (two/three_phase penalties)
    corridor_heading = jnp.arctan2(tube.e[1], tube.e[0])
    he = jnp.abs(jnp.mod(heading - corridor_heading + jnp.pi, 2 * jnp.pi) - jnp.pi)

    is_p0 = cur == 0
    is_p1 = cur == 1
    demote = (cur == 2) & (reached_i == 0)
    goal_branch = (cur == 2) & ~demote

    # phase 0: distance to the entrance EDGE (rot_inv:1227-1232)
    egd = tube_mod.entrance_gate_distance(tube, s, y)
    rew -= is_p0.astype(dtype) * egd
    if scenario in ("two_phase", "three_phase"):
        near_gate = egd < params.world_size * 0.1
        rew -= (is_p0 & near_gate).astype(dtype) * he * params.formation_rew * 0.5

    # phase 1 (rot_inv:1244-1276)
    front_diff = jnp.linalg.norm(pos[front_idx] - pos_i) - desired
    back_diff = jnp.linalg.norm(pos[back_idx] - pos_i) - desired
    spacing_error = jnp.where(has_front & (front_diff < 0), -front_diff, 0.0) + jnp.where(
        has_back & (back_diff < 0), -back_diff, 0.0
    )
    spacing_error = spacing_error.astype(dtype)
    track_delta = scenario in ("rot_inv", "three_phase")
    state = state.replace(
        spacing_violation=state.spacing_violation.at[i].add(
            (is_p1 & (spacing_error > 0)).astype(dtype)
        ),
        delta_spacing_sum=state.delta_spacing_sum
        + (is_p1.astype(dtype) * spacing_error if track_delta else 0.0),
        steps_in_corridor=state.steps_in_corridor.at[i].add(is_p1.astype(dtype)),
    )
    rew -= is_p1.astype(dtype) * spacing_error * params.formation_rew
    rew -= is_p1.astype(dtype) * tube_mod.exit_gate_distance(tube, s, y)
    if scenario == "rot_inv":
        progress_gain = params.goal_rew / (tube.length * 10.0)
        # prev_proj is a float32 array in the reference (rot_inv:374); the
        # delta reads it back as float(np.float32) — i.e. f32-rounded
        delta_proj = proj - state.prev_proj[i]
        rew += is_p1.astype(dtype) * progress_gain * jnp.maximum(delta_proj, -0.05)
        state = state.replace(
            prev_proj=state.prev_proj.at[i].set(
                jnp.where(
                    is_p1,
                    proj.astype(jnp.float32).astype(state.prev_proj.dtype),
                    state.prev_proj[i],
                )
            )
        )
    else:
        rew -= is_p1.astype(dtype) * he * params.formation_rew * 0.1

    # phase 2: goal seek + freeze (rot_inv:1286-1301; three_phase same minus
    # goal_tracker; two_phase has no phase-2 term — it froze at the exit)
    key = state.key
    newly = newly_frozen
    if scenario in ("rot_inv", "three_phase"):
        goal_pos = state.landmark_pos[state.goal_match[i]]
        dist_goal = jnp.linalg.norm(pos_i - goal_pos)
        at_goal = goal_branch & (dist_goal < cfg.goal_threshold)
        newly = at_goal & ~state.status[i]
        rew += newly.astype(dtype) * params.goal_rew * 5
        rew -= (goal_branch & (dist_goal >= cfg.goal_threshold)).astype(dtype) * dist_goal
    if scenario != "three_phase":
        new_tracker = jnp.where(newly, state.goal_match[i], state.goal_tracker[i])
        if scenario == "two_phase":
            # two_phase never records goal_tracker (stays -1)
            new_tracker = state.goal_tracker[i]
    else:
        new_tracker = state.goal_tracker[i]

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
        goal_tracker=state.goal_tracker.at[i].set(new_tracker),
        key=key,
    )

    # conformance / phase_reached / regression (rot_inv:1306-1325)
    cur2 = jnp.where(demote, 0, cur)
    state = state.replace(
        conformance=state.conformance.at[i].add(
            ((reached_i == 1) & (cur2 == 0)).astype(dtype)
        )
    )
    new_pr = jnp.maximum(reached_i, cur2)
    rew -= params.collision_rew * (cur2 < prev_i).astype(dtype)
    rew -= params.collision_rew * (cur2 < new_pr).astype(dtype)

    # in-tube-but-not-phase-1 penalty (rot_inv:1327-1329; three_phase also
    # requires not-valid-exit)
    bad_in_tube = in_tube & (cur2 != 1)
    if scenario == "three_phase":
        bad_in_tube &= ~valid_exit
    rew -= params.collision_rew * bad_in_tube.astype(dtype)

    # skipped-corridor penalty (rot_inv:1332-1334)
    rew -= params.goal_rew * ((s > L) & (new_pr < 1)).astype(dtype)

    state = state.replace(
        phase_reached=state.phase_reached.at[i].set(new_pr),
        prev_phase=state.prev_phase.at[i].set(cur2),
        entry_cooldown=cooldown,
    )

    rew = jnp.clip(rew, -4 * params.collision_rew, params.goal_rew * 5)
    return rew, state, values


def _safety_reward_addons(
    params: EnvParams, state: EnvState, values: Array, i, hj_pair: Array | None = None
) -> Array:
    """Toggle-gated safety reward augmentation (july:1208-1218, applied
    between the base clip and the min/max clip; all toggles default off,
    RewardBinaryConfig multiagent/config.py:146-155)."""
    tg = params.reward_toggles
    w = params.reward_weights
    cfg = params.cfg
    dtype = values.dtype
    n = params.num_agents
    rew = jnp.zeros((), dtype)
    pos = values[:, :2]
    rel = pos - pos[i]
    d = jnp.linalg.norm(rel, axis=-1)
    others_alive = (jnp.arange(n) != i) & ~state.status

    if tg.safety_violation:
        # reward_safety_violation (july:1057-1062): conflict_rew per agent
        # within separation distance
        conflict = others_alive & (d <= cfg.separation_distance)
        rew += w.safety_violation * jnp.sum(conflict).astype(dtype)
    if tg.potential_conflict:
        # reward_multiple_engagement (july:1064-1085)
        eng_dist = cfg.engagement_distance
        eng = others_alive & (d <= eng_dist)
        closeness = 1.0 - jnp.clip(
            (d - cfg.separation_distance) / (eng_dist - cfg.separation_distance), 0, 1
        )
        vel = dynamics.velocity_of(values, cfg)
        dirv = rel / (d[:, None] + 1e-8)
        closing = jnp.sum(dirv * (vel - vel[i]), axis=-1)
        closing = jnp.abs(jnp.minimum(0.0, closing))
        pen = jnp.sum(jnp.where(eng, closing * closeness, 0.0))
        rew += jnp.where(
            jnp.sum(eng) > 1, w.potential_conflict * pen, 0.0
        ).astype(dtype)
    if tg.diff_from_filtered_action and state.action_diff is not None:
        # reward_diff_from_filtered_action (july:1087-1090)
        rew += jnp.where(
            ~state.status[i], w.diff_from_filtered_action * state.action_diff[i], 0.0
        ).astype(dtype)
    if tg.hj_value and hj_pair is not None:
        # reward_hj_value (july:1092-1102), eps_hj = 0.4
        pen = jnp.sum(
            jnp.where(others_alive, jnp.abs(jnp.minimum(hj_pair[i] - 0.4, 0.0)), 0.0)
        )
        rew += (w.hj_value * pen).astype(dtype)
    return rew


def observations(params: EnvParams, state: EnvState) -> tuple[EnvState, Array]:
    """The 19-dim observation for every agent (july:1337-1463), vectorized.

    Layout: [pos(2), vel(2), rel_goal(2), goal_occupied(1), rel_second(2)
    (= rel_goal), two nearest neighbors rel pos(4), rel_entrance(2),
    rel_exit(2), tube_width(1), phase(1)].

    Performs phase-machine call #1 for each agent (cooldown decrement +
    possible ``previous_phase`` 1->2 mutation), exactly as the reference's
    ``observation`` does via ``get_agent_phase`` (july:1447).
    """
    if params.scenario in GATED_SCENARIOS:
        return _observations_gated(params, state)
    cfg = params.cfg
    pos = state.agent_states[:, :2]
    vel = dynamics.velocity_of(state.agent_states, cfg)
    goal = state.landmark_pos[state.goal_match]
    rel_goal = goal - pos
    occupied = state.occupied[state.goal_match][:, None]
    if params.scenario == "v4oct":
        # stale-cache neighbors (v4oct:1290-1308): candidates RANKED by the
        # frozen pairwise distances, rel vector = frozen other-position minus
        # CURRENT ego position (see EnvState.frozen_pos)
        neighbors = _v4oct_two_nearest(params, state, pos)
        phase = tube_mod.agent_phase_v4oct(state.tube, pos)
        new_prev = state.prev_phase  # never advanced (v4oct:938 dead code)
        cooldown = state.entry_cooldown  # v4oct has no entry cooldown
    else:
        neighbors = dist_ops.two_nearest_neighbors(pos)
        cooldown = _decrement_cooldown(state.entry_cooldown)
        phase, new_prev = _phase_all(params, state.tube, pos, state.prev_phase)
    rel_entrance = state.tube.entrance - pos
    rel_exit = state.tube.exit - pos
    width = jnp.broadcast_to(state.tube.width, (params.num_agents,))[:, None]
    obs = jnp.concatenate(
        [
            pos,
            vel,
            rel_goal,
            occupied,
            rel_goal,
            neighbors,
            rel_entrance,
            rel_exit,
            width,
            phase[:, None].astype(pos.dtype),
        ],
        axis=-1,
    )
    state = state.replace(entry_cooldown=cooldown, prev_phase=new_prev)
    return state, obs


def _node_obs_for_agent(
    params: EnvParams, state: EnvState, values: Array, i
) -> Array:
    """Relative node features wrt ego agent i (july:1694-1771), 8-dim."""
    if params.scenario in GATED_SCENARIOS:
        return _node_obs_gated(params, state, values, i)
    cfg = params.cfg
    n, l, o, w = (
        params.num_agents,
        params.num_landmarks,
        params.num_obstacles,
        params.num_walls,
    )
    dtype = values.dtype
    pos = values[:, :2]
    vel = dynamics.velocity_of(values, cfg)
    entity_pos = _entity_positions(params, pos, state)
    entity_vel = jnp.concatenate([vel, jnp.zeros((l + o + w, 2), dtype)], axis=0)
    rel_pos = entity_pos - pos[i]
    rel_vel = entity_vel - vel[i]
    # agents: goal = landmark_poses[entity.id]; landmarks/obstacles: own rel_pos
    agent_goal_rel = state.landmark_pos[jnp.arange(n) % l] - pos[i]
    rel_goal = jnp.concatenate([agent_goal_rel, rel_pos[n:]], axis=0)
    occ_agents = state.occupied[state.goal_match[jnp.arange(n)]]
    occupied = jnp.concatenate(
        [occ_agents, jnp.ones((l + o + w,), dtype)], axis=0
    )[:, None]
    etype = jnp.concatenate(
        [
            jnp.full((n,), ENTITY_AGENT, dtype),
            jnp.full((l,), ENTITY_LANDMARK, dtype),
            jnp.full((o,), ENTITY_OBSTACLE, dtype),
            jnp.full((w,), ENTITY_WALL, dtype),
        ]
    )[:, None]
    base = [rel_vel, rel_pos, rel_goal, occupied]
    if w == 0:
        return jnp.concatenate(base + [etype], axis=-1)
    # 13-dim wall layout (july:1765-1767): [rel_vel, rel_pos, rel_goal,
    # occupied, goal_history, o_corner(2), d_corner(2), type].  Non-wall rows
    # zero-pad the wall-only slots.  (The reference crashes here — ragged
    # rows — so this homogenization is our documented design choice.)
    E = n + l + o + w
    gh = jnp.zeros((E, 1), dtype)
    o_corner = jnp.zeros((E, 2), dtype)
    d_corner = jnp.zeros((E, 2), dtype)
    oc = jnp.asarray([WALL_ENDPOINTS[0], WALL_AXIS_POS + WALL_WIDTH / 2], dtype) - pos[i]
    dc = jnp.asarray([WALL_ENDPOINTS[1], WALL_AXIS_POS - WALL_WIDTH / 2], dtype) - pos[i]
    o_corner = o_corner.at[n + l + o :].set(oc)
    d_corner = d_corner.at[n + l + o :].set(dc)
    return jnp.concatenate(base + [gh, o_corner, d_corner, etype], axis=-1)


def masked_adjacency(params: EnvParams, state: EnvState, values: Array) -> Array:
    """Distance-magnitude adjacency with done rows/cols zeroed (july:1625-1648).

    Agents disconnect once ``status`` is set; a landmark disconnects when any
    ``goal_tracker`` entry equals its id.
    """
    n, l = params.num_agents, params.num_landmarks
    entity_pos = _entity_positions(params, values[:, :2], state)
    adj = dist_ops.pairwise_distances(entity_pos)
    landmark_done = jnp.any(
        state.goal_tracker[:, None] == jnp.arange(l)[None, :], axis=0
    )
    disconnected = jnp.concatenate(
        [
            state.status,
            landmark_done,
            jnp.zeros((params.num_obstacles + params.num_walls,), bool),
        ]
    )
    keep = ~disconnected
    return adj * keep[:, None] * keep[None, :]


def _v4oct_two_nearest(params: EnvParams, state: EnvState, pos: Array) -> Array:
    """Two nearest neighbors per agent, ranked by the FROZEN pairwise
    distances of v4oct's stale position cache; the returned rel vectors mix
    frozen neighbor positions with current ego positions (v4oct:1296-1308)."""
    n = params.num_agents
    frozen = state.frozen_pos
    d = jnp.linalg.norm(frozen[None, :, :] - frozen[:, None, :], axis=-1)
    d = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d)
    order = jnp.argsort(d, axis=-1)[:, :2]  # (n, 2) stable
    rel = frozen[order] - pos[:, None, :]  # (n, 2, 2)
    valid = jnp.isfinite(jnp.take_along_axis(d, order, axis=1))  # (n, 2)
    return (rel * valid[..., None]).reshape(n, 4)


def _reward_one_agent_v4oct(params: EnvParams, state: EnvState, values: Array, i: int):
    """v4oct ``reward`` (v4oct:883-938 — everything after the mid-function
    ``return`` is dead code).  Quirks preserved:

    * agent-agent collisions use the FROZEN distance cache and ``break`` after
      the first hit: at most one -4*collision_rew penalty, and it never
      changes as agents move (v4oct:893-900, 838-841);
    * the squared-distance comparison (dist2 < sep2) replaces july's
      ``dist < sep`` (fp-identical except at the boundary);
    * phase is {0, 1} only (see ``agent_phase_v4oct``): phase-0 pays
      -dist(entrance), phase-1 pays -dist(exit) and bumps steps_in_corridor;
      the goal branch is unreachable, so agents never freeze;
    * NO reward clip, NO phase_reached/conformance/spacing bookkeeping.
    """
    cfg = params.cfg
    dtype = values.dtype
    n = params.num_agents
    pos = values[:, :2]
    pos_i = pos[i]
    tube = state.tube

    cur = tube_mod.agent_phase_v4oct(tube, pos_i)
    rew = jnp.zeros((), dtype)

    frozen = state.frozen_pos
    d2 = jnp.sum((frozen - frozen[i]) ** 2, axis=-1)
    colliding = (
        (d2 < cfg.separation_distance**2)
        & ~state.status
        & ~state.status[i]
        & (jnp.arange(n) != i)
    )
    rew -= params.collision_rew * 4 * jnp.any(colliding).astype(dtype)
    rew -= params.collision_rew * 3 * _obstacle_collision(params, state, pos_i).astype(dtype)

    is_p0 = (cur == 0).astype(dtype)
    is_p1 = (cur == 1).astype(dtype)
    rew -= is_p0 * jnp.linalg.norm(tube.entrance - pos_i)
    rew -= is_p1 * jnp.linalg.norm(tube.exit - pos_i)
    state = state.replace(
        steps_in_corridor=state.steps_in_corridor.at[i].add(is_p1)
    )
    return rew, state, values


def _reward_one_agent(
    params: EnvParams, state: EnvState, values: Array, i: int, hj_pair: Array | None = None
):
    """Reward + in-step mutations for agent ``i`` (july ``reward``:1105-1221).

    Returns (reward_i, updated state, updated values).  Must be called in
    agent-id order: uses ``state.status``/``values`` as mutated by earlier
    agents this step.
    """
    if params.scenario in GATED_SCENARIOS:
        return _reward_one_agent_gated(params, state, values, i)
    if params.scenario == "v4oct":
        return _reward_one_agent_v4oct(params, state, values, i)
    cfg = params.cfg
    dtype = values.dtype
    n = params.num_agents
    pos = values[:, :2]
    pos_i = pos[i]
    tube = state.tube

    # --- phase call #2 (get_agent_phase inside reward, july:1113) ---
    # decrements only agent i's cooldown (july:702-704)
    cooldown = state.entry_cooldown.at[i].add(
        -(state.entry_cooldown[i] > 0).astype(state.entry_cooldown.dtype)
    )
    cur, prev_after_call = tube_mod.agent_phase(
        tube, pos_i, state.prev_phase[i], params.gate_front_ratio, params.gate_back_ratio
    )
    prev_phase = state.prev_phase.at[i].set(prev_after_call)
    prev_i = prev_phase[i]

    rew = jnp.zeros((), dtype)

    # --- collision penalties (july:1117-1124) ---
    d_agents = jnp.linalg.norm(pos - pos_i, axis=-1)
    colliding = (
        (d_agents < cfg.separation_distance)
        & ~state.status
        & ~state.status[i]
        & (jnp.arange(n) != i)
    )
    rew -= params.collision_rew * 4 * jnp.sum(colliding).astype(dtype)
    rew -= params.collision_rew * 3 * _obstacle_collision(params, state, pos_i).astype(dtype)

    # --- front/back spacing neighbors by own heading (july:1127-1144) ---
    heading = dynamics.heading_of(values, cfg)[i]
    heading_vec = jnp.stack([jnp.cos(heading), jnp.sin(heading)])
    proj = (pos - pos_i) @ heading_vec
    not_self = jnp.arange(n) != i
    front_mask = not_self & (proj > 0)
    back_mask = not_self & (proj <= 0)
    inf = jnp.asarray(jnp.inf, dtype)
    front_idx = jnp.argmin(jnp.where(front_mask, proj, inf))
    back_idx = jnp.argmax(jnp.where(back_mask, proj, -inf))
    has_front = jnp.any(front_mask)
    has_back = jnp.any(back_mask)
    desired = cfg.separation_distance

    # --- phase transition rewards (july:1146-1161) ---
    rew -= params.goal_rew * 3 * ((cur == 2) & (cur > prev_i + 1)).astype(dtype)
    proj_e, perp_e = tube_mod.entrance_projection(tube, pos_i)
    span_len = jnp.linalg.norm(tube.exit - tube.entrance)
    entered = (cur == prev_i + 1) & (state.phase_reached[i] == cur - 1)
    bonus = entered & (
        ((cur == 1) & (0 <= proj_e) & (proj_e < 0.1 * span_len) & (perp_e < 0.2 * span_len))
        | (cur == 2)
    )
    rew += params.goal_rew * 3 * bonus.astype(dtype)

    # --- phase-specific terms (july:1163-1194) ---
    is_p0 = cur == 0
    is_p1 = cur == 1
    demote = (cur == 2) & (state.phase_reached[i] == 0)
    goal_branch = (cur == 2) & ~demote

    rew -= is_p0.astype(dtype) * jnp.linalg.norm(tube.entrance - pos_i)

    front_diff = jnp.linalg.norm(pos[front_idx] - pos_i) - desired
    back_diff = jnp.linalg.norm(pos[back_idx] - pos_i) - desired
    spacing_error = jnp.where(has_front & (front_diff < 0), -front_diff, 0.0) + jnp.where(
        has_back & (back_diff < 0), -back_diff, 0.0
    )
    spacing_error = spacing_error.astype(dtype)
    state = state.replace(
        spacing_violation=state.spacing_violation.at[i].add(
            (is_p1 & (spacing_error > 0)).astype(dtype)
        ),
        delta_spacing_sum=state.delta_spacing_sum + is_p1.astype(dtype) * spacing_error,
        steps_in_corridor=state.steps_in_corridor.at[i].add(is_p1.astype(dtype)),
    )
    rew -= is_p1.astype(dtype) * spacing_error * params.formation_rew
    rew -= is_p1.astype(dtype) * jnp.linalg.norm(tube.exit - pos_i)

    # goal logic (july:1186-1194)
    goal_pos = state.landmark_pos[state.goal_match[i]]
    dist_goal = jnp.linalg.norm(pos_i - goal_pos)
    at_goal = goal_branch & (dist_goal < cfg.goal_threshold)
    newly = at_goal & ~state.status[i]
    rew += newly.astype(dtype) * params.goal_rew * 5
    rew -= (goal_branch & (dist_goal >= cfg.goal_threshold)).astype(dtype) * dist_goal

    # freeze + reset_velocity on first goal reach (july:1188-1190,
    # core.py:324-333: heading models draw theta ~ U(0,2pi), speed=v_min;
    # double integrator zeroes velocity, no draw)
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
        key=key,
    )

    # --- conformance / phase_reached / regression penalties (july:1196-1204) ---
    cur2 = jnp.where(demote, 0, cur)
    state = state.replace(
        conformance=state.conformance.at[i].add(
            ((state.phase_reached[i] == 1) & (cur2 == 0)).astype(dtype)
        )
    )
    new_pr = jnp.maximum(state.phase_reached[i], cur2)
    rew -= params.collision_rew * 3 * (cur2 < prev_i).astype(dtype)
    rew -= params.collision_rew * (cur2 < new_pr).astype(dtype)
    state = state.replace(
        phase_reached=state.phase_reached.at[i].set(new_pr),
        prev_phase=prev_phase.at[i].set(cur2),
        entry_cooldown=cooldown,
    )

    # --- clips (july:1207, 1221) with safety augmentation between them ---
    rew = jnp.clip(rew, -4 * params.collision_rew, params.goal_rew * 5)
    if params.use_safety_filter:
        rew += _safety_reward_addons(params, state, values, i, hj_pair)
    rew = jnp.clip(rew, params.reward_weights.min_reward, params.reward_weights.max_reward)
    return rew, state, values


def _update_info_stats(params: EnvParams, state: EnvState, values: Array) -> EnvState:
    """Vectorized ``info_callback`` bookkeeping (july:741-829).

    The reference runs this per agent interleaved with the reward loop; its
    mutations feed only the logged metrics (never observations or rewards), so
    we apply them once per step from the post-loop state.  The one observable
    divergence: collision *counts* around the exact step an agent freezes may
    differ by one, since we use end-of-step status for all agents.
    """
    cfg = params.cfg
    dtype = values.dtype
    pos = values[:, :2]
    d_landmarks = jnp.linalg.norm(
        pos[:, None, :] - state.landmark_pos[None, :, :], axis=-1
    )
    nearest = jnp.argmin(d_landmarks, axis=-1).astype(jnp.int32)
    dist_goal = jnp.min(d_landmarks, axis=-1)
    near = dist_goal < cfg.goal_threshold
    t_time = (state.t.astype(dtype)) * cfg.dt

    goal_reached = state.goal_reached
    times_required = state.times_required
    dists_to_goal = state.dists_to_goal
    dist_left = state.dist_left_to_goal

    # The reference initializes these three stat arrays with np.full(n, -1)
    # — INTEGER dtype (july reset_world:368-373) — so every float stored into
    # them silently truncates toward zero.  The logged Dist_to_goal /
    # Time_req_to_goal / Dists_traveled metrics are therefore integer-valued
    # upstream; replicate trunc-on-store (the comparisons below still use the
    # fresh float distances, exactly like the reference reads world.dists).
    t_time = jnp.trunc(t_time)
    dist_goal_store = jnp.trunc(dist_goal)
    p_dist_store = jnp.trunc(state.p_dist)

    # 1. new goal after having one
    c1 = near & (nearest != goal_reached) & (goal_reached != -1)
    goal_reached = jnp.where(c1, nearest, goal_reached)
    dist_left = jnp.where(c1, dist_goal_store, dist_left)
    # 2. first time at a goal
    c2 = near & (times_required == -1)
    times_required = jnp.where(c2, t_time, times_required)
    dists_to_goal = jnp.where(c2, p_dist_store, dists_to_goal)
    dist_left = jnp.where(c2, dist_goal_store, dist_left)
    goal_reached = jnp.where(c2, nearest, goal_reached)
    # 3. not yet reached
    c3 = times_required == -1
    dists_to_goal = jnp.where(c3, p_dist_store, dists_to_goal)
    dist_left = jnp.where(c3, dist_goal_store, dist_left)
    # 4. left the goal
    c4 = (dist_goal > cfg.goal_threshold) & (times_required != -1)
    dists_to_goal = jnp.where(c4, p_dist_store, dists_to_goal)
    times_required = jnp.where(c4, t_time, times_required)
    dist_left = jnp.where(c4, dist_goal_store, dist_left)
    # 5. still on the same goal
    c5 = near & (nearest == goal_reached)
    dist_left = jnp.where(c5, dist_goal_store, dist_left)

    # collision counters (july:777-786)
    d_agents = dist_ops.pairwise_distances(pos)
    coll = (
        (d_agents < cfg.separation_distance)
        & ~state.status[:, None]
        & ~state.status[None, :]
        & ~jnp.eye(params.num_agents, dtype=bool)
    )
    num_agent_collisions = state.num_agent_collisions + jnp.sum(coll, axis=-1).astype(dtype)
    obst = jax.vmap(lambda p: _obstacle_collision(params, state, p))(pos)
    num_obstacle_collisions = state.num_obstacle_collisions + obst.astype(dtype)

    return state.replace(
        goal_reached=goal_reached,
        times_required=times_required,
        dists_to_goal=dists_to_goal,
        dist_left_to_goal=dist_left,
        dist_left_float=dist_goal,
        num_agent_collisions=num_agent_collisions,
        num_obstacle_collisions=num_obstacle_collisions,
    )


def _info_dict(params: EnvParams, state: EnvState) -> dict:
    """Logged metrics matching info_callback keys (july:806-829)."""
    dtype = state.dists_to_goal.dtype
    eps = jnp.asarray(1e-4, dtype)
    dmean = jnp.mean(state.dists_to_goal)
    dstd = jnp.std(state.dists_to_goal)
    tmean = jnp.mean(state.times_required)
    tstd = jnp.std(state.times_required)
    spacing_tot = jnp.sum(state.spacing_violation)
    return {
        "Dist_to_goal": state.dist_left_to_goal,
        # ours-only precise float distance (the reference's Dist_to_goal is
        # int-truncated by its np.full(n, -1) buffer — see _update_info_stats
        # — which makes its own success criterion effectively dist < 1); the
        # eval harness uses this strict value instead
        "Dist_to_goal_precise": state.dist_left_float,
        "Time_req_to_goal": state.times_required,
        "Num_agent_collisions": state.num_agent_collisions,
        "Num_obst_collisions": state.num_obstacle_collisions,
        "Distance_mean": dmean,
        "Distance_variance": dstd,
        "Mean_by_variance": dmean / (dstd + eps),
        "Dists_traveled": state.dists_to_goal,
        "Time_taken": state.times_required,
        "Time_mean": tmean,
        "Time_stddev": tstd,
        "Time_mean_by_stddev": tmean / (tstd + eps),
        "Conformance": state.conformance / params.episode_length,
        "Delta_spacing": state.delta_spacing_sum
        / jnp.where(spacing_tot != 0, spacing_tot, 1.0),
        "Spacing_violations": state.spacing_violation
        / jnp.where(state.steps_in_corridor != 0, state.steps_in_corridor, 1.0),
        "Min_time_to_goal": state.goal_min_time,
        # rot_inv adds per-agent Phase_reached (rot_inv info_callback:840)
        "Phase_reached": state.phase_reached.astype(dtype),
    }


def step(
    params: EnvParams,
    state: EnvState,
    action_idx: Array,
    hj_data=None,
) -> tuple[EnvState, TimeStep]:
    """One full environment step for one env instance.

    Order of operations replicates ``MultiAgentGraphEnv.step``
    (environment.py:1021-1063): counter increments, action decode
    (``_set_action``), ``world.step()`` physics — with the optional per-agent
    safety filter applied to the decoded controls (core.py:691-736) — then
    the per-agent obs/reward/graph/done/info sweep in agent-id order.
    """
    cfg = params.cfg
    dtype = state.agent_states.dtype
    n = params.num_agents

    # counters (environment.py:1027,1030)
    t_new = state.t + 1

    # action decode (environment.py:336-475) + physics (core.py:687-756)
    table = jnp.asarray(action_mod.action_table(cfg, params.total_actions), dtype)
    u = jnp.take(table, action_idx.reshape(-1), axis=0)

    # safety filter on decoded controls (core.py:691-736: runs over ALL
    # agents, including frozen ones, before integration)
    if params.use_safety_filter:
        from .. import safety as safety_mod

        if params.safety_filter_type == "rvo":
            from ..safety.rvo import rvo_filter

            u, violations, action_diff, _ = rvo_filter(state.agent_states, u, cfg)
        elif cfg.dynamics == DynamicsType.DOUBLE_INTEGRATOR:
            u, violations, action_diff, _ = safety_mod.di_exp_cbf_filter(
                state.agent_states, u, cfg
            )
        else:
            if hj_data is None:
                raise ValueError(
                    "use_safety_filter with heading dynamics requires HJ value "
                    "data (safety.load_hj_pickle / make_synthetic_airtaxi_hj)"
                )
            u, violations, action_diff, _ = safety_mod.airtaxi_hj_filter(
                state.agent_states, u, hj_data, cfg
            )
        state = state.replace(action_diff=action_diff, safety_violations=violations)

    # pairwise HJ values for the optional reward_hj_value term (july:1092-1102)
    hj_pair = None
    if params.use_safety_filter and params.reward_toggles.hj_value and hj_data is not None:
        from ..safety import hj as hj_mod

        rel = hj_mod.relative_state_airtaxi(
            state.agent_states[:, None, :], state.agent_states[None, :, :]
        )
        hj_pair, in_rng = hj_mod.interpolate(hj_data.lo, hj_data.hi, hj_data.values, rel)
        hj_pair = jnp.where(in_rng, hj_pair, jnp.inf)

    active = ~state.status
    values = dynamics.integrate(
        state.agent_states, u, cfg, active, method=params.integrator
    )
    speed = dynamics.speed_of(values, cfg)
    state = state.replace(
        t=t_new,
        sim_time=state.sim_time + cfg.dt,
        p_dist=state.p_dist + jnp.where(active, speed * cfg.dt, 0.0).astype(dtype),
        time=state.time + jnp.where(active, cfg.dt, 0.0).astype(dtype),
        agent_states=values,
    )

    interleaved = (
        params.scenario in ("two_phase", "three_phase", "fairassign")
        or params.scenario in seq_mod.SEQ_SCENARIOS
    )
    if interleaved:
        # fully interleaved per-agent sweep (environment.py:1036-1052): agent
        # i's observation must see mutations from rewards of agents j<i
        # (status flips for two/three_phase; tube switches + landmark
        # re-placement for sequential; occupancy bookkeeping for fairassign)
        is_seq = params.scenario in seq_mod.SEQ_SCENARIOS
        is_fair = params.scenario == "fairassign"
        values = state.agent_states
        obs_rows, rewards, node_obs = [], [], []
        for i in range(n):
            if is_seq:
                obs_i = seq_mod.observation_row(params, state, values, i)
                obs_rows.append(obs_i)
                rew_i, state, values = seq_mod.reward_one_agent(params, state, values, i)
                rewards.append(rew_i)
                node_obs.append(seq_mod.node_obs_row(params, state, values, i))
            elif is_fair:
                state, obs_i = fair_mod.observation_row(params, state, values, i)
                obs_rows.append(obs_i)
                rew_i, state, values = fair_mod.reward_one_agent(params, state, values, i)
                rewards.append(rew_i)
                node_obs.append(fair_mod.node_obs_row(params, state, values, i))
            else:
                state, obs_i = _obs_gated_row(params, state, values, i)
                obs_rows.append(obs_i)
                rew_i, state, values = _reward_one_agent(params, state, values, i)
                rewards.append(rew_i)
                node_obs.append(_node_obs_for_agent(params, state, values, i))
        state = state.replace(agent_states=values)
        obs = jnp.stack(obs_rows)
        reward = jnp.stack(rewards)
        node_obs = jnp.stack(node_obs)
    else:
        # observations for all agents (phase call #1, vectorized — valid
        # because july/rot_inv observations only read per-agent state that
        # earlier rewards cannot have mutated)
        state, obs = observations(params, state)

        # sequential reward sweep (phase call #2 each; status/velocity
        # mutations visible to later agents), node features captured per agent
        # right after its reward (environment.py:1040-1046).  Unrolled for
        # small fleets (fastest — no scan serialization overhead); as a
        # lax.scan over the agent index for large-fleet + safety-filter
        # configs, whose unrolled HLO crashes the TPU compile helper.
        values = state.agent_states
        unroll = not (params.use_safety_filter and n > 5)
        if unroll:
            rewards, node_obs = [], []
            for i in range(n):
                rew_i, state, values = _reward_one_agent(params, state, values, i, hj_pair)
                rewards.append(rew_i)
                node_obs.append(_node_obs_for_agent(params, state, values, i))
            reward = jnp.stack(rewards)
            node_obs = jnp.stack(node_obs)
        else:
            def sweep(carry, i):
                state, values = carry
                rew_i, state, values = _reward_one_agent(params, state, values, i, hj_pair)
                node_i = _node_obs_for_agent(params, state, values, i)
                return (state, values), (rew_i, node_i)

            (state, values), (reward, node_obs) = jax.lax.scan(
                sweep, (state, values), jnp.arange(n)
            )
        state = state.replace(agent_states=values)

    # final shared adjacency (the reference masks one aliased array in place,
    # so every agent ends up with the post-sweep version)
    adj = masked_adjacency(params, state, values)

    # dones (environment.py:263-271): status or episode length reached
    done = state.status | (t_new >= params.episode_length)

    # info bookkeeping (july:741-829)
    state = _update_info_stats(params, state, values)
    info = _info_dict(params, state)

    ts = TimeStep(
        obs=obs,
        agent_id=jnp.arange(n, dtype=jnp.int32)[:, None],
        node_obs=node_obs,
        adj=adj,
        reward=reward,
        done=done,
        info=info,
        # time-limit-only done: the agent never froze at its goal, the clock
        # ran out (environment.py:263-271 distinguishes the same two causes)
        truncated=done & ~state.status,
    )
    return state, ts


def reset_outputs(params: EnvParams, state: EnvState):
    """Post-reset observations (MultiAgentGraphEnv.reset, environment.py:1066-1084).

    Runs phase call #1 per agent (mutating state) and builds node features /
    adjacency from the fresh state.
    """
    values = state.agent_states
    if params.scenario in seq_mod.SEQ_SCENARIOS or params.scenario == "fairassign":
        is_fair = params.scenario == "fairassign"
        obs_rows, node_obs = [], []
        for i in range(params.num_agents):
            if is_fair:
                state, obs_i = fair_mod.observation_row(params, state, values, i)
                obs_rows.append(obs_i)
                node_obs.append(fair_mod.node_obs_row(params, state, values, i))
            else:
                obs_rows.append(seq_mod.observation_row(params, state, values, i))
                node_obs.append(seq_mod.node_obs_row(params, state, values, i))
        obs = jnp.stack(obs_rows)
        node_obs = jnp.stack(node_obs)
        adj = masked_adjacency(params, state, values)
        agent_id = jnp.arange(params.num_agents, dtype=jnp.int32)[:, None]
        return state, obs, node_obs, adj, agent_id
    state, obs = observations(params, state)
    node_obs = jnp.stack(
        [_node_obs_for_agent(params, state, values, i) for i in range(params.num_agents)]
    )
    adj = masked_adjacency(params, state, values)
    agent_id = jnp.arange(params.num_agents, dtype=jnp.int32)[:, None]
    return state, obs, node_obs, adj, agent_id
