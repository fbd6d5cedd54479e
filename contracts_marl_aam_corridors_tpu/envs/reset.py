"""Episode reset: tube sampling, agent spawning, landmark placement.

Functional counterpart of the reference's ``reset_world`` -> ``random_scenario``
-> ``setup_tube_params`` chain (july:339-613) plus the landmark-placement
helpers in ``multiagent/custom_scenarios/utils.py``.

Two implementations:

* ``reset`` — pure JAX, jit/vmap-able, used for training.  Identical
  distributions to the reference (same uniform ranges, same rejection rule),
  different RNG stream (threefry vs Mersenne-Twister).
* ``reset_parity_numpy`` — host-side numpy mirror that consumes
  ``np.random``'s *global* stream in exactly the reference's call order
  (wall-length draw, tube angle, per-attempt spawn jitter, per-agent heading),
  so a seeded episode reproduces the reference's reset bit-for-bit.  Used by
  golden-parity tests and the eval CLI's reference-replay mode.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config.physics import DynamicsType
from . import tube as tube_mod
from .types import EnvParams, EnvState, TubeParams

Array = jax.Array

AGENT_SIZE = 0.06  # Entity.size default (core.py:385)


def _blank_state(params: EnvParams, tube: TubeParams, dtype) -> dict:
    n, l, o = params.num_agents, params.num_landmarks, params.num_obstacles
    zf = lambda *s: jnp.zeros(s, dtype)
    zi = lambda *s: jnp.zeros(s, jnp.int32)
    return dict(
        p_dist=zf(n),
        time=zf(n),
        status=jnp.zeros((n,), bool),
        phase_reached=zi(n),
        entry_cooldown=zi(n),
        prev_proj=zf(n),
        tube=tube,
        obstacle_pos=zf(o, 2),
        occupied=zf(n),
        goal_match=jnp.arange(n, dtype=jnp.int32),
        goal_tracker=jnp.full((n,), -1, jnp.int32),
        goal_reached=jnp.full((n,), -1, jnp.int32),
        goal_history=jnp.full((l,), -1, jnp.int32),
        spacing_violation=zf(n),
        conformance=zf(n),
        steps_in_corridor=zf(n),
        delta_spacing_sum=zf(),
        times_required=jnp.full((n,), -1.0, dtype),
        dists_to_goal=jnp.full((n,), -1.0, dtype),
        dist_left_to_goal=jnp.full((n,), -1.0, dtype),
        dist_left_float=jnp.full((n,), -1.0, dtype),
        num_agent_collisions=zf(n),
        num_obstacle_collisions=zf(n),
        goal_min_time=zf(n),
        t=jnp.zeros((), jnp.int32),
        sim_time=zf(),
        action_diff=zf(n),
        safety_violations=jnp.zeros((n,), bool),
    )


def _place_landmarks(params: EnvParams, tube: TubeParams, dtype) -> Array:
    """Landmark positions for the configured formation.

    ``point`` (utils.py ``set_landmarks_in_point``:165-194): every landmark at
    ``exit + R(angle) @ [0, -world_size/3]`` — a single merge point one third
    of the world past the corridor exit.
    ``circle`` (utils.py:231+): ring of radius world_size/3 centred past the
    exit.  ``line``: linspace between given endpoints (july:493).
    """
    l = params.num_landmarks
    ws = params.world_size
    if params.formation_type == "point":
        c, s = jnp.cos(tube.angle), jnp.sin(tube.angle)
        # R=[[c,s],[-s,c]] @ [0, -ws/3]
        offset = jnp.stack([-s * (ws / 3), -c * (ws / 3)])
        pos = tube.exit + offset
        return jnp.broadcast_to(pos, (l, 2)).astype(dtype)
    if params.formation_type == "circle":
        center = jnp.stack([jnp.asarray(0.0, dtype), tube.exit[1] + ws / 5])
        ang = 2 * jnp.pi * jnp.arange(l) / l
        return (center + (ws / 3) * jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)).astype(dtype)
    if params.formation_type == "line":
        start = jnp.asarray([-ws / 2, -ws / 2], dtype)
        end = jnp.asarray([ws / 2, -ws / 2], dtype)
        frac = jnp.linspace(0.0, 1.0, l)[:, None].astype(dtype)
        return start + frac * (end - start)
    raise ValueError(f"unknown formation_type {params.formation_type!r}")


def _spawn_agents(params: EnvParams, tube: TubeParams, key: Array, dtype):
    """Sequential rejection-sampled spawn along the pre-entrance axis.

    july:452-486: agent k tries ``entrance + (world_size+k)/5 * perp + jitter``
    with jitter ~ 0.2*U(-ws, ws)^2, rejected while within separation distance
    of an already-placed agent (or an obstacle).  perp = [sin(a), cos(a)],
    which points backwards along the corridor axis.
    """
    n = params.num_agents
    ws = params.world_size
    jr = params.spawn_jitter_range  # ws, except v4oct's hard-coded 10
    perp = jnp.stack([jnp.sin(tube.angle), jnp.cos(tube.angle)]).astype(dtype)
    sep = params.cfg.separation_distance
    obstacle_pos = jnp.zeros((params.num_obstacles, 2), dtype)

    # The reference rejection-samples each agent with an unbounded while loop
    # (july:452-486).  On TPU a data-dependent while under vmap serializes the
    # whole batch on the slowest lane, so the jit path draws a fixed block of
    # K candidates per agent and takes the first collision-free one — same
    # proposal distribution, failure probability < (reject_rate)^K ~ 1e-10.
    # The numpy parity reset keeps the exact unbounded-rejection semantics.
    K = 32

    jscale = params.spawn_jitter_scale
    sdiv = params.spawn_spacing_div

    def place_one(carry, k):
        key, placed = carry
        key, jkey = jax.random.split(key)
        jitter = jscale * jax.random.uniform(jkey, (K, 2), dtype, -jr, jr)
        base = tube.entrance + (ws + k.astype(dtype)) / sdiv * perp
        cand = base + jitter  # (K, 2)
        d = jnp.linalg.norm(placed[None, :, :] - cand[:, None, :], axis=-1)  # (K, n)
        valid_prev = jnp.arange(n) < k
        collide = jnp.any(valid_prev[None, :] & (d < sep), axis=-1)  # (K,)
        if params.num_walls:
            from . import corridor as corridor_mod

            collide |= jax.vmap(corridor_mod._wall_collision)(cand)
        if params.num_obstacles:
            # July never places obstacles in reset, so they sit at the origin
            # (core.py:400 default state); spawn still rejects within
            # 2*(size_o + size_a) of them (july:864-874).
            d_obs = jnp.linalg.norm(
                obstacle_pos[None, :, :] - cand[:, None, :], axis=-1
            )
            collide |= jnp.any(d_obs < 2.0 * (AGENT_SIZE + AGENT_SIZE), axis=-1)
        first_ok = jnp.argmax(~collide)  # first valid candidate (0 if none)
        pos = cand[first_ok]
        placed_new = placed.at[k].set(pos)
        return (key, placed_new), pos

    init = (key, jnp.zeros((n, 2), dtype))
    (key, placed), _ = jax.lax.scan(place_one, init, jnp.arange(n))
    return key, placed


def _initial_velocity(params: EnvParams, key: Array, n: int, dtype):
    """reset_velocity() at spawn (core.py:145-153, 223-225, 324-333).

    Heading models draw theta ~ U(0, 2pi) and set speed = v_min; the double
    integrator zeroes velocity (no RNG draw).
    """
    cfg = params.cfg
    if cfg.dynamics == DynamicsType.DOUBLE_INTEGRATOR:
        return key, jnp.zeros((n,), dtype), jnp.zeros((n,), dtype)
    key, tkey = jax.random.split(key)
    theta = jax.random.uniform(tkey, (n,), dtype, 0.0, 2 * jnp.pi)
    speed = jnp.full((n,), cfg.v_min, dtype)
    return key, theta, speed


def _reset_sequential(params: EnvParams, key: Array, dtype) -> EnvState:
    """Sequential-family reset (sequential ``reset_world``:266-430): agents
    spawn uniformly in the upper band, fixed axis-aligned tubes, goals at the
    first tube's exit point."""
    from . import sequential as seq

    n, ws = params.num_agents, params.world_size
    key, tube_key = jax.random.split(key)
    key, tubes, _choice = seq.make_tubes(params, tube_key, dtype)

    # rejection-sampled uniform spawns in 0.9*[(-ws, ws/4), (ws, ws)]
    sep = params.cfg.separation_distance
    K = 32

    def place_one(carry, k):
        key, placed = carry
        key, pk = jax.random.split(key)
        lo = jnp.asarray([-ws, ws / 4], dtype) * 0.9
        hi = jnp.asarray([ws, ws], dtype) * 0.9
        cand = jax.random.uniform(pk, (K, 2), dtype, 0.0, 1.0) * (hi - lo) + lo
        d = jnp.linalg.norm(placed[None, :, :] - cand[:, None, :], axis=-1)
        valid_prev = jnp.arange(n) < k
        collide = jnp.any(valid_prev[None, :] & (d < sep), axis=-1)
        pos = cand[jnp.argmax(~collide)]
        return (key, placed.at[k].set(pos)), pos

    (key, agent_pos), _ = jax.lax.scan(
        place_one, (key, jnp.zeros((n, 2), dtype)), jnp.arange(n)
    )
    key, theta, speed = _initial_velocity(params, key, n, dtype)
    if params.cfg.dynamics == DynamicsType.DOUBLE_INTEGRATOR:
        agent_states = jnp.concatenate([agent_pos, jnp.zeros((n, 2), dtype)], axis=-1)
    else:
        agent_states = jnp.concatenate(
            [agent_pos, theta[:, None], speed[:, None]], axis=-1
        )
    landmark_pos = seq.initial_landmarks(params, tubes, dtype)
    tube0 = seq.tube_of(tubes, 0)
    fields = _blank_state(params, tube0, dtype)
    goal = landmark_pos[fields["goal_match"]]
    fields["goal_min_time"] = (
        jnp.linalg.norm(agent_pos - goal, axis=-1) / params.max_speed
    ).astype(dtype)
    return EnvState(
        agent_states=agent_states,
        prev_phase=jnp.zeros((n,), jnp.int32),
        landmark_pos=landmark_pos,
        key=key,
        tubes=tubes,
        current_tube=jnp.zeros((n,), jnp.int32),
        **fields,
    )


def _reset_fairassign(params: EnvParams, key: Array, dtype) -> EnvState:
    """Fairassign reset (ref random_scenario:301-390): agents cluster above
    the tube entrance within radius 0.15*ws; landmarks on a line through the
    projected exit (formation 'line') or at the july merge point."""
    n, ws = params.num_agents, params.world_size
    key, tkey = jax.random.split(key)
    angle = jax.random.uniform(tkey, (), dtype, -jnp.pi / 2, jnp.pi / 2)
    tube = tube_mod.make_tube(angle, ws, AGENT_SIZE, dtype)
    center = tube.entrance + jnp.asarray([0.0, ws * 0.2], dtype)
    radius = ws * 0.15
    sep = params.cfg.separation_distance
    K = 32

    def place_one(carry, k):
        key, placed = carry
        key, pk = jax.random.split(key)
        cand = center + jax.random.uniform(pk, (K, 2), dtype, -radius, radius)
        in_bounds = jnp.all(jnp.abs(cand) <= ws / 2 * 0.9, axis=-1)
        d = jnp.linalg.norm(placed[None, :, :] - cand[:, None, :], axis=-1)
        valid_prev = jnp.arange(n) < k
        collide = jnp.any(valid_prev[None, :] & (d < sep), axis=-1)
        ok = in_bounds & ~collide
        pos = cand[jnp.argmax(ok)]
        return (key, placed.at[k].set(pos)), pos

    (key, agent_pos), _ = jax.lax.scan(
        place_one, (key, jnp.zeros((n, 2), dtype)), jnp.arange(n)
    )
    key, theta, speed = _initial_velocity(params, key, n, dtype)
    if params.cfg.dynamics == DynamicsType.DOUBLE_INTEGRATOR:
        agent_states = jnp.concatenate([agent_pos, jnp.zeros((n, 2), dtype)], axis=-1)
    else:
        agent_states = jnp.concatenate(
            [agent_pos, theta[:, None], speed[:, None]], axis=-1
        )

    l = params.num_landmarks
    if params.formation_type == "line":
        # goal line along the tube angle through the exit projected to
        # y = -0.45*ws (ref:338-373)
        half = ws * 0.8 / 2
        tube_dir = jnp.stack([jnp.sin(angle), -jnp.cos(angle)])
        goal_cy = -ws / 2 * 0.9
        proj = (tube.exit[1] - goal_cy) / tube_dir[1]
        goal_cx = tube.exit[0] + tube_dir[0] * proj
        gc = jnp.stack([goal_cx, goal_cy])
        start = gc - half * jnp.stack([jnp.cos(angle), jnp.sin(angle)])
        end = gc + half * jnp.stack([jnp.cos(angle), jnp.sin(angle)])
        frac = jnp.linspace(0.0, 1.0, l)[:, None].astype(dtype)
        landmark_pos = (start + frac * (end - start)).astype(dtype)
    else:
        landmark_pos = _place_landmarks(params, tube, dtype)

    fields = _blank_state(params, tube, dtype)
    goal = landmark_pos[fields["goal_match"]]
    fields["goal_min_time"] = (
        jnp.linalg.norm(agent_pos - goal, axis=-1) / params.max_speed
    ).astype(dtype)
    return EnvState(
        agent_states=agent_states,
        prev_phase=jnp.zeros((n,), jnp.int32),
        landmark_pos=landmark_pos,
        key=key,
        **fields,
    )


def reset(params: EnvParams, key: Array, dtype=jnp.float32) -> EnvState:
    """Pure-JAX episode reset.

    ``prev_phase`` is initialized to zeros here; ``env.auto_reset`` carries the
    previous episode's value through instead, replicating the reference's
    never-cleared ``agent.previous_phase`` (see types.py).
    """
    if params.scenario in (
        "sequential",
        "sequential_random",
        "sequential_split",
    ):
        return _reset_sequential(params, key, dtype)
    if params.scenario == "fairassign":
        return _reset_fairassign(params, key, dtype)
    key, akey, tkey = jax.random.split(key, 3)
    if params.fixed_tube_angle is not None:
        # v4oct pins the angle (v4oct:548); no draw
        angle = jnp.asarray(params.fixed_tube_angle, dtype)
    else:
        angle = jax.random.uniform(tkey, (), dtype, -jnp.pi / 2, jnp.pi / 2)
    length = None
    if params.randomize_tube_length:
        # two_phase setup: length = 0.8ws + U(-0.3ws, 0.1ws)
        key, lkey = jax.random.split(key)
        ws = params.world_size
        length = ws * 0.8 + jax.random.uniform(lkey, (), dtype, -0.3 * ws, 0.1 * ws)
    tube = tube_mod.make_tube(angle, params.world_size, AGENT_SIZE, dtype, length)
    key, agent_pos = _spawn_agents(params, tube, akey, dtype)
    key, theta, speed = _initial_velocity(params, key, params.num_agents, dtype)
    if params.cfg.dynamics == DynamicsType.DOUBLE_INTEGRATOR:
        agent_states = jnp.concatenate(
            [agent_pos, jnp.zeros((params.num_agents, 2), dtype)], axis=-1
        )
    else:
        agent_states = jnp.concatenate(
            [agent_pos, theta[:, None], speed[:, None]], axis=-1
        )
    landmark_pos = _place_landmarks(params, tube, dtype)
    fields = _blank_state(params, tube, dtype)
    goal = landmark_pos[fields["goal_match"]]
    min_time = jnp.linalg.norm(agent_pos - goal, axis=-1) / params.max_speed
    fields["goal_min_time"] = min_time.astype(dtype)
    if params.scenario == "v4oct":
        # the stale position cache (see EnvState.frozen_pos); on a fresh env
        # it holds this reset's spawn, and auto-reset carries it unchanged
        fields["frozen_pos"] = agent_pos
    return EnvState(
        agent_states=agent_states,
        prev_phase=jnp.zeros((params.num_agents,), jnp.int32),
        landmark_pos=landmark_pos,
        key=key,
        **fields,
    )


# ---------------------------------------------------------------------------
# Host-side numpy mirror of the reference reset (consumes np.random's global
# stream in the reference's exact call order).
# ---------------------------------------------------------------------------


def reset_parity_numpy(params: EnvParams, prev_phase: np.ndarray | None = None) -> EnvState:
    """Reset via numpy's global RNG, call-order-compatible with the reference.

    Call order (reset_world july:339-421 -> random_scenario:440-515):
      1. wall_length ~ U(0.2, 0.8)                     (july:368)
      2. tube angle ~ U(-pi/2, pi/2)                   (july:530)
      3. per spawn attempt: jitter ~ 0.2*U(-ws, ws)^2  (july:462)
         on acceptance: heading ~ U(0, 2pi) [heading models] (core.py:328)
      4. landmark placement (no draws for 'point')
    """
    cfg = params.cfg
    n, ws = params.num_agents, params.world_size
    dtype = np.float64
    np.random.uniform(0.2, 0.8)  # wall_length draw (value unused; stream parity)
    if params.fixed_tube_angle is not None:
        angle = params.fixed_tube_angle  # v4oct: fixed, no draw (v4oct:548)
    else:
        angle = np.random.uniform(-np.pi / 2, np.pi / 2)
    length = None
    if params.randomize_tube_length:
        length = ws * 0.8 + np.random.uniform(-ws * 0.3, ws * 0.1)
    tube = tube_mod.make_tube(
        jnp.asarray(angle, jnp.float64), ws, AGENT_SIZE, jnp.float64, length
    )
    perp = np.array([np.sin(angle), np.cos(angle)])
    entrance = np.asarray(tube.entrance)
    placed: list[np.ndarray] = []
    thetas, speeds = [], []
    obstacle_pos = np.zeros((params.num_obstacles, 2))
    while len(placed) < n:
        k = len(placed)
        jr = params.spawn_jitter_range
        jitter = params.spawn_jitter_scale * np.random.uniform(-jr, jr, 2)
        pos = entrance + (ws + k) / params.spawn_spacing_div * perp + jitter
        obs_collide = any(
            np.linalg.norm(o - pos) < 2.0 * (AGENT_SIZE + AGENT_SIZE)
            for o in obstacle_pos
        )
        agent_collide = any(
            np.linalg.norm(p - pos) < cfg.separation_distance for p in placed
        )
        if obs_collide or agent_collide:
            continue
        placed.append(pos)
        if cfg.dynamics == DynamicsType.DOUBLE_INTEGRATOR:
            thetas.append(0.0)
            speeds.append(0.0)
        else:
            thetas.append(np.random.uniform(0, 2 * np.pi))
            speeds.append(cfg.v_min)
    agent_pos = np.stack(placed)
    if cfg.dynamics == DynamicsType.DOUBLE_INTEGRATOR:
        agent_states = np.concatenate([agent_pos, np.zeros((n, 2))], axis=-1)
    else:
        agent_states = np.concatenate(
            [agent_pos, np.array(thetas)[:, None], np.array(speeds)[:, None]], axis=-1
        )
    landmark_pos = np.asarray(_place_landmarks(params, tube, jnp.float64))
    fields = _blank_state(params, tube, jnp.float64)
    goal = landmark_pos[np.asarray(fields["goal_match"])]
    fields["goal_min_time"] = jnp.asarray(
        np.linalg.norm(agent_pos - goal, axis=-1) / params.max_speed
    )
    if prev_phase is None:
        prev_phase = np.zeros((n,), np.int32)
    if params.scenario == "v4oct":
        fields["frozen_pos"] = jnp.asarray(agent_pos)
    return EnvState(
        agent_states=jnp.asarray(agent_states),
        prev_phase=jnp.asarray(prev_phase, jnp.int32),
        landmark_pos=jnp.asarray(landmark_pos),
        key=jax.random.PRNGKey(0),
        **fields,
    )
