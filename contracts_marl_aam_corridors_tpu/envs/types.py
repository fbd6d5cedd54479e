"""Struct-of-arrays environment state and parameters.

The reference scatters episode state across mutable ``World``/``Agent``/
``Scenario`` objects (``multiagent/core.py:346-1005``, scenario attributes in
``custom_scenarios/nav_metered_one_goal_graph_rotate_tube_july.py:339-438``).
Here every piece of that state lives in one immutable pytree so the whole env
step is a pure function that ``vmap``/``scan``/``shard_map`` compose over.

Entity ordering in the flattened "graph" axis matches the reference's
``World.entities`` property (core.py:574-582): agents, then landmarks, then
obstacles (walls excluded in the primary configs).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..config.physics import RewardToggles, RewardWeights, VehicleConfig

Array = jax.Array


@struct.dataclass
class EnvParams:
    """Static (hashable) environment configuration.

    One ``EnvParams`` = one compiled step function.  Mirrors the scenario
    parameters pulled from ``args`` in the reference's ``make_world``
    (july:154-242) plus the physics config class.
    """

    cfg: VehicleConfig = struct.field(pytree_node=False)
    scenario: str = struct.field(pytree_node=False, default="rotate_tube_july")
    num_agents: int = struct.field(pytree_node=False, default=3)
    num_landmarks: int = struct.field(pytree_node=False, default=3)
    num_obstacles: int = struct.field(pytree_node=False, default=0)
    # Axis-aligned walls (reference ``Wall``, core.py:354-368; july:315-323
    # creates them with DEFAULT geometry: horizontal, axis_pos 0, endpoints
    # (-1, 1), width 0.1 — never placed elsewhere).  NOTE the reference's
    # graph path crashes with walls (no ``state.p_pos`` for distances and
    # ragged 13- vs 8-dim node rows); here walls get a nominal center
    # position for the distance matrix and node rows pad to 13 dims.
    num_walls: int = struct.field(pytree_node=False, default=0)
    episode_length: int = struct.field(pytree_node=False, default=25)
    world_size: float = struct.field(pytree_node=False, default=2.0)
    total_actions: int = struct.field(pytree_node=False, default=5)
    collision_rew: float = struct.field(pytree_node=False, default=5.0)
    goal_rew: float = struct.field(pytree_node=False, default=50.0)
    formation_rew: float = struct.field(pytree_node=False, default=1.0)
    fair_rew: float = struct.field(pytree_node=False, default=1.0)
    max_speed: float = struct.field(pytree_node=False, default=2.0)
    formation_type: str = struct.field(pytree_node=False, default="point")
    use_dones: bool = struct.field(pytree_node=False, default=False)
    # observation/graph feature mode ('relative' is the trained default)
    graph_feat_type: str = struct.field(pytree_node=False, default="relative")
    reward_weights: RewardWeights = struct.field(
        pytree_node=False, default_factory=RewardWeights
    )
    reward_toggles: RewardToggles = struct.field(
        pytree_node=False, default_factory=RewardToggles
    )
    use_safety_filter: bool = struct.field(pytree_node=False, default=False)
    # 'hj' (air-taxi HJ grid), 'exp_cbf' (closed-form DI CBF), or 'rvo'
    # (ORCA velocity projection, DI) — train_mpe.py:106-108 choices + rvo
    safety_filter_type: str = struct.field(pytree_node=False, default="hj")
    # Parity hook: when set, goal-reach velocity resets use this fixed heading
    # instead of a random draw (reference core.py:324-333 draws U(0, 2pi));
    # lets golden tests compare trajectories bit-for-bit.
    parity_fixed_reset_theta: Optional[float] = struct.field(
        pytree_node=False, default=None
    )
    # Entrance-gate ratios (july:611-613).
    gate_front_ratio: float = struct.field(pytree_node=False, default=0.08)
    gate_back_ratio: float = struct.field(pytree_node=False, default=0.02)
    # Exit-gate ratios (rot_inv:619-620; two/three_phase use exit_back 0.02).
    exit_back_ratio: float = struct.field(pytree_node=False, default=0.05)
    exit_front_ratio: float = struct.field(pytree_node=False, default=0.08)
    # 'closed_form' (exact, TPU hot path) or 'rk45' (scipy-replica, parity).
    integrator: str = struct.field(pytree_node=False, default="closed_form")

    @property
    def num_entities(self) -> int:
        return self.num_agents + self.num_landmarks + self.num_obstacles + self.num_walls

    @property
    def node_feat_dim(self) -> int:
        # july (8): [rel_vel(2), rel_pos(2), rel_goal(2), occupied(1), type(1)]
        # rot_inv / two_phase / three_phase (7): rotated, no occupied flag
        # (rot_inv:1690-1740)
        # fairassign (13): adds goal_history + two rel_pos padding slots
        if self.scenario in ("rot_inv", "two_phase", "three_phase"):
            return 7
        if self.scenario == "fairassign":
            return 13
        if self.num_walls > 0:
            return 13  # wall rows carry corner features (july:1765-1767)
        return 8

    @property
    def obs_dim(self) -> int:
        if self.scenario == "rot_inv":
            return 13  # rot_inv:1453-1556
        if self.scenario in ("two_phase", "three_phase"):
            return 15  # two_phase observation (adds heading_alignment(2))
        return 19

    @property
    def spawn_jitter_range(self) -> float:
        """Spawn jitter draw bound: U(-ws, ws) everywhere except v4oct's
        hard-coded U(-10, 10) (v4oct:481)."""
        return 10.0 if self.scenario == "v4oct" else self.world_size

    @property
    def fixed_tube_angle(self):
        """v4oct pins the tube angle to -pi/2 instead of drawing it
        (v4oct:547-548); None means draw U(-pi/2, pi/2) (july:530)."""
        import math

        return -math.pi / 2 if self.scenario == "v4oct" else None

    @property
    def randomize_tube_length(self) -> bool:
        """two/three_phase draw length += U(-0.3ws, 0.1ws) (two_phase setup)."""
        return self.scenario in ("two_phase", "three_phase")

    @property
    def exit_back(self) -> float:
        # two/three_phase override exit_back_ratio to 0.02
        if self.scenario in ("two_phase", "three_phase"):
            return 0.02
        return self.exit_back_ratio

    @property
    def spawn_jitter_scale(self) -> float:
        """Spawn jitter: 0.2*U (july:462) vs 0.3*U (rot_inv/two/three_phase)."""
        return 0.3 if self.scenario in ("rot_inv", "two_phase", "three_phase") else 0.2

    @property
    def spawn_spacing_div(self) -> float:
        """distance_from_entrance = (ws+k)/5 (july) vs /3 (rot_inv family)."""
        return 3.0 if self.scenario in ("rot_inv", "two_phase", "three_phase") else 5.0

    @property
    def cooldown_steps(self) -> int:
        """phase_reward_cooldown_steps: ep_len/10 (rot_inv:228) or full ep_len
        (two/three_phase).  july never uses the cooldown in its reward."""
        if self.scenario in ("two_phase", "three_phase"):
            return int(self.episode_length)
        return int(self.episode_length / 10)

    @property
    def num_actions(self) -> int:
        from ..config.physics import DynamicsType

        if self.cfg.dynamics == DynamicsType.DOUBLE_INTEGRATOR:
            return self.total_actions
        return self.cfg.num_motion_primitives


@struct.dataclass
class TubeParams:
    """Rotated corridor geometry (reference july ``setup_tube_params``:518-613)."""

    entrance: Array  # (2,)
    exit: Array  # (2,)
    width: Array  # ()
    angle: Array  # ()
    length: Array  # ()  nominal 0.8*world_size
    e: Array  # (2,) unit corridor direction entrance->exit
    n: Array  # (2,) left-hand normal
    frame_length: Array  # () ||exit-entrance|| + 1e-9 (reference 'L')
    half_width: Array  # ()


@struct.dataclass
class EnvState:
    """Complete per-environment episode state."""

    # --- physical agent state (reference core.py BaseEntityState) ---
    agent_states: Array  # (N, 4)
    p_dist: Array  # (N,) odometry
    time: Array  # (N,) per-agent clock
    status: Array  # (N,) bool: True once frozen at goal (july:1187-1191)
    # --- phase machine (july:683-733, 1146-1204) ---
    prev_phase: Array  # (N,) int32 — persists across resets, like the
    #   reference's lazily-created ``agent.previous_phase`` which reset_world
    #   never clears (a deliberate parity quirk)
    phase_reached: Array  # (N,) int32
    entry_cooldown: Array  # (N,) int32
    prev_proj: Array  # (N,) rot_inv progress-reward state (rot_inv:1265-1275)
    # --- scene ---
    tube: TubeParams
    landmark_pos: Array  # (L, 2)
    obstacle_pos: Array  # (O, 2)
    occupied: Array  # (N,) landmark_poses_occupied (july:506)
    goal_match: Array  # (N,) int32 goal_match_index (identity each reset)
    goal_tracker: Array  # (N,) int32, -1 until agent freezes on its goal
    goal_reached: Array  # (N,) int32 nearest-landmark bookkeeping (info)
    goal_history: Array  # (L,) int32 which agent last occupied each goal
    # --- episode metrics (scenario + world stats) ---
    spacing_violation: Array  # (N,)
    conformance: Array  # (N,)
    steps_in_corridor: Array  # (N,)
    delta_spacing_sum: Array  # () running sum of per-call spacing errors
    times_required: Array  # (N,)
    dists_to_goal: Array  # (N,)
    dist_left_to_goal: Array  # (N,) int-truncated on store (reference parity)
    dist_left_float: Array  # (N,) precise float distance (ours-only metric)
    num_agent_collisions: Array  # (N,)
    num_obstacle_collisions: Array  # (N,)
    goal_min_time: Array  # (N,)
    # --- clocks & rng ---
    t: Array  # () int32 step counter (world.current_time_step)
    sim_time: Array  # ()
    key: Array  # jax PRNG key
    # --- v4oct frozen position cache (None elsewhere) ---
    # v4oct keys its position cache on a nonexistent ``world.step_count``
    # (v4oct:334-341, getattr default 0), so the cache updates exactly once —
    # at the construction-time observation probe — and is stale forever after
    # (across steps AND episodes).  Neighbor selection in ``observation`` and
    # agent-collision tests in ``reward`` consume these frozen positions.
    frozen_pos: Optional[Array] = None  # (N, 2)
    # --- sequential-scenario extras (None elsewhere) ---
    tubes: Optional[TubeParams] = None  # stacked tubes, leading axis n_tubes
    current_tube: Optional[Array] = None  # (N,) int32 per-agent tube index
    # --- safety filter bookkeeping (core.py:691-736) ---
    action_diff: Optional[Array] = None  # (N,) ||u_raw - u_filtered||
    safety_violations: Optional[Array] = None  # (N,) bool "filtered" flags


@struct.dataclass
class TimeStep:
    """Everything the learner consumes per step, stacked over agents.

    Matches the tuple returned by ``MultiAgentGraphEnv.step``
    (multiagent/environment.py:1021-1063): per-agent obs, agent ids, node
    features, adjacency, rewards, dones, plus auto-reset bookkeeping.
    """

    obs: Array  # (N, obs_dim)
    agent_id: Array  # (N, 1)
    node_obs: Array  # (N, E, F)
    adj: Array  # (N, E, E)
    reward: Array  # (N,)
    done: Array  # (N,) bool
    info: dict = struct.field(default_factory=dict)
    # done solely because the episode clock hit episode_length (a TIME-LIMIT
    # truncation, not a terminal goal-freeze) — drives bad_masks for
    # use_proper_time_limits GAE (graph_buffer.py:162,312).  None == no
    # truncation info (classic-MPE paths).
    truncated: Optional[Array] = None  # (N,) bool
