"""Golden-trajectory parity vs the reference implementation.

Seeds numpy's global RNG, builds the reference env (july scenario) and the
JAX env from the same stream via ``reset_parity_numpy``, then drives both
with identical action sequences comparing observations, rewards, dones,
node features and adjacency every step.

Goal-reach velocity resets draw a random heading in the reference
(core.py:328); both sides pin it to a fixed value (FixedUniform /
``parity_fixed_reset_theta``) so trajectories stay comparable.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ref_oracle
from contracts_marl_aam_corridors_tpu.config import physics
from contracts_marl_aam_corridors_tpu.envs import corridor, reset as reset_mod
from contracts_marl_aam_corridors_tpu.envs.types import EnvParams

FIXED_THETA = 1.2345


REF_SCENARIO = {
    "rotate_tube_july": "nav_metered_one_goal_graph_rotate_tube_july",
    "rot_inv": "nav_graph_metered_single_corridor_rot_inv",
    "two_phase": "two_phase_graph",
    "three_phase": "three_phase_graph",
    "v4oct": "nav_metered_one_goal_graph_rotate_tube_v4oct",
}


def make_params(args, dynamics, scenario="rotate_tube_july"):
    return EnvParams(
        cfg=physics.vehicle_config(dynamics),
        scenario=scenario,
        num_agents=args.num_agents,
        num_landmarks=args.num_landmarks,
        num_obstacles=args.num_obstacles,
        episode_length=args.episode_length,
        world_size=args.world_size,
        total_actions=args.total_actions,
        collision_rew=args.collision_rew,
        goal_rew=args.goal_rew,
        formation_rew=args.formation_rew,
        max_speed=args.max_speed,
        formation_type=args.formation_type,
        use_dones=args.use_dones,
        parity_fixed_reset_theta=FIXED_THETA,
        integrator="rk45",
    )


def drive_parity(
    dynamics, num_agents, num_obstacles, episode_length, seed, steps,
    scenario="rotate_tube_july",
):
    args = ref_oracle.make_args(
        num_agents=num_agents,
        num_landmarks=num_agents,
        num_obstacles=num_obstacles,
        episode_length=episode_length,
        dynamics_type=dynamics,
        total_actions=5 if dynamics == "double_integrator" else 25,
    )
    params = make_params(args, dynamics, scenario)

    # --- reference: construction consumes (make_world draw + reset_world
    # stream); training then resets once more ---
    np.random.seed(seed)
    env, sc, world = ref_oracle.make_ref_env(args, REF_SCENARIO[scenario])
    env.reset()

    # --- ours: mirror the same global-stream consumption ---
    np.random.seed(seed)
    np.random.uniform(0.2, 0.4)  # make_world wall_length draw (july:312)
    construction = reset_mod.reset_parity_numpy(params)  # construction reset_world
    state = reset_mod.reset_parity_numpy(params)  # training reset
    if scenario == "v4oct":
        # v4oct's position cache froze at the construction-time observation
        # probe (environment.py:141-143 + v4oct:334-341) — NOT this episode's
        # spawn; inject the construction positions
        state = state.replace(frozen_pos=construction.frozen_pos)
    state, obs0, node0, adj0, _ = corridor.reset_outputs(params, state)

    # compare reset
    ref_obs0 = np.stack([env._get_obs(a) for a in world.policy_agents])
    # NOTE: _get_obs mutates phase state; grab reset obs from env.reset output instead
    # (see drive loop below for the real comparison)

    num_actions = env.action_space[0].n
    assert num_actions == params.num_actions

    # pin goal-reach heading draws on the reference side
    orig_uniform = np.random.uniform
    np.random.uniform = ref_oracle.FixedUniform(FIXED_THETA, orig_uniform)
    # jitted step — also exercises compilability of the full kernel
    from functools import partial

    step_fn = jax.jit(partial(corridor.step, params))
    try:
        rng = np.random.RandomState(seed + 999)
        freeze_events = 0
        prev_status = np.zeros(num_agents, bool)
        for t in range(steps):
            acts = rng.randint(0, num_actions, size=num_agents)
            ref_out = env.step(ref_oracle.one_hot_actions(acts, num_actions))
            robs, rid, rnode, radj, rrew, rdone, rinfo = ref_out
            state, ts = step_fn(state, jnp.asarray(acts))

            # ---- info parity (july info_callback:741-829) ----
            # All logged metrics must match exactly EXCEPT the collision
            # counters: the reference interleaves info_callback with the
            # reward sweep, so counts around the exact step an agent freezes
            # can differ by one per freeze event (documented at
            # corridor._update_info_stats).  This asserts that bound.
            status_now = np.asarray(state.status)
            freeze_events += int((status_now & ~prev_status).sum())
            prev_status = status_now
            ours_info = {k: np.asarray(v) for k, v in ts.info.items()}
            exact_keys = [
                "Dist_to_goal", "Time_req_to_goal", "Dists_traveled",
                "Time_taken", "Min_time_to_goal", "Conformance",
                "Spacing_violations",
            ]
            for k in exact_keys:
                if k not in rinfo[0]:
                    continue
                want = np.array([ri[k] for ri in rinfo], dtype=np.float64)
                np.testing.assert_allclose(
                    ours_info[k], want, atol=1e-9, rtol=0,
                    err_msg=f"info[{k}] mismatch at step {t}",
                )
            for k in ("Num_agent_collisions", "Num_obst_collisions"):
                want = np.array([ri[k] for ri in rinfo], dtype=np.float64)
                diff = np.abs(ours_info[k] - want)
                assert np.all(diff <= freeze_events), (
                    f"info[{k}] diverged beyond the freeze-event bound at "
                    f"step {t}: diff={diff} freeze_events={freeze_events}"
                )

            np.testing.assert_allclose(
                np.asarray(ts.obs), np.stack(robs), atol=1e-9, rtol=0,
                err_msg=f"obs mismatch at step {t}",
            )
            np.testing.assert_allclose(
                np.asarray(ts.reward), np.array(rrew, dtype=np.float64),
                atol=1e-9, rtol=0, err_msg=f"reward mismatch at step {t}",
            )
            np.testing.assert_array_equal(
                np.asarray(ts.done), np.array(rdone), err_msg=f"done mismatch at step {t}"
            )
            np.testing.assert_allclose(
                np.asarray(ts.node_obs), np.stack(rnode), atol=1e-9, rtol=0,
                err_msg=f"node_obs mismatch at step {t}",
            )
            np.testing.assert_allclose(
                np.asarray(ts.adj), np.asarray(radj[0]), atol=1e-9, rtol=0,
                err_msg=f"adj mismatch at step {t}",
            )
    finally:
        np.random.uniform = orig_uniform


@pytest.mark.parametrize("seed", [0, 7])
def test_parity_airtaxi_3_agents(seed):
    drive_parity("air_taxi", 3, 0, 60, seed, steps=59)


def test_parity_airtaxi_5_agents():
    # NOTE: the reference itself crashes with num_obstacles > 0 — its
    # graph_observation builds a disconnected mask of length N+L but indexes
    # the (N+L+O)-sized adjacency with it (july:1627-1648, IndexError).  Our
    # env supports obstacles (they pad the mask with False); parity can only
    # be checked for the obstacle-free configs the reference can execute.
    drive_parity("air_taxi", 5, 0, 50, seed=3, steps=49)


def test_parity_double_integrator():
    drive_parity("double_integrator", 3, 0, 25, seed=1, steps=24)


def test_parity_200_step_episode():
    """BASELINE.json correctness config: 200-step single-env episode."""
    drive_parity("air_taxi", 3, 0, 200, seed=42, steps=200)


@pytest.mark.parametrize("seed", [0, 11])
def test_parity_rot_inv(seed):
    drive_parity("air_taxi", 3, 0, 75, seed=seed, steps=74, scenario="rot_inv")


def test_parity_two_phase():
    drive_parity("air_taxi", 3, 0, 75, seed=5, steps=74, scenario="two_phase")


def test_parity_three_phase():
    drive_parity("air_taxi", 3, 0, 75, seed=9, steps=74, scenario="three_phase")


def test_parity_unicycle():
    drive_parity("unicycle_vehicle", 3, 0, 40, seed=2, steps=39)


@pytest.mark.parametrize("seed", [0, 13])
def test_parity_v4oct_unicycle(seed):
    """v4oct (nav_metered_one_goal_graph_rotate_tube_v4oct) — NOT july:
    fixed -pi/2 tube, +-10 jitter, frozen position cache, {0,1} phases,
    uncipped simple reward.  No air_taxi branch upstream (v4oct:163-211), so
    parity runs the unicycle and DI dynamics it supports."""
    drive_parity("unicycle_vehicle", 3, 0, 40, seed=seed, steps=39,
                 scenario="v4oct")


def test_parity_v4oct_double_integrator():
    drive_parity("double_integrator", 3, 0, 25, seed=4, steps=24,
                 scenario="v4oct")
