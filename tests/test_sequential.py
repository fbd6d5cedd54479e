"""Sequential two-/three-tube scenario tests.

The reference sequential scenarios cannot run (missing ``marl_fair_assign``
module + a broken ``set_landmarks_in_point`` call — see envs/sequential.py),
so these are behavior tests of the reconstructed semantics rather than golden
parity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
from contracts_marl_aam_corridors_tpu.envs import corridor, env as env_mod, sequential as seq
from contracts_marl_aam_corridors_tpu.envs import reset as reset_mod
from contracts_marl_aam_corridors_tpu.envs.types import EnvParams


def make_params(scenario="sequential", n=3, ws=4.0, ep=50):
    return EnvParams(
        cfg=vehicle_config("air_taxi"),
        scenario=scenario,
        num_agents=n,
        num_landmarks=n,
        episode_length=ep,
        world_size=ws,
        collision_rew=5.0,
        goal_rew=20.0,
    )


def test_tube_geometry_and_phase():
    params = make_params()
    key, tubes, choice = seq.make_tubes(params, jax.random.PRNGKey(0), jnp.float64)
    t0 = seq.tube_of(tubes, 0)
    t1 = seq.tube_of(tubes, 1)
    ws = params.world_size
    np.testing.assert_allclose(np.asarray(t0.entrance), [0, ws / 4])
    np.testing.assert_allclose(np.asarray(t0.exit), [0, -ws / 4])
    assert float(t1.exit[0]) > float(t1.entrance[0])  # rightward second tube

    # vertical tube phases
    assert int(seq.agent_phase(t0, jnp.asarray([0.0, ws / 2]))) == 0  # above
    assert int(seq.agent_phase(t0, jnp.asarray([0.0, 0.0]))) == 1  # inside
    assert int(seq.agent_phase(t0, jnp.asarray([0.0, -ws / 2]))) == 2  # past
    # outside the width is not in tube
    assert int(seq.agent_phase(t0, jnp.asarray([ws / 2, 0.0]))) == 0

    # horizontal tube: past its exit (to the right)
    assert int(seq.agent_phase(t1, jnp.asarray(np.asarray(t1.exit) + [0.5, 0.0]))) == 2


def test_tube_switch_and_landmark_replacement():
    params = make_params()
    state = reset_mod.reset(params, jax.random.PRNGKey(1), jnp.float64)
    t0 = seq.tube_of(state.tubes, 0)
    # place agent 0 past tube 0's exit, with phase_reached 1 (traversed)
    vals = state.agent_states.at[0, :2].set(
        jnp.asarray([0.0, float(t0.exit[1]) - 1.0])
    )
    state = state.replace(
        agent_states=vals,
        phase_reached=state.phase_reached.at[0].set(1),
        prev_phase=state.prev_phase.at[0].set(1),
    )
    old_goal = np.asarray(state.landmark_pos[0]).copy()
    rew, state2, vals2 = seq.reward_one_agent(params, state, vals, 0)
    assert int(state2.current_tube[0]) == 1
    assert int(state2.phase_reached[0]) == 0
    assert int(state2.prev_phase[0]) == 0
    new_goal = np.asarray(state2.landmark_pos[0])
    assert not np.allclose(old_goal, new_goal)
    # goal moved to +0.5*ws right of tube 2's entrance
    t1 = seq.tube_of(state.tubes, 1)
    np.testing.assert_allclose(
        new_goal, np.asarray(t1.entrance) + [0.5 * params.world_size, 0.0]
    )


def test_split_assignment_by_agent_id():
    params = make_params("sequential_split")
    state = reset_mod.reset(params, jax.random.PRNGKey(2), jnp.float64)
    assert state.tubes.entrance.shape[0] == 3
    t0 = seq.tube_of(state.tubes, 0)
    vals = state.agent_states
    for i in range(3):
        vals = vals.at[i, :2].set(jnp.asarray([0.0, float(t0.exit[1]) - 1.0]))
    state = state.replace(
        agent_states=vals,
        phase_reached=jnp.ones(3, jnp.int32),
        prev_phase=jnp.ones(3, jnp.int32),
    )
    for i in range(3):
        _, state, vals = seq.reward_one_agent(params, state, vals, i)
    # agent 0 (id%3==0) -> tube 2 (left); agents 1,2 -> tube 1 (right)
    assert [int(x) for x in state.current_tube] == [2, 1, 1]


def test_goal_freeze_on_second_tube():
    params = make_params()
    state = reset_mod.reset(params, jax.random.PRNGKey(3), jnp.float64)
    t1 = seq.tube_of(state.tubes, 1)
    goal = np.asarray(t1.entrance) + [0.5 * params.world_size, 0.0]
    vals = state.agent_states.at[0, :2].set(jnp.asarray(goal + [0.05, 0.0]))
    state = state.replace(
        agent_states=vals,
        current_tube=state.current_tube.at[0].set(1),
        phase_reached=state.phase_reached.at[0].set(1),
        prev_phase=state.prev_phase.at[0].set(1),
        landmark_pos=state.landmark_pos.at[0].set(jnp.asarray(goal)),
    )
    rew, state2, vals2 = seq.reward_one_agent(params, state, vals, 0)
    assert bool(state2.status[0])
    assert int(state2.goal_tracker[0]) == 0
    assert float(rew) > 0  # +5g dominates


@pytest.mark.parametrize("scenario", ["sequential", "sequential_random", "sequential_split"])
def test_vec_env_step_jits(scenario):
    params = make_params(scenario)
    e = env_mod.CorridorEnv(params, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    state, ts = e.vec_reset(keys)
    assert ts.obs.shape == (4, 3, 19)
    assert ts.node_obs.shape == (4, 3, 6, 8)
    for _ in range(3):
        acts = jnp.zeros((4, 3), jnp.int32)
        state, ts = e.vec_step(state, acts)
    assert np.isfinite(np.asarray(ts.reward)).all()
    assert np.isfinite(np.asarray(ts.obs)).all()
