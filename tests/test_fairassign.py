"""Fairassign scenario behavior tests (reference is un-runnable upstream —
missing ``marl_fair_assign`` — so no golden parity; see envs/fairassign.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
from contracts_marl_aam_corridors_tpu.envs import env as env_mod, fairassign as fa
from contracts_marl_aam_corridors_tpu.envs import reset as reset_mod
from contracts_marl_aam_corridors_tpu.envs.types import EnvParams


def make_params(n=3, ws=4.0):
    return EnvParams(
        cfg=vehicle_config("unicycle_vehicle"),
        scenario="fairassign",
        num_agents=n,
        num_landmarks=n,
        episode_length=50,
        world_size=ws,
        collision_rew=30.0,
        goal_rew=30.0,
        formation_type="line",
    )


def test_optimal_assignment_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(0)
    for n in (2, 3, 5, 7):
        costs = rng.rand(n, n)
        got = np.asarray(fa.optimal_assignment(jnp.asarray(costs)))
        ri, ci = linear_sum_assignment(costs)
        # both are optimal; compare total cost (ties may differ in argmin)
        np.testing.assert_allclose(
            costs[np.arange(n), got].sum(), costs[ri, ci].sum(), rtol=1e-9
        )


def test_reset_cluster_and_line_goals():
    params = make_params()
    state = reset_mod.reset(params, jax.random.PRNGKey(0), jnp.float64)
    pos = np.asarray(state.agent_states[:, :2])
    center = np.asarray(state.tube.entrance) + [0, params.world_size * 0.2]
    assert np.all(np.linalg.norm(pos - center, axis=-1) < params.world_size * 0.3)
    lm = np.asarray(state.landmark_pos)
    # landmarks colinear
    v = lm[1] - lm[0]
    w = lm[2] - lm[0]
    assert abs(v[0] * w[1] - v[1] * w[0]) < 1e-9


def test_phase_inversion_quirk():
    """The reference's ``passed_tube = dot(pos-exit, e) < 0`` (ref:751-756)
    INVERTS the geometry: pre-entrance positions read phase 2, post-exit
    positions read phase 0.  Preserved as-is."""
    params = make_params()
    state = reset_mod.reset(params, jax.random.PRNGKey(1), jnp.float64)
    tube = state.tube
    above = np.asarray(tube.entrance) + 4 * (
        np.asarray(tube.entrance) - np.asarray(tube.exit)
    ) / np.linalg.norm(np.asarray(tube.entrance) - np.asarray(tube.exit))
    below = np.asarray(tube.exit) - 1.0 * (
        np.asarray(tube.entrance) - np.asarray(tube.exit)
    ) / np.linalg.norm(np.asarray(tube.entrance) - np.asarray(tube.exit))
    assert int(fa.phase_reward(tube, jnp.asarray(above))) == 2
    assert int(fa.phase_reward(tube, jnp.asarray(below))) == 0
    # the OBSERVATION phase uses the y test and is NOT inverted
    assert int(fa.phase_obs(tube, jnp.asarray(below))) == 2


def test_reward_reassigns_goals():
    params = make_params()
    state = reset_mod.reset(params, jax.random.PRNGKey(1), jnp.float64)
    vals = state.agent_states
    # put agent 0 at landmark 2
    vals = vals.at[0, :2].set(state.landmark_pos[2])
    state = state.replace(agent_states=vals)
    rew, state2, vals2 = fa.reward_one_agent(params, state, vals, 0)
    # agent 0 re-solved the assignment: it must now own the nearest landmark
    assert int(state2.goal_match[0]) == 2
    assert np.isfinite(float(rew))


def test_vec_env_steps_and_occupancy():
    params = make_params()
    e = env_mod.CorridorEnv(params, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    state, ts = e.vec_reset(keys)
    assert ts.obs.shape == (4, 3, 19)
    assert ts.node_obs.shape == (4, 3, 6, 13)
    for _ in range(4):
        state, ts = e.vec_step(state, jnp.zeros((4, 3), jnp.int32))
    assert np.isfinite(np.asarray(ts.reward)).all()
    assert np.isfinite(np.asarray(ts.obs)).all()
