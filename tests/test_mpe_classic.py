"""Classic force-based MPE parity vs the reference's vendored implementation
(onpolicy/envs/mpe/) — which IS runnable, so this is golden parity."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ref_oracle
from contracts_marl_aam_corridors_tpu.envs import mpe_classic as mc


def _make_ref_env(args):
    # NOTE: the vendored MPE_env.py factory is broken upstream (imports the
    # nonexistent multiagent.environment.MultiAgentPPOEnv), so build the env
    # from its parts directly.
    ref_oracle._install_shims()
    if ref_oracle.REF not in sys.path:
        sys.path.insert(0, ref_oracle.REF)
    import importlib

    scen_mod = importlib.import_module("onpolicy.envs.mpe.scenarios.simple_spread")
    env_mod = importlib.import_module("onpolicy.envs.mpe.environment")
    sc = scen_mod.Scenario()
    world = sc.make_world(args)
    return env_mod.MultiAgentEnv(
        world, sc.reset_world, sc.reward, sc.observation
    )


def _ref_args(n, ep_len):
    import argparse

    return argparse.Namespace(
        scenario_name="simple_spread",
        num_agents=n,
        num_landmarks=n,
        episode_length=ep_len,
    )


@pytest.mark.parametrize("seed", [0, 4])
def test_simple_spread_parity(seed):
    n, T = 3, 25
    args = _ref_args(n, T)
    np.random.seed(seed)
    env = _make_ref_env(args)
    ref_obs = env.reset()

    # mirror the RNG stream: MPEEnv construction calls make_world ->
    # reset_world (agents then landmarks), and env.reset() calls reset_world
    # again; replicate both draws
    np.random.seed(seed)
    params = mc.MPEParams(num_agents=n, num_landmarks=n, episode_length=T)

    def np_reset():
        ap = np.stack([np.random.uniform(-1, 1, 2) for _ in range(n)])
        lp = np.stack([0.8 * np.random.uniform(-1, 1, 2) for _ in range(n)])
        return ap, lp

    np_reset()  # construction-time reset_world
    ap, lp = np_reset()  # env.reset()
    state = mc.MPEState(
        agent_pos=jnp.asarray(ap),
        agent_vel=jnp.zeros((n, 2)),
        landmark_pos=jnp.asarray(lp),
        t=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(mc.observations(params, state)), np.stack(ref_obs), atol=1e-12
    )

    step_j = jax.jit(lambda s, a: mc.step(params, s, a))
    rng = np.random.RandomState(seed + 1)
    for t in range(T - 1):
        acts = rng.randint(0, 5, n)
        one_hot = [np.eye(5)[a] for a in acts]
        ref_out = env.step(one_hot)
        robs, rrew, rdone, rinfo = ref_out
        state, (obs, rew, done) = step_j(state, jnp.asarray(acts))
        np.testing.assert_allclose(
            np.asarray(obs), np.stack(robs), atol=1e-10, err_msg=f"obs step {t}"
        )
        np.testing.assert_allclose(
            np.asarray(rew), np.array(rrew).reshape(-1), atol=1e-10,
            err_msg=f"reward step {t}",
        )
        np.testing.assert_array_equal(np.asarray(done), np.array(rdone))


def test_vec_env_runs():
    params = mc.MPEParams()
    e = mc.ClassicMPEEnv(params)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    state = e.vec_reset(keys)
    for _ in range(30):  # crosses the auto-reset boundary
        acts = jnp.zeros((8, 3), jnp.int32)
        state, (obs, rew, done) = e.vec_step(state, acts)
    assert obs.shape == (8, 3, params.obs_dim)
    assert np.isfinite(np.asarray(rew)).all()
    assert int(state.t[0]) <= params.episode_length


def test_simple_tag_parity():
    """Golden parity for the heterogeneous predator-prey scenario."""
    import argparse

    n_adv, n_good, n_lm, T = 3, 1, 2, 25
    args = argparse.Namespace(
        scenario_name="simple_tag", num_adversaries=n_adv,
        num_good_agents=n_good, num_landmarks=n_lm, episode_length=T,
    )
    ref_oracle._install_shims()
    if ref_oracle.REF not in sys.path:
        sys.path.insert(0, ref_oracle.REF)
    import importlib

    scen_mod = importlib.import_module("onpolicy.envs.mpe.scenarios.simple_tag")
    env_mod_ref = importlib.import_module("onpolicy.envs.mpe.environment")
    np.random.seed(7)
    sc = scen_mod.Scenario()
    world = sc.make_world(args)
    env = env_mod_ref.MultiAgentEnv(world, sc.reset_world, sc.reward, sc.observation)
    ref_obs = env.reset()

    np.random.seed(7)
    n = n_adv + n_good
    def np_reset():
        ap = np.stack([np.random.uniform(-1, 1, 2) for _ in range(n)])
        lp = np.stack([0.8 * np.random.uniform(-1, 1, 2) for _ in range(n_lm)])
        return ap, lp
    np_reset()
    ap, lp = np_reset()
    params = mc.TagParams(num_adversaries=n_adv, num_good=n_good,
                          num_landmarks=n_lm, episode_length=T)
    state = mc.MPEState(
        agent_pos=jnp.asarray(ap), agent_vel=jnp.zeros((n, 2)),
        landmark_pos=jnp.asarray(lp), t=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    obs0 = np.asarray(mc.tag_observations(params, state))
    for i in range(n):
        ref_row = np.asarray(ref_obs[i])
        np.testing.assert_allclose(obs0[i, : len(ref_row)], ref_row, atol=1e-12)

    step_j = jax.jit(lambda s, a: mc.tag_step(params, s, a))
    rng = np.random.RandomState(8)
    for t in range(T - 1):
        acts = rng.randint(0, 5, n)
        robs, rrew, rdone, rinfo = env.step([np.eye(5)[a] for a in acts])
        state, (obs, rew, done) = step_j(state, jnp.asarray(acts))
        for i in range(n):
            ref_row = np.asarray(robs[i])
            np.testing.assert_allclose(
                np.asarray(obs)[i, : len(ref_row)], ref_row, atol=1e-9,
                err_msg=f"obs agent {i} step {t}",
            )
        np.testing.assert_allclose(
            np.asarray(rew), np.array(rrew, dtype=np.float64).reshape(-1),
            atol=1e-9, err_msg=f"reward step {t}",
        )
