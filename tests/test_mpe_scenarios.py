"""Golden parity for the remaining classic-MPE scenarios vs the reference's
vendored implementation (onpolicy/envs/mpe/), which is runnable and therefore
the oracle.  Pattern follows test_mpe_classic.py: build the ref env, copy its
post-reset world state into our struct-of-arrays state, then drive both with
identical action sequences and compare obs/rewards/dones every step.

simple_attack is the exception: its reward calls an undefined global
``bound`` upstream (simple_attack.py:119,144 — NameError), so the env cannot
step.  We drive ``world.step()`` + ``Scenario.observation`` directly for
physics/obs parity and cover the reconstructed rewards with behavior tests.
"""
import importlib
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ref_oracle
from contracts_marl_aam_corridors_tpu.envs import mpe_scenarios as ms


def _load(scenario, args):
    ref_oracle._install_shims()
    if ref_oracle.REF not in sys.path:
        sys.path.insert(0, ref_oracle.REF)
    scen_mod = importlib.import_module(f"onpolicy.envs.mpe.scenarios.{scenario}")
    env_mod = importlib.import_module("onpolicy.envs.mpe.environment")
    sc = scen_mod.Scenario()
    world = sc.make_world(args)
    env = env_mod.MultiAgentEnv(world, sc.reset_world, sc.reward, sc.observation)
    return sc, world, env


def _lm_index(world, lm):
    return [i for i, l in enumerate(world.landmarks) if l is lm][0]


def _agent_state(world):
    ap = np.stack([a.state.p_pos for a in world.agents])
    lp = np.stack([l.state.p_pos for l in world.landmarks])
    return ap, lp


def _compare(obs, ref_obs, t, atol=1e-9):
    for i, ref_row in enumerate(ref_obs):
        ref_row = np.asarray(ref_row, dtype=np.float64)
        np.testing.assert_allclose(
            np.asarray(obs)[i, : len(ref_row)], ref_row, atol=atol,
            err_msg=f"obs agent {i} step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(obs)[i, len(ref_row):], 0.0, atol=0,
            err_msg=f"padding agent {i} step {t}",
        )


def _run_parity(env, world, state, step_fn, actions_fn, T, shared=None):
    step_j = jax.jit(step_fn)
    rng = np.random.RandomState(3)
    for t in range(T - 1):
        my_act, ref_act = actions_fn(rng)
        robs, rrew, rdone, rinfo = env.step(ref_act)
        state, (obs, rew, done) = step_j(state, my_act)
        _compare(obs, robs, t)
        np.testing.assert_allclose(
            np.asarray(rew), np.array(rrew, dtype=np.float64).reshape(-1),
            atol=1e-9, err_msg=f"reward step {t}",
        )
        np.testing.assert_array_equal(np.asarray(done), np.array(rdone))
    return state


def _mk(cls, **kw):
    import argparse

    return argparse.Namespace(**kw)


def test_simple_adversary_parity():
    n, T = 3, 25
    np.random.seed(11)
    sc, world, env = _load("simple_adversary", _mk(None, num_agents=n, episode_length=T))
    ref_obs = env.reset()
    ap, lp = _agent_state(world)
    params = ms.AdversaryParams(num_agents=n, episode_length=T)
    state = ms.AdversaryState(
        agent_pos=jnp.asarray(ap), agent_vel=jnp.zeros((n, 2), jnp.float64),
        landmark_pos=jnp.asarray(lp),
        goal=jnp.asarray(_lm_index(world, world.agents[1].goal_a)),
        t=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(0),
    )
    _compare(ms.adversary_observations(params, state), ref_obs, -1)

    def actions(rng):
        a = rng.randint(0, 5, n)
        return jnp.asarray(a), [np.eye(5)[i] for i in a]

    _run_parity(env, world, state, lambda s, a: ms.adversary_step(params, s, a),
                actions, T)


def test_simple_push_parity():
    n, L, T = 2, 2, 25
    np.random.seed(12)
    sc, world, env = _load(
        "simple_push", _mk(None, num_agents=n, num_landmarks=L, episode_length=T)
    )
    ref_obs = env.reset()
    ap, lp = _agent_state(world)
    params = ms.PushParams(num_agents=n, num_landmarks=L, episode_length=T)
    state = ms.PushState(
        agent_pos=jnp.asarray(ap), agent_vel=jnp.zeros((n, 2), jnp.float64),
        landmark_pos=jnp.asarray(lp),
        goal=jnp.asarray(_lm_index(world, world.agents[0].goal_a)),
        t=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(0),
    )
    _compare(ms.push_observations(params, state), ref_obs, -1)

    def actions(rng):
        a = rng.randint(0, 5, n)
        return jnp.asarray(a), [np.eye(5)[i] for i in a]

    _run_parity(env, world, state, lambda s, a: ms.push_step(params, s, a), actions, T)


def test_simple_reference_parity():
    T = 25
    np.random.seed(13)
    sc, world, env = _load(
        "simple_reference", _mk(None, num_agents=2, num_landmarks=3, episode_length=T)
    )
    ref_obs = env.reset()
    ap, lp = _agent_state(world)
    params = ms.ReferenceParams(episode_length=T)
    state = ms.ReferenceState(
        agent_pos=jnp.asarray(ap), agent_vel=jnp.zeros((2, 2), jnp.float64),
        comm=jnp.zeros((2, 10), jnp.float64), landmark_pos=jnp.asarray(lp),
        goal_b=jnp.asarray([_lm_index(world, a.goal_b) for a in world.agents]),
        t=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(0),
    )
    _compare(ms.reference_observations(params, state), ref_obs, -1)

    def actions(rng):
        mv = rng.randint(0, 5, 2)
        cm = rng.randint(0, 10, 2)
        ref = [np.concatenate([np.eye(5)[mv[i]], np.eye(10)[cm[i]]]) for i in range(2)]
        return jnp.stack([jnp.asarray(mv), jnp.asarray(cm)], axis=1), ref

    _run_parity(env, world, state, lambda s, a: ms.reference_step(params, s, a),
                actions, T)


def test_simple_speaker_listener_parity():
    T = 25
    np.random.seed(14)
    sc, world, env = _load(
        "simple_speaker_listener",
        _mk(None, num_agents=2, num_landmarks=3, episode_length=T),
    )
    ref_obs = env.reset()
    ap, lp = _agent_state(world)
    params = ms.SpeakerListenerParams(episode_length=T)
    state = ms.SpeakerListenerState(
        agent_pos=jnp.asarray(ap), agent_vel=jnp.zeros((2, 2), jnp.float64),
        comm=jnp.zeros((3,), jnp.float64), landmark_pos=jnp.asarray(lp),
        goal=jnp.asarray(_lm_index(world, world.agents[0].goal_b)),
        t=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(0),
    )
    _compare(ms.speaker_listener_observations(params, state), ref_obs, -1)

    def actions(rng):
        cm = rng.randint(0, 3)
        mv = rng.randint(0, 5)
        my = jnp.asarray([[0, cm], [mv, 0]])
        return my, [np.eye(3)[cm], np.eye(5)[mv]]

    _run_parity(env, world, state,
                lambda s, a: ms.speaker_listener_step(params, s, a), actions, T)


def test_simple_crypto_parity():
    T = 25
    np.random.seed(15)
    sc, world, env = _load(
        "simple_crypto", _mk(None, num_agents=3, num_landmarks=2, episode_length=T)
    )
    ref_obs = env.reset()
    ap, lp = _agent_state(world)
    params = ms.CryptoParams(episode_length=T)
    state = ms.CryptoState(
        agent_pos=jnp.asarray(ap), comm=jnp.zeros((3, 4), jnp.float64),
        landmark_pos=jnp.asarray(lp),
        goal=jnp.asarray(_lm_index(world, world.agents[0].goal_a)),
        crypt_key=jnp.asarray(int(np.argmax(world.agents[2].key))),
        t=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(0),
    )
    _compare(ms.crypto_observations(params, state), ref_obs, -1)

    def actions(rng):
        cm = rng.randint(0, 4, 3)
        return jnp.asarray(cm), [np.eye(4)[c] for c in cm]

    _run_parity(env, world, state, lambda s, a: ms.crypto_step(params, s, a),
                actions, T)


def test_simple_world_comm_parity():
    T = 25
    np.random.seed(16)
    sc, world, env = _load(
        "simple_world_comm",
        _mk(None, num_good_agents=2, num_adversaries=4, num_landmarks=1,
            episode_length=T),
    )
    ref_obs = env.reset()
    n = 6
    ap = np.stack([a.state.p_pos for a in world.agents])
    params = ms.WorldCommParams(episode_length=T)
    state = ms.WorldCommState(
        agent_pos=jnp.asarray(ap), agent_vel=jnp.zeros((n, 2), jnp.float64),
        comm=jnp.zeros((4,), jnp.float64),
        landmark_pos=jnp.asarray(
            np.stack([l.state.p_pos for l in world.landmarks[:1]])),
        food_pos=jnp.asarray(np.stack([l.state.p_pos for l in world.food])),
        forest_pos=jnp.asarray(np.stack([l.state.p_pos for l in world.forests])),
        t=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(0),
    )
    _compare(ms.world_comm_observations(params, state), ref_obs, -1)

    def actions(rng):
        mv = rng.randint(0, 5, n)
        cm = rng.randint(0, 4)
        my = jnp.stack([jnp.asarray(mv),
                        jnp.full((n,), cm)], axis=1)
        ref = [np.concatenate([np.eye(5)[mv[0]], np.eye(4)[cm]])]
        ref += [np.eye(5)[mv[i]] for i in range(1, n)]
        return my, ref

    _run_parity(env, world, state, lambda s, a: ms.world_comm_step(params, s, a),
                actions, T)


def test_simple_attack_physics_obs_parity():
    """Rewards are un-runnable upstream (NameError on ``bound``), and the env
    can't even be constructed under gymnasium (dim_c=0 -> Discrete(0)
    asserts); physics and observations ARE runnable — drive world.step()
    directly with a manual _set_action decode (environment.py:235-250)."""
    T = 20
    np.random.seed(17)
    ref_oracle._install_shims()
    if ref_oracle.REF not in sys.path:
        sys.path.insert(0, ref_oracle.REF)
    scen_mod = importlib.import_module("onpolicy.envs.mpe.scenarios.simple_attack")
    sc = scen_mod.Scenario()
    world = sc.make_world(
        _mk(None, num_good_agents=1, num_adversaries=3, num_landmarks=4,
            episode_length=T)
    )
    sc.reset_world(world)
    n = 4
    ap, lp = _agent_state(world)
    params = ms.AttackParams(episode_length=T)
    state = ms.AttackState(
        agent_pos=jnp.asarray(ap), agent_vel=jnp.zeros((n, 2), jnp.float64),
        landmark_pos=jnp.asarray(lp),
        t=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(0),
    )
    _compare(ms.attack_observations(params, state),
             [sc.observation(a, world) for a in world.agents], -1)
    step_j = jax.jit(lambda s, a: ms.attack_step(params, s, a))
    rng = np.random.RandomState(18)
    for t in range(T - 1):
        acts = rng.randint(0, 5, n)
        for i, agent in enumerate(world.agents):
            oh = np.eye(5)[acts[i]]
            agent.action.u = np.array([oh[1] - oh[2], oh[3] - oh[4]]) * agent.accel
            agent.action.c = np.zeros(world.dim_c)
        world.step()
        state, (obs, rew, done) = step_j(state, jnp.asarray(acts))
        _compare(obs, [sc.observation(a, world) for a in world.agents], t)
        assert np.isfinite(np.asarray(rew)).all()


def test_attack_reward_behavior():
    """Reconstructed rewards: goal-seeking bonus, adversary-contact penalty
    for good agents, pair penalty for adversaries, arena bound."""
    params = ms.AttackParams(num_adversaries=1, num_good=1)
    # agent 0 (adversary) sits ON its goal; agent 1 (good) far from goal and
    # in contact with the adversary
    state = ms.AttackState(
        agent_pos=jnp.asarray([[0.0, 0.0], [0.05, 0.0]]),
        agent_vel=jnp.zeros((2, 2)),
        landmark_pos=jnp.asarray([[0.0, 0.0], [0.8, 0.8]]),
        t=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(0),
    )
    rew = np.asarray(ms.attack_rewards(params, state))
    d_good = np.sqrt(0.75**2 + 0.8**2)
    # adversary: -0 + 0.5 (inside goal) - 0.5 (one colliding pair)
    np.testing.assert_allclose(rew[0], 0.0, atol=1e-6)
    # good: -dist - 0.1 (near) - 0.5 (contact)
    np.testing.assert_allclose(rew[1], -d_good - 0.6, atol=1e-6)


@pytest.mark.parametrize("name", sorted(ms.SCENARIOS))
def test_vectorized_scenarios_run(name):
    """Every scenario jits, vmaps, and crosses the auto-reset boundary."""
    env = ms.make_scenario(name, dtype=jnp.float32)
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state = env.vec_reset(keys)
    n = env.params.num_agents
    acts = jnp.zeros((B, n, 2), jnp.int32)
    for _ in range(env.params.episode_length + 2):
        state, (obs, rew, done) = env.vec_step(state, acts)
    assert obs.shape == (B, n, env.params.obs_dim)
    assert np.isfinite(np.asarray(rew)).all()
    assert int(np.max(np.asarray(state.t))) <= env.params.episode_length
