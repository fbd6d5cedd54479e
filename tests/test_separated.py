"""Separated (per-agent) policy training — reference ``--share_policy False``
(separated_buffer.py + runner/separated/*).  The agent axis is vmapped, so N
independent policies train in one launch."""
import numpy as np
import jax
import jax.numpy as jnp

from contracts_marl_aam_corridors_tpu.learner.mappo import GRMAPPOTrainer
from contracts_marl_aam_corridors_tpu.learner.mpe_runner import make_env
from contracts_marl_aam_corridors_tpu.learner.separated import (
    SeparatedMPERunner,
    SeparatedTrainer,
)
from contracts_marl_aam_corridors_tpu.models.config import ModelConfig
from contracts_marl_aam_corridors_tpu.models.mlp_policy import (
    FlatPolicyDims,
    RMAPPOPolicy,
)


def _build(name, B=8, T=10, **env_kw):
    env, nvec = make_env(name, **env_kw)
    n = env.params.num_agents
    cfg = ModelConfig()
    dims = FlatPolicyDims(
        obs_dim=env.params.obs_dim,
        cent_obs_dim=env.params.obs_dim * n,
        action_nvec=nvec,
    )
    policy = RMAPPOPolicy(cfg, dims)
    base = GRMAPPOTrainer(policy, ppo_epoch=3, num_mini_batch=1, data_chunk_length=5)
    trainer = SeparatedTrainer(base=base, num_agents=n)
    runner = SeparatedMPERunner(
        env=env, policy=policy, trainer=trainer, n_rollout_threads=B,
        episode_length=T,
    )
    return runner, trainer, n


def test_separated_params_are_per_agent_and_diverge():
    """simple_tag (heterogeneous predator/prey): stacked params have a leading
    agent axis, and after training the roles' parameters differ."""
    runner, trainer, n = _build("simple_tag", B=8, T=10)
    key = jax.random.PRNGKey(0)
    key, k1, k2 = jax.random.split(key, 3)
    ts = trainer.init_state(k1)
    leaf = jax.tree.leaves(ts.params.actor)[0]
    assert leaf.shape[0] == n  # stacked agent axis

    carry = runner.init_carry(k2)
    step = jax.jit(runner.train_episode)
    for _ in range(3):
        key, ek = jax.random.split(key)
        ts, carry, info = step(ts, carry, ek)
    assert np.isfinite(float(info["policy_loss"]))
    # adversary (agent 0) vs prey (agent -1) parameters must have departed
    # from each other (different rewards -> different gradients)
    k0 = jax.tree.leaves(ts.params.actor)[0]
    assert not np.allclose(np.asarray(k0[0]), np.asarray(k0[-1]))


def test_separated_learns_simple_spread():
    """Separated training learns more slowly than shared (no parameter
    pooling across agents), so the budget here is longer: the critic must fit
    (value_loss down) and rewards must trend up over 60 episodes."""
    runner, trainer, n = _build("simple_spread", B=16, T=25)
    key = jax.random.PRNGKey(1)
    key, k1, k2 = jax.random.split(key, 3)
    ts = trainer.init_state(k1)
    carry = runner.init_carry(k2)
    step = jax.jit(runner.train_episode)
    rewards, vlosses = [], []
    for _ in range(60):
        key, ek = jax.random.split(key)
        ts, carry, info = step(ts, carry, ek)
        rewards.append(float(info["average_episode_rewards"]))
        vlosses.append(float(info["value_loss"]))
    assert np.isfinite(rewards).all()
    assert np.mean(rewards[-10:]) > np.mean(rewards[:10])
    assert np.mean(vlosses[-10:]) < np.mean(vlosses[:10])


def test_separated_multidiscrete_runs():
    """speaker_listener: THE separated-policy use case upstream (ragged
    per-agent spaces) — here the padded [move, comm] superset trains."""
    runner, trainer, n = _build("simple_speaker_listener", B=4, T=10)
    key = jax.random.PRNGKey(2)
    ts = trainer.init_state(jax.random.PRNGKey(3))
    carry = runner.init_carry(jax.random.PRNGKey(4))
    ts, carry, info = jax.jit(runner.train_episode)(ts, carry, key)
    for v in info.values():
        assert np.isfinite(float(v))


def test_separated_eval_episode():
    """eval_episode with per-agent stacked params (vmapped deterministic act)."""
    runner, trainer, n = _build("simple_tag", B=8, T=10)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    out = jax.jit(lambda t, k: runner.eval_episode(t, k, 4))(
        ts, jax.random.PRNGKey(3))
    assert np.isfinite(float(out["eval_average_episode_rewards"]))
