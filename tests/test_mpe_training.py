"""End-to-end training on the classic flat-obs MPE path (reference
``MPERunner`` + ``R_MAPPO``): the non-graph policy, the shared rollout
buffer (zero-size graph fields), and the jitted trainer driving the
vectorized scenario envs — including a MultiDiscrete (move+comm) scenario.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contracts_marl_aam_corridors_tpu.learner.mappo import GRMAPPOTrainer
from contracts_marl_aam_corridors_tpu.learner.mpe_runner import MPERunner, make_env
from contracts_marl_aam_corridors_tpu.models.config import ModelConfig
from contracts_marl_aam_corridors_tpu.models.mlp_policy import (
    FlatPolicyDims,
    RMAPPOPolicy,
)


def _build(name, B=8, T=25, recurrent=True, **env_kw):
    env, nvec = make_env(name, **env_kw)
    n = env.params.num_agents
    cfg = ModelConfig(use_recurrent_policy=recurrent)
    dims = FlatPolicyDims(
        obs_dim=env.params.obs_dim,
        cent_obs_dim=env.params.obs_dim * n,
        action_nvec=nvec,
    )
    policy = RMAPPOPolicy(cfg, dims)
    trainer = GRMAPPOTrainer(
        policy, ppo_epoch=5, num_mini_batch=1, data_chunk_length=5 if recurrent else 1
    )
    runner = MPERunner(
        env=env, policy=policy, trainer=trainer, n_rollout_threads=B,
        episode_length=T,
    )
    return runner, trainer


def test_simple_spread_learns():
    """A short run on simple_spread must improve mean episode reward."""
    runner, trainer = _build("simple_spread", B=16, T=25)
    key = jax.random.PRNGKey(0)
    key, k1, k2 = jax.random.split(key, 3)
    ts = trainer.init_state(k1)
    carry = runner.init_carry(k2)
    step = jax.jit(runner.train_episode)

    rewards = []
    for ep in range(30):
        key, ek = jax.random.split(key)
        ts, carry, info = step(ts, carry, ek)
        rewards.append(float(info["average_episode_rewards"]))
    first, last = np.mean(rewards[:5]), np.mean(rewards[-5:])
    assert np.isfinite(rewards).all()
    assert last > first, (first, last)


@pytest.mark.parametrize("name", ["simple_reference", "simple_world_comm"])
def test_multidiscrete_training_runs(name):
    """MultiDiscrete [move, comm] scenarios train: per-head log-probs are
    concatenated (B, N, K) and the surrogate sums the head axis."""
    runner, trainer = _build(name, B=4, T=10)
    key = jax.random.PRNGKey(1)
    key, k1, k2 = jax.random.split(key, 3)
    ts = trainer.init_state(k1)
    carry = runner.init_carry(k2)
    carry, buffer = runner.collect(ts, carry)
    K = len(runner.policy.nvec)
    assert buffer.actions.shape[-1] == K
    assert buffer.action_log_probs.shape[-1] == K
    step = jax.jit(runner.train_episode)
    for _ in range(2):
        key, ek = jax.random.split(key)
        ts, carry, info = step(ts, carry, ek)
    for v in info.values():
        assert np.isfinite(float(v))


def test_crypto_comm_only_training_runs():
    """Comm-only scenario (nobody moves): single Discrete(4) head."""
    runner, trainer = _build("simple_crypto", B=4, T=10)
    key = jax.random.PRNGKey(2)
    key, k1, k2 = jax.random.split(key, 3)
    ts = trainer.init_state(k1)
    carry = runner.init_carry(k2)
    step = jax.jit(runner.train_episode)
    ts, carry, info = step(ts, carry, jax.random.PRNGKey(3))
    assert np.isfinite(float(info["policy_loss"]))


def test_non_recurrent_flat_path():
    """mappo (non-recurrent) flat policy: chunk length 1, no GRU."""
    runner, trainer = _build("simple_adversary", B=4, T=10, recurrent=False)
    key = jax.random.PRNGKey(4)
    ts = trainer.init_state(key)
    carry = runner.init_carry(jax.random.PRNGKey(5))
    step = jax.jit(runner.train_episode)
    ts, carry, info = step(ts, carry, jax.random.PRNGKey(6))
    assert np.isfinite(float(info["value_loss"]))


def test_mpe_eval_episode():
    """In-training eval on the flat path (reference MPERunner.eval,
    mpe_runner.py:172-233): deterministic, jittable, reproducible."""
    runner, trainer = _build("simple_spread", B=8, T=25)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    ev = jax.jit(lambda t, k: runner.eval_episode(t, k, 6))
    out = ev(ts, jax.random.PRNGKey(3))
    r1 = float(out["eval_average_episode_rewards"])
    assert np.isfinite(r1)
    # same key => identical (deterministic act + deterministic env reset)
    r2 = float(ev(ts, jax.random.PRNGKey(3))["eval_average_episode_rewards"])
    assert r1 == r2
