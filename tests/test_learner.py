"""Learner tests: ValueNorm vs the reference torch implementation, GAE vs a
numpy replica of the reference recursion, and an end-to-end tiny train step.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
from contracts_marl_aam_corridors_tpu.envs.types import EnvParams
from contracts_marl_aam_corridors_tpu.learner import (
    GRMAPPOTrainer,
    RolloutBuffer,
    compute_returns,
    vn_denormalize,
    vn_init,
    vn_normalize,
    vn_update,
)
from contracts_marl_aam_corridors_tpu.learner.mappo import huber
from contracts_marl_aam_corridors_tpu.learner.runner import Runner
from contracts_marl_aam_corridors_tpu.models import (
    GRMAPPOPolicy,
    ModelConfig,
    PolicyDims,
)


def test_valuenorm_matches_reference_torch():
    sys.path.insert(0, "/root/reference")
    from onpolicy.utils.valuenorm import ValueNorm

    ref = ValueNorm(1)
    st = vn_init()
    rng = np.random.RandomState(0)
    for i in range(5):
        batch = rng.randn(64, 1).astype(np.float32) * (i + 1) + i
        ref.update(batch)
        st = vn_update(st, jnp.asarray(batch))
    x = rng.randn(16, 1).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(vn_normalize(st, jnp.asarray(x))),
        ref.normalize(x).numpy(),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(vn_denormalize(st, jnp.asarray(x))),
        ref.denormalize(x),
        rtol=1e-5,
    )


def test_gae_matches_reference_recursion():
    """Replicates graph_buffer.compute_returns (gae + valuenorm branch,
    graph_buffer.py:340-352) in numpy and compares."""
    T, B, N = 7, 3, 2
    rng = np.random.RandomState(1)
    rewards = rng.randn(T, B, N, 1).astype(np.float32)
    value_preds = rng.randn(T + 1, B, N, 1).astype(np.float32)
    masks = (rng.rand(T + 1, B, N, 1) > 0.3).astype(np.float32)
    next_value = rng.randn(B, N, 1).astype(np.float32)
    gamma, lam = 0.99, 0.95

    st = vn_update(vn_init(), jnp.asarray(rng.randn(100, 1) * 3 + 2))
    denorm = lambda v: np.asarray(vn_denormalize(st, jnp.asarray(v)))

    vp = value_preds.copy()
    vp[-1] = next_value
    returns = np.zeros((T + 1, B, N, 1), np.float32)
    gae = 0
    for step in reversed(range(T)):
        delta = rewards[step] + gamma * denorm(vp[step + 1]) * masks[step + 1] - denorm(vp[step])
        gae = delta + gamma * lam * masks[step + 1] * gae
        returns[step] = gae + denorm(vp[step])

    dummy = jnp.zeros((T, B, N, 1), jnp.float32)
    buf = RolloutBuffer(
        share_obs=dummy, obs=dummy, node_obs=dummy, adj=dummy,
        agent_id=dummy, rnn_states=dummy, rnn_states_critic=dummy,
        actions=dummy, action_log_probs=dummy,
        value_preds=jnp.asarray(value_preds), returns=jnp.zeros((T + 1, B, N, 1)),
        rewards=jnp.asarray(rewards), masks=jnp.asarray(masks),
        active_masks=jnp.asarray(masks), available_actions=dummy,
    )
    out = compute_returns(buf, jnp.asarray(next_value), st, gamma, lam)
    np.testing.assert_allclose(np.asarray(out.returns[:-1]), returns[:-1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.value_preds[-1]), next_value, rtol=1e-6)


def test_huber_matches_reference():
    sys.path.insert(0, "/root/reference")
    import torch
    from onpolicy.utils.util import huber_loss

    e = np.linspace(-30, 30, 101).astype(np.float32)
    want = huber_loss(torch.from_numpy(e), 10.0).numpy()
    got = np.asarray(huber(jnp.asarray(e), 10.0))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.fixture(scope="module")
def tiny_setup():
    env_params = EnvParams(
        cfg=vehicle_config("air_taxi"), num_agents=3, num_landmarks=3, episode_length=10
    )
    cfg = ModelConfig(max_edge_dist=env_params.cfg.coordination_range)
    dims = PolicyDims(
        obs_dim=env_params.obs_dim,
        cent_obs_dim=env_params.obs_dim * env_params.num_agents,
        num_entities=env_params.num_entities,
        node_feat_dim=env_params.node_feat_dim,
        num_actions=env_params.num_actions,
    )
    policy = GRMAPPOPolicy(cfg, dims)
    trainer = GRMAPPOTrainer(policy, ppo_epoch=2, num_mini_batch=1, data_chunk_length=10)
    runner = Runner(
        env_params=env_params,
        policy=policy,
        trainer=trainer,
        n_rollout_threads=4,
        episode_length=10,
    )
    return env_params, policy, trainer, runner


def test_end_to_end_train_episode(tiny_setup):
    env_params, policy, trainer, runner = tiny_setup
    key = jax.random.PRNGKey(0)
    ts = trainer.init_state(key)
    carry = runner.init_carry(jax.random.PRNGKey(1))

    step = jax.jit(runner.train_episode)
    ts2, carry2, train_info, env_info = step(ts, carry, jax.random.PRNGKey(2))

    for k in ["value_loss", "policy_loss", "dist_entropy", "ratio",
              "actor_grad_norm", "critic_grad_norm", "average_episode_rewards"]:
        v = float(train_info[k])
        assert np.isfinite(v), f"{k} not finite"
    # first-epoch first-minibatch ratio should be ~1 on-policy; averaged over
    # 2 epochs it stays near 1 for a tiny lr
    assert 0.3 < float(train_info["ratio"]) < 3.0

    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts.params.actor, ts2.params.actor
    )
    assert max(jax.tree.leaves(moved)) > 0

    # a second episode runs off the carried state without recompiling issues
    ts3, carry3, ti3, _ = step(ts2, carry2, jax.random.PRNGKey(3))
    assert np.isfinite(float(ti3["value_loss"]))


def test_stop_action_masking(tiny_setup):
    env_params, policy, trainer, runner = tiny_setup
    prev_done = jnp.asarray([[False, True, False], [True, True, False]])
    avail = runner._stop_avail(prev_done)
    A = policy.dims.num_actions
    assert avail.shape == (2, 3, A)
    np.testing.assert_array_equal(np.asarray(avail[0, 0]), np.ones(A))
    done_row = np.asarray(avail[0, 1])
    assert done_row[A // 2] == 1 and done_row.sum() == 1


def test_popart_output_preservation():
    """PopArt rescaling keeps denormalized critic outputs (approximately)
    invariant across a stats update (popart.py:52-65)."""
    from contracts_marl_aam_corridors_tpu.learner.popart import (
        popart_denormalize, popart_init, popart_update, rescale_v_out,
    )

    rng = np.random.RandomState(0)
    st = popart_init()
    # warm the stats so debiasing is meaningful
    for i in range(3):
        st, scale, shift = popart_update(st, jnp.asarray(rng.randn(64, 1) * 5 + 3))

    w = jnp.asarray(rng.randn(8, 1) * 0.3)
    b = jnp.asarray(rng.randn(1) * 0.1)
    x = jnp.asarray(rng.randn(16, 8))
    before = popart_denormalize(st, x @ w + b)

    st2, scale, shift = popart_update(st, jnp.asarray(rng.randn(64, 1) * 5 + 3))
    new = rescale_v_out({"kernel": w, "bias": b}, scale, shift)
    after = popart_denormalize(st2, x @ new["kernel"] + new["bias"])
    # invariance is exact w.r.t. the NON-debiased stats the rescale uses;
    # the debiased normalize introduces only a small drift
    np.testing.assert_allclose(np.asarray(after), np.asarray(before), rtol=0.15, atol=0.3)


def test_popart_training_runs(tiny_setup):
    from contracts_marl_aam_corridors_tpu.learner.mappo import GRMAPPOTrainer
    from contracts_marl_aam_corridors_tpu.learner.runner import Runner

    env_params, policy, _, _ = tiny_setup
    trainer = GRMAPPOTrainer(
        policy, ppo_epoch=2, num_mini_batch=1, data_chunk_length=10,
        use_valuenorm=False, use_popart=True,
    )
    runner = Runner(env_params=env_params, policy=policy, trainer=trainer,
                    n_rollout_threads=4, episode_length=10)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    carry = runner.init_carry(jax.random.PRNGKey(1))
    ts2, c2, info, _ = jax.jit(runner.train_episode)(ts, carry, jax.random.PRNGKey(2))
    assert np.isfinite(float(info["value_loss"]))
    # v_out changed via both rescale and gradient
    dv = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                      ts.params.critic["v_out"], ts2.params.critic["v_out"])
    assert max(jax.tree.leaves(dv)) > 0


def test_nonrecurrent_mappo_runs():
    """algorithm 'mappo': no GRU, flat (chunk=1) minibatching."""
    env_params = EnvParams(
        cfg=vehicle_config("air_taxi"), num_agents=3, num_landmarks=3, episode_length=10
    )
    cfg = ModelConfig(
        max_edge_dist=env_params.cfg.coordination_range, use_recurrent_policy=False
    )
    dims = PolicyDims(
        obs_dim=env_params.obs_dim, cent_obs_dim=env_params.obs_dim * 3,
        num_entities=env_params.num_entities, node_feat_dim=env_params.node_feat_dim,
        num_actions=env_params.num_actions,
    )
    policy = GRMAPPOPolicy(cfg, dims)
    trainer = GRMAPPOTrainer(policy, ppo_epoch=2, num_mini_batch=2, data_chunk_length=1)
    runner = Runner(env_params=env_params, policy=policy, trainer=trainer,
                    n_rollout_threads=4, episode_length=10)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    carry = runner.init_carry(jax.random.PRNGKey(1))
    ts2, c2, info, _ = jax.jit(runner.train_episode)(ts, carry, jax.random.PRNGKey(2))
    assert np.isfinite(float(info["value_loss"]))
    assert np.isfinite(float(info["policy_loss"]))
