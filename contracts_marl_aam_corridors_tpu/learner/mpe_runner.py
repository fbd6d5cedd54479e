"""Training runner for the classic flat-obs MPE path (reference
``MPERunner``, onpolicy/runner/shared/mpe_runner.py + ``SharedReplayBuffer``,
onpolicy/utils/shared_buffer.py).

Mirrors ``learner.runner.Runner`` but drives a classic-MPE scenario env
(``envs.mpe_classic`` / ``envs.mpe_scenarios``) and the non-graph
``RMAPPOPolicy``.  The jitted ``GRMAPPOTrainer`` is reused verbatim: the
rollout buffer's graph fields are ZERO-SIZE arrays ((..., 0, 0) node/adj),
which XLA materializes as nothing — the flat path pays no graph cost.

Semantics vs the reference MPERunner:
- no stop-action masking (classic MPE has no per-agent early dones — done is
  episode-length only, environment.py:190-197), so available_actions is all
  ones;
- masks/active_masks flip to 0 at the episode boundary and back to 1 on the
  auto-reset, zeroing the GRU state between episodes exactly like the
  subprocess worker + insert bookkeeping (mpe_runner.py obs/rnn reset).
- share_obs = concat of all agents' obs per env (centralized V).

Action plumbing: the policy emits (B, N, K) integer actions where K =
len(action_nvec).  K==1 envs (move-only or comm-only scenarios) get the
squeezed (B, N) array; K==2 envs (MultiDiscrete [move, comm]) get (B, N, 2),
matching ``mpe_scenarios`` step signatures.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..models.mlp_policy import RMAPPOPolicy
from .buffer import RolloutBuffer, compute_returns
from .mappo import GRMAPPOTrainer, TrainState

Array = jax.Array


@struct.dataclass
class FlatCarry:
    env_state: object
    obs: Array  # (B, N, obs)
    rnn_actor: Array  # (B, N, rN, H)
    rnn_critic: Array
    masks: Array  # (B, N, 1)
    key: Array


@dataclasses.dataclass(frozen=True)
class MPERunner:
    env: object  # ScenarioEnv/ClassicMPEEnv-like: params, vec_reset, vec_step
    policy: RMAPPOPolicy
    trainer: GRMAPPOTrainer
    n_rollout_threads: int
    episode_length: int
    use_centralized_v: bool = True
    dtype: object = jnp.float32

    @property
    def num_agents(self) -> int:
        return self.env.params.num_agents

    def _share(self, obs: Array) -> Array:
        B, N = obs.shape[:2]
        if not self.use_centralized_v:
            return obs
        flat = obs.reshape(B, 1, -1)
        return jnp.broadcast_to(flat, (B, N, flat.shape[-1]))

    def init_carry(self, key: Array) -> FlatCarry:
        B, N = self.n_rollout_threads, self.num_agents
        rN, H = self.policy.cfg.recurrent_n, self.policy.cfg.hidden_size
        key, rkey, skey = jax.random.split(key, 3)
        keys = jax.random.split(rkey, B)
        state = self.env.vec_reset(keys)
        obs = self._initial_obs(state)
        zeros_h = jnp.zeros((B, N, rN, H), self.dtype)
        return FlatCarry(
            env_state=state,
            obs=obs,
            rnn_actor=zeros_h,
            rnn_critic=zeros_h,
            masks=jnp.ones((B, N, 1), self.dtype),
            key=key,
        )

    def _initial_obs(self, state) -> Array:
        obs_fn = getattr(self.env, "observations", None)
        if obs_fn is None:
            raise AttributeError(
                "env must expose .observations(state) (vmapped); see make_env"
            )
        return obs_fn(state)

    # ------------------------------------------------------------- rollout
    def _rollout_step(self, ts: TrainState, carry: FlatCarry, _):
        B, N = self.n_rollout_threads, self.num_agents
        K = self.policy.dims.action_dim
        A0 = self.policy.dims.num_actions
        flat = lambda x: x.reshape((B * N,) + x.shape[2:])
        unflat = lambda x: x.reshape((B, N) + x.shape[1:])

        share_obs = self._share(carry.obs)
        avail = jnp.ones((B, N, A0), self.dtype)
        key, akey = jax.random.split(carry.key)
        values, actions, logp, h_a, h_c = self.policy.get_actions(
            ts.params,
            akey,
            flat(share_obs),
            flat(carry.obs),
            rnn_states_actor=flat(carry.rnn_actor),
            rnn_states_critic=flat(carry.rnn_critic),
            masks=flat(carry.masks),
            available_actions=flat(avail),
        )
        actions_bn = unflat(actions)  # (B, N, K)
        env_actions = actions_bn[..., 0] if K == 1 else actions_bn
        env_state, (next_obs, rew, done) = self.env.vec_step(
            carry.env_state, env_actions
        )

        done_f = done[..., None].astype(self.dtype)
        masks = 1.0 - done_f
        h_a = unflat(h_a) * (1.0 - done_f[..., None])
        h_c = unflat(h_c) * (1.0 - done_f[..., None])

        out = dict(
            share_obs=share_obs,
            obs=carry.obs,
            rnn_states=carry.rnn_actor,
            rnn_states_critic=carry.rnn_critic,
            actions=actions_bn.astype(self.dtype),
            action_log_probs=unflat(logp),
            value_preds=unflat(values),
            rewards=rew[..., None].astype(self.dtype),
            masks=carry.masks,
            available_actions=avail,
        )
        new_carry = FlatCarry(
            env_state=env_state,
            obs=next_obs,
            rnn_actor=h_a,
            rnn_critic=h_c,
            masks=masks,
            key=key,
        )
        return new_carry, out

    def collect(self, ts: TrainState, carry: FlatCarry):
        T, B, N = self.episode_length, self.n_rollout_threads, self.num_agents

        carry2, outs = jax.lax.scan(
            lambda c, x: self._rollout_step(ts, c, x), carry, None, length=T
        )

        close = lambda seq, last: jnp.concatenate([seq, last[None]], axis=0)
        share_last = self._share(carry2.obs)
        zero_nodes = jnp.zeros((T + 1, B, N, 0, 0), self.dtype)
        zero_adj = jnp.zeros((T + 1, B, 0, 0), self.dtype)
        agent_id = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None, None, :, None], (T + 1, B, N, 1)
        )
        buffer = RolloutBuffer(
            share_obs=close(outs["share_obs"], share_last),
            obs=close(outs["obs"], carry2.obs),
            node_obs=zero_nodes,
            adj=zero_adj,
            agent_id=agent_id,
            rnn_states=close(outs["rnn_states"], carry2.rnn_actor),
            rnn_states_critic=close(outs["rnn_states_critic"], carry2.rnn_critic),
            actions=outs["actions"],
            action_log_probs=outs["action_log_probs"],
            value_preds=close(outs["value_preds"], jnp.zeros((B, N, 1), self.dtype)),
            returns=jnp.zeros((T + 1, B, N, 1), self.dtype),
            rewards=outs["rewards"],
            masks=close(outs["masks"], carry2.masks),
            active_masks=close(outs["masks"], carry2.masks),
            available_actions=close(
                outs["available_actions"],
                jnp.ones((B, N, self.policy.dims.num_actions), self.dtype),
            ),
        )

        flat = lambda x: x.reshape((B * N,) + x.shape[2:])
        next_values = self.policy.get_values(
            ts.params,
            flat(share_last),
            rnn_states_critic=flat(carry2.rnn_critic),
            masks=flat(carry2.masks),
        ).reshape(B, N, 1)
        buffer = compute_returns(
            buffer, next_values, ts.vn, self.trainer.gamma, self.trainer.gae_lambda,
            use_gae=self.trainer.use_gae,
            use_proper_time_limits=self.trainer.use_proper_time_limits,
        )
        return carry2, buffer

    # ------------------------------------------------------------- eval
    def _eval_act(self, ts: TrainState, obs: Array, h: Array, masks: Array):
        """Deterministic act for eval; (B, N, ...) in and out.  Overridden by
        the separated runner (per-agent stacked params)."""
        B, N = obs.shape[:2]
        flat = lambda x: x.reshape((B * N,) + x.shape[2:])
        unflat = lambda x: x.reshape((B, N) + x.shape[1:])
        actions, h2 = self.policy.act(
            ts.params, jax.random.PRNGKey(0), flat(obs),
            rnn_states_actor=flat(h), masks=flat(masks),
            available_actions=None, deterministic=True,
        )
        return unflat(actions), unflat(h2)

    def eval_episode(self, ts: TrainState, key: Array, n_eval: int):
        """Deterministic in-training evaluation (reference ``MPERunner.eval``,
        onpolicy/runner/shared/mpe_runner.py:172-233): fresh eval envs,
        ``policy.act`` with deterministic=True over one episode window,
        reporting eval_average_episode_rewards (sum over steps, mean over
        envs and agents — the reference's only eval metric for classic MPE,
        which has no success notion)."""
        B, N = n_eval, self.num_agents
        rN, H = self.policy.cfg.recurrent_n, self.policy.cfg.hidden_size
        A0 = self.policy.dims.action_dim

        key, rkey = jax.random.split(key)
        state = self.env.vec_reset(jax.random.split(rkey, B))
        obs = self._initial_obs(state)

        def step_fn(c, _):
            actions_bn, h = self._eval_act(ts, c["obs"], c["h"], c["masks"])
            env_actions = actions_bn[..., 0] if A0 == 1 else actions_bn
            env_state, (next_obs, rew, done) = self.env.vec_step(
                c["env_state"], env_actions
            )
            done_f = done[..., None].astype(self.dtype)
            new = dict(
                env_state=env_state, obs=next_obs,
                h=h * (1.0 - done_f[..., None]),
                masks=1.0 - done_f,
                ep_rew=c["ep_rew"] + rew,
            )
            return new, None

        carry0 = dict(
            env_state=state, obs=obs,
            h=jnp.zeros((B, N, rN, H), self.dtype),
            masks=jnp.ones((B, N, 1), self.dtype),
            ep_rew=jnp.zeros((B, N), self.dtype),
        )
        carry2, _ = jax.lax.scan(step_fn, carry0, None, length=self.episode_length)
        return {"eval_average_episode_rewards": jnp.mean(carry2["ep_rew"])}

    # ------------------------------------------------------------- episode
    def train_episode(self, ts: TrainState, carry: FlatCarry, key: Array):
        carry, buffer = self.collect(ts, carry)
        ts, train_info = self.trainer.train(ts, buffer, key)
        train_info = dict(train_info)
        train_info["average_episode_rewards"] = (
            jnp.mean(buffer.rewards) * self.episode_length
        )
        return ts, carry, train_info


def make_env(name: str, dtype=jnp.float32, **overrides):
    """Build a vectorized classic-MPE env exposing params / vec_reset /
    vec_step / observations, for any scenario (spread, tag, or the
    mpe_scenarios registry), plus its action_nvec."""
    from ..envs import mpe_classic as mc
    from ..envs import mpe_scenarios as ms

    if name == "simple_spread":
        params = mc.MPEParams(**overrides)
        env = mc.ClassicMPEEnv(params, dtype)
        env.observations = jax.jit(jax.vmap(partial(mc.observations, params)))
        nvec = (5,)
        return env, nvec
    if name == "simple_tag":
        params = mc.TagParams(**overrides)
        env = _SimpleNS(
            params=params,
            vec_reset=jax.jit(jax.vmap(partial(mc.tag_reset, params, dtype=dtype))),
            vec_step=jax.jit(jax.vmap(partial(mc.tag_step, params))),
            observations=jax.jit(jax.vmap(partial(mc.tag_observations, params))),
        )
        return env, (5,)
    params_cls, reset_fn, step_fn = ms.SCENARIOS[name]
    params = params_cls(**overrides)
    env = ms.ScenarioEnv(params, reset_fn, step_fn, dtype=dtype)
    mod_obs = {
        "simple_adversary": ms.adversary_observations,
        "simple_push": ms.push_observations,
        "simple_reference": ms.reference_observations,
        "simple_speaker_listener": ms.speaker_listener_observations,
        "simple_crypto": ms.crypto_observations,
        "simple_attack": ms.attack_observations,
        "simple_world_comm": ms.world_comm_observations,
    }[name]
    env.observations = jax.jit(jax.vmap(partial(mod_obs, params)))
    return env, tuple(params.action_nvec)


@dataclasses.dataclass
class _SimpleNS:
    params: object
    vec_reset: object
    vec_step: object
    observations: object
