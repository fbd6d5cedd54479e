"""Separated (per-agent) policy training — reference ``--share_policy
False``: ``SeparatedReplayBuffer`` (onpolicy/utils/separated_buffer.py),
``runner/separated/base_runner.py`` (one policy+trainer+buffer per agent) and
``separated/mpe_runner.py``.

TPU-native design: where the reference keeps a Python LIST of N policies and
loops ``for agent_id in range(num_agents)`` every collect/train, here the N
parameter sets are STACKED on a leading agent axis and every forward pass and
optimizer update is ``vmap``ped over it — N independent policies advance in
one fused launch, so separated training costs roughly the same wall-clock as
shared training (the reference's cost is N x).

Mechanics:
- ``init``: ``vmap(init_params)`` over N seeds -> stacked params/opt/vn.
- rollout: agent-major transpose (B, N, ...) -> (N, B, ...), vmapped actor/
  critic apply, transpose back.
- train: ``SeparatedTrainer.train`` vmaps the SHARED jitted trainer over the
  agent axis of (TrainState, RolloutBuffer); inside the vmap each agent sees
  a standard (T+1, B, 1, ...) buffer, so all the GRMAPPOTrainer semantics
  (chunking, ValueNorm, huber quirks) are inherited verbatim.

The reference's separated path never touches graph observations (it predates
the graph env), so this wrapper targets the flat MPE policy; heterogeneous
scenarios (simple_tag, simple_adversary, simple_speaker_listener, ...) are
its natural use — each agent role learns its own network over the padded
common observation width.
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
from .mpe_runner import FlatCarry, MPERunner

Array = jax.Array

# vmap axis spec: every buffer field carries the agent axis at position 2,
# except adj which is stored once per env
_BUFFER_AXES = RolloutBuffer(
    share_obs=2, obs=2, node_obs=2, adj=None, agent_id=2, rnn_states=2,
    rnn_states_critic=2, actions=2, action_log_probs=2, value_preds=2,
    returns=2, rewards=2, masks=2, active_masks=2, available_actions=2,
)


def _map_fields(buf: RolloutBuffer, fn, skip=("adj",)) -> RolloutBuffer:
    return buf.replace(**{
        f.name: fn(getattr(buf, f.name))
        for f in dataclasses.fields(buf)
        if f.name not in skip and getattr(buf, f.name) is not None
    })


def _expand_agent(buf: RolloutBuffer) -> RolloutBuffer:
    """Re-insert the singleton agent axis that a vmap over axis 2 stripped."""
    return _map_fields(buf, lambda x: jnp.expand_dims(x, 2))


@dataclasses.dataclass(frozen=True)
class SeparatedTrainer:
    """Vmaps a shared GRMAPPOTrainer across the stacked agent axis."""

    base: GRMAPPOTrainer
    num_agents: int

    @property
    def policy(self):
        return self.base.policy

    @property
    def gamma(self):
        return self.base.gamma

    @property
    def gae_lambda(self):
        return self.base.gae_lambda

    def init_state(self, key: Array, dtype=jnp.float32) -> TrainState:
        keys = jax.random.split(key, self.num_agents)
        return jax.vmap(lambda k: self.base.init_state(k, dtype))(keys)

    def train(self, ts: TrainState, buffer: RolloutBuffer, key: Array):
        def train1(ts1, buf1, k):
            return self.base.train(ts1, _expand_agent(buf1), k)

        keys = jax.random.split(key, self.num_agents)
        return jax.vmap(train1, in_axes=(0, _BUFFER_AXES, 0))(ts, buffer, keys)


@dataclasses.dataclass(frozen=True)
class SeparatedMPERunner(MPERunner):
    """MPERunner with per-agent policies (params leading axis = agent)."""

    def init_carry(self, key: Array) -> FlatCarry:
        return MPERunner.init_carry(self, key)

    # --------------------------------------------------------- vmapped fwd
    def _vmapped_get_actions(self, ts: TrainState, key, share_obs, obs,
                             h_a, h_c, masks, avail):
        """All args agent-major (N, B, ...); params stacked (N, ...)."""
        keys = jax.random.split(key, self.num_agents)

        def one(params, k, so, o, ha, hc, m, av):
            return self.policy.get_actions(
                params, k, so, o,
                rnn_states_actor=ha, rnn_states_critic=hc, masks=m,
                available_actions=av,
            )

        return jax.vmap(one)(ts.params, keys, share_obs, obs, h_a, h_c, masks, avail)

    # ---------------------------------------------------------------- eval
    def _eval_act(self, ts: TrainState, obs: Array, h: Array, masks: Array):
        """Per-agent deterministic act: vmap ``policy.act`` over the stacked
        (N, ...) params; (B, N, ...) in and out."""
        am = lambda x: jnp.swapaxes(x, 0, 1)  # (B, N, ...) <-> (N, B, ...)

        def one(params, o, ha, m):
            return self.policy.act(
                params, jax.random.PRNGKey(0), o, rnn_states_actor=ha,
                masks=m, available_actions=None, deterministic=True,
            )

        actions, h2 = jax.vmap(one)(ts.params, am(obs), am(h), am(masks))
        return am(actions), am(h2)

    # ------------------------------------------------------------- rollout
    def _rollout_step(self, ts: TrainState, carry: FlatCarry, _):
        B, N = self.n_rollout_threads, self.num_agents
        K = self.policy.dims.action_dim
        A0 = self.policy.dims.num_actions
        am = lambda x: jnp.swapaxes(x, 0, 1)  # (B, N, ...) <-> (N, B, ...)

        share_obs = self._share(carry.obs)
        avail = jnp.ones((B, N, A0), self.dtype)
        key, akey = jax.random.split(carry.key)
        values, actions, logp, h_a, h_c = self._vmapped_get_actions(
            ts, akey, am(share_obs), am(carry.obs), am(carry.rnn_actor),
            am(carry.rnn_critic), am(carry.masks), am(avail),
        )
        actions_bn = am(actions)  # (B, N, K)
        env_actions = actions_bn[..., 0] if K == 1 else actions_bn
        env_state, (next_obs, rew, done) = self.env.vec_step(
            carry.env_state, env_actions
        )

        done_f = done[..., None].astype(self.dtype)
        masks = 1.0 - done_f
        h_a = am(h_a) * (1.0 - done_f[..., None])
        h_c = am(h_c) * (1.0 - done_f[..., None])

        out = dict(
            share_obs=share_obs,
            obs=carry.obs,
            rnn_states=carry.rnn_actor,
            rnn_states_critic=carry.rnn_critic,
            actions=actions_bn.astype(self.dtype),
            action_log_probs=am(logp),
            value_preds=am(values),
            rewards=rew[..., None].astype(self.dtype),
            masks=carry.masks,
            available_actions=avail,
        )
        new_carry = FlatCarry(
            env_state=env_state, obs=next_obs, rnn_actor=h_a, rnn_critic=h_c,
            masks=masks, key=key,
        )
        return new_carry, out

    def collect(self, ts: TrainState, carry: FlatCarry):
        T, B, N = self.episode_length, self.n_rollout_threads, self.num_agents

        carry2, outs = jax.lax.scan(
            lambda c, x: self._rollout_step(ts, c, x), carry, None, length=T
        )
        close = lambda seq, last: jnp.concatenate([seq, last[None]], axis=0)
        share_last = self._share(carry2.obs)
        agent_id = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None, None, :, None], (T + 1, B, N, 1)
        )
        buffer = RolloutBuffer(
            share_obs=close(outs["share_obs"], share_last),
            obs=close(outs["obs"], carry2.obs),
            node_obs=jnp.zeros((T + 1, B, N, 0, 0), self.dtype),
            adj=jnp.zeros((T + 1, B, 0, 0), self.dtype),
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

        am = lambda x: jnp.swapaxes(x, 0, 1)

        def val1(params, so, hc, m):
            return self.policy.get_values(
                params, so, rnn_states_critic=hc, masks=m
            )

        next_values = jax.vmap(val1)(
            ts.params, am(share_last), am(carry2.rnn_critic), am(carry2.masks)
        )  # (N, B, 1)
        next_values = jnp.swapaxes(next_values, 0, 1)  # (B, N, 1)
        # per-agent GAE with each agent's own value normalizer
        buffer = jax.vmap(
            lambda buf1, nv, vn: compute_returns(
                _expand_agent(buf1), nv[:, None], vn,
                self.trainer.gamma, self.trainer.gae_lambda,
                use_gae=self.trainer.base.use_gae,
                use_proper_time_limits=self.trainer.base.use_proper_time_limits,
            ),
            in_axes=(_BUFFER_AXES, 1, 0),
            out_axes=_BUFFER_AXES,
        )(buffer, next_values, ts.vn)
        # the vmapped axis landed at 2; squeeze the leftover singleton at 3
        buffer = _map_fields(buffer, lambda x: jnp.squeeze(x, 3))
        return carry2, buffer

    def train_episode(self, ts: TrainState, carry: FlatCarry, key: Array):
        carry, buffer = self.collect(ts, carry)
        ts, train_info = self.trainer.train(ts, buffer, key)
        train_info = dict(train_info)
        # per-agent scalars -> means for logging (reference logs per agent)
        train_info = {k: jnp.mean(v) for k, v in train_info.items()}
        train_info["average_episode_rewards"] = (
            jnp.mean(buffer.rewards) * self.episode_length
        )
        return ts, carry, train_info
