"""Recurrent MAPPO trainer (reference ``GR_MAPPO``,
onpolicy/algorithms/graph_mappo.py:21-369) as one jitted train step.

The whole update — advantage normalization, recurrent chunking, ppo_epoch x
num_mini_batch sweeps, both optimizers — is a single compiled function.  The
reference's recurrent_generator (graph_buffer.py:597-758) reorders
(T, B, N, ...) -> (B, N, T, ...) -> flat, then slices contiguous
``data_chunk_length`` windows with the GRU state captured at each chunk head;
because the windows tile the flattened axis exactly, that is a plain reshape
to (S, L, ...) here, and a shuffled epoch is ``jax.random.permutation`` over
S.  AMP/GradScaler (graph_mappo.py:59,120) is CUDA-specific and dropped — XLA
on TPU handles mixed precision without loss scaling.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.policy import GRMAPPOPolicy, PolicyParams
from .buffer import RolloutBuffer
from .valuenorm import ValueNormState, vn_denormalize, vn_normalize, vn_update

Array = jax.Array


@struct.dataclass
class TrainState:
    params: PolicyParams
    actor_opt: Any
    critic_opt: Any
    vn: Optional[ValueNormState]


def huber(e: Array, delta: float) -> Array:
    """Reference ``huber_loss`` (onpolicy/utils/util.py:24-27), replicated
    bug-for-bug: the linear branch tests ``e > d`` (not ``|e| > d``), so
    errors below ``-delta`` contribute ZERO loss/gradient.  Load-bearing for
    matching the reference's training dynamics."""
    a = (jnp.abs(e) <= delta).astype(e.dtype)
    b = (e > delta).astype(e.dtype)
    return a * e**2 / 2 + b * delta * (jnp.abs(e) - delta / 2)


def cal_value_loss(
    values: Array,
    value_preds: Array,
    returns: Array,
    active_masks: Array,
    vn,
    *,
    clip_param: float,
    use_huber_loss: bool,
    huber_delta: float,
    use_clipped_value_loss: bool,
    use_value_active_masks: bool,
) -> Array:
    """Reference ``GR_MAPPO.cal_value_loss`` (graph_mappo.py:70-119): value
    clip around the old predictions, normalized-return targets (``vn`` is the
    ALREADY-UPDATED normalizer state or None — the reference updates from the
    batch returns before normalizing), huber-or-mse, max of clipped/original,
    active-mask averaging."""
    v_clipped = value_preds + jnp.clip(
        values - value_preds, -clip_param, clip_param
    )
    tgt = vn_normalize(vn, returns) if vn is not None else returns
    e_clip, e_orig = tgt - v_clipped, tgt - values
    if use_huber_loss:
        vl_clip, vl_orig = huber(e_clip, huber_delta), huber(e_orig, huber_delta)
    else:
        vl_clip, vl_orig = 0.5 * e_clip**2, 0.5 * e_orig**2
    vl = jnp.maximum(vl_orig, vl_clip) if use_clipped_value_loss else vl_orig
    if use_value_active_masks:
        return (vl * active_masks).sum() / active_masks.sum()
    return vl.mean()


def _masked_mean_std(x: Array, mask: Array):
    """nanmean/nanstd over active entries (graph_mappo.py:300-304)."""
    w = mask
    total = jnp.maximum(w.sum(), 1.0)
    mean = (x * w).sum() / total
    var = (((x - mean) ** 2) * w).sum() / total
    return mean, jnp.sqrt(var)


def _to_chunks(x: Array, L: int) -> Array:
    """(T, B, N, ...) -> (S, L, ...) with S = B*N*T/L, matching the
    recurrent_generator's transpose(1,2,0).reshape + window slicing."""
    T, B, N = x.shape[:3]
    x = jnp.moveaxis(x, 0, 2)  # (B, N, T, ...)
    flat = x.reshape((B * N * T,) + x.shape[3:])
    S = (B * N * T) // L
    return flat[: S * L].reshape((S, L) + x.shape[3:])


@dataclasses.dataclass(frozen=True)
class GRMAPPOTrainer:
    policy: GRMAPPOPolicy
    clip_param: float = 0.2
    ppo_epoch: int = 15
    num_mini_batch: int = 1
    data_chunk_length: int = 10
    value_loss_coef: float = 1.0
    entropy_coef: float = 0.01
    huber_delta: float = 10.0
    gamma: float = 0.99
    gae_lambda: float = 0.95
    use_clipped_value_loss: bool = True
    use_huber_loss: bool = True
    use_valuenorm: bool = True
    use_popart: bool = False
    use_value_active_masks: bool = True
    use_policy_active_masks: bool = True
    # return-computation branches (graph_buffer.py:285-366); consumed by the
    # runners' compute_returns call
    use_gae: bool = True
    use_proper_time_limits: bool = False

    def init_state(self, key, dtype=jnp.float32) -> TrainState:
        from .popart import popart_init
        from .valuenorm import vn_init

        params = self.policy.init_params(key, dtype)
        a_opt, c_opt = self.policy.init_opt_states(params)
        if self.use_popart:
            vn = popart_init(dtype)
        elif self.use_valuenorm:
            vn = vn_init(dtype)
        else:
            vn = None
        return TrainState(params=params, actor_opt=a_opt, critic_opt=c_opt, vn=vn)

    # ------------------------------------------------------------------
    def _minibatch_update(self, ts: TrainState, batch) -> tuple[TrainState, dict]:
        """One ppo_update (graph_mappo.py:121-278). ``batch`` arrays are
        time-major (L, mb, ...); rnn head states are (mb, rN, H)."""
        (
            share_obs, obs, node_obs, adj, agent_id, share_agent_id,
            h_actor, h_critic, actions, value_preds, returns, masks,
            active_masks, old_logp, adv, avail,
        ) = batch

        # value normalizer updates from returns BEFORE normalize
        # (cal_value_loss, graph_mappo.py:93-99).  PopArt additionally
        # rescales the critic's output layer (output-preserving).
        params_in = ts.params
        popart_rescale = None
        if ts.vn is None:
            vn = None
        elif self.use_popart:
            from .popart import popart_update, rescale_v_out

            vn, scale, shift = popart_update(ts.vn, returns.reshape(-1, 1))
            popart_rescale = lambda p: {**p, "v_out": rescale_v_out(p["v_out"], scale, shift)}
        else:
            vn = vn_update(ts.vn, returns.reshape(-1, 1))

        def loss_fn(params: PolicyParams):
            values, logp, entropy = self.policy.evaluate_actions(
                params, share_obs, obs, node_obs, adj, agent_id, share_agent_id,
                h_actor, h_critic, actions, masks, avail, active_masks,
                time_major=True,
            )
            ratio = jnp.exp(logp - old_logp)
            surr1 = ratio * adv
            surr2 = jnp.clip(ratio, 1.0 - self.clip_param, 1.0 + self.clip_param) * adv
            obj = jnp.sum(jnp.minimum(surr1, surr2), axis=-1, keepdims=True)
            if self.use_policy_active_masks:
                policy_loss = -(obj * active_masks).sum() / active_masks.sum()
            else:
                policy_loss = -obj.mean()

            value_loss = cal_value_loss(
                values, value_preds, returns, active_masks, vn,
                clip_param=self.clip_param,
                use_huber_loss=self.use_huber_loss,
                huber_delta=self.huber_delta,
                use_clipped_value_loss=self.use_clipped_value_loss,
                use_value_active_masks=self.use_value_active_masks,
            )

            total = (
                policy_loss
                - entropy * self.entropy_coef
                + value_loss * self.value_loss_coef
            )
            return total, (policy_loss, value_loss, entropy, ratio.mean())

        grads, (policy_loss, value_loss, entropy, ratio) = jax.grad(
            loss_fn, has_aux=True
        )(ts.params)

        gnorm = lambda g: optax_global_norm(g)
        actor_gn, critic_gn = gnorm(grads.actor), gnorm(grads.critic)
        up_a, new_a_opt = self.policy.actor_tx.update(grads.actor, ts.actor_opt, ts.params.actor)
        up_c, new_c_opt = self.policy.critic_tx.update(grads.critic, ts.critic_opt, ts.params.critic)
        critic_base = ts.params.critic
        if popart_rescale is not None:
            # rescale v_out (forward/backward already used the old weights,
            # matching the reference's order), then apply the gradient step
            critic_base = popart_rescale(dict(critic_base))
        new_params = PolicyParams(
            actor=optax.apply_updates(ts.params.actor, up_a),
            critic=optax.apply_updates(critic_base, up_c),
        )
        info = {
            "value_loss": value_loss,
            "policy_loss": policy_loss,
            "dist_entropy": entropy,
            "actor_grad_norm": actor_gn,
            "critic_grad_norm": critic_gn,
            "ratio": ratio,
        }
        return TrainState(new_params, new_a_opt, new_c_opt, vn), info

    # ------------------------------------------------------------------
    def train(self, ts: TrainState, buffer: RolloutBuffer, key: Array):
        """Full update from a rollout (graph_mappo.py ``train``:280-369)."""
        L = self.data_chunk_length
        T, B, N = buffer.rewards.shape[:3]

        # advantages (denormalized preds), nan-masked normalization
        vp = buffer.value_preds[:-1]
        if ts.vn is not None:
            vp = vn_denormalize(ts.vn, vp)
        advantages = buffer.returns[:-1] - vp
        mean, std = _masked_mean_std(advantages, buffer.active_masks[:-1])
        advantages = (advantages - mean) / (std + 1e-5)

        # chunk-major tensors; adj is stored per env -> broadcast per agent
        adj_per_agent = jnp.broadcast_to(
            buffer.adj[:-1, :, None], (T, B, N) + buffer.adj.shape[2:]
        )
        share_agent_id = jnp.broadcast_to(
            jnp.swapaxes(buffer.agent_id[:-1], 2, 3), buffer.agent_id[:-1].shape[:2] + (N, N)
        ).reshape(T, B, N, N)

        chunks = dict(
            share_obs=_to_chunks(buffer.share_obs[:-1], L),
            obs=_to_chunks(buffer.obs[:-1], L),
            node_obs=_to_chunks(buffer.node_obs[:-1], L),
            adj=_to_chunks(adj_per_agent, L),
            agent_id=_to_chunks(buffer.agent_id[:-1], L),
            share_agent_id=_to_chunks(share_agent_id, L),
            h_actor=_to_chunks(buffer.rnn_states[:-1], L)[:, 0],
            h_critic=_to_chunks(buffer.rnn_states_critic[:-1], L)[:, 0],
            actions=_to_chunks(buffer.actions, L),
            value_preds=_to_chunks(buffer.value_preds[:-1], L),
            returns=_to_chunks(buffer.returns[:-1], L),
            masks=_to_chunks(buffer.masks[:-1], L),
            active_masks=_to_chunks(buffer.active_masks[:-1], L),
            old_logp=_to_chunks(buffer.action_log_probs, L),
            adv=_to_chunks(advantages, L),
            avail=_to_chunks(buffer.available_actions[:-1], L),
        )
        S = chunks["obs"].shape[0]
        mb_size = S // self.num_mini_batch

        order = [
            "share_obs", "obs", "node_obs", "adj", "agent_id", "share_agent_id",
            "h_actor", "h_critic", "actions", "value_preds", "returns", "masks",
            "active_masks", "old_logp", "adv", "avail",
        ]
        stacked = tuple(chunks[k] for k in order)
        head_keys = {"h_actor", "h_critic"}

        if self.num_mini_batch == 1:
            # fast path: a single minibatch is the whole batch — shuffling has
            # no effect on the update, so skip the per-epoch permutation
            # gather and build the time-major tensors ONCE
            batch = tuple(
                arr if k in head_keys else jnp.swapaxes(arr, 0, 1)
                for k, arr in zip(order, stacked)
            )

            def epoch_body(ts, _):
                ts, info = self._minibatch_update(ts, batch)
                return ts, info

            ts, infos = jax.lax.scan(epoch_body, ts, None, length=self.ppo_epoch)
            return ts, jax.tree.map(jnp.mean, infos)

        def epoch_body(carry, epoch_key):
            ts = carry
            perm = jax.random.permutation(epoch_key, S)[: mb_size * self.num_mini_batch]
            perm = perm.reshape(self.num_mini_batch, mb_size)

            def mb_body(ts, idx):
                batch = []
                for k, arr in zip(order, stacked):
                    sel = jnp.take(arr, idx, axis=0)
                    if k not in head_keys:
                        sel = jnp.swapaxes(sel, 0, 1)  # (L, mb, ...) time-major
                    batch.append(sel)
                return self._minibatch_update(ts, tuple(batch))

            ts, infos = jax.lax.scan(mb_body, ts, perm)
            return ts, jax.tree.map(jnp.mean, infos)

        epoch_keys = jax.random.split(key, self.ppo_epoch)
        ts, infos = jax.lax.scan(epoch_body, ts, epoch_keys)
        train_info = jax.tree.map(jnp.mean, infos)
        return ts, train_info


def optax_global_norm(tree) -> Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))
