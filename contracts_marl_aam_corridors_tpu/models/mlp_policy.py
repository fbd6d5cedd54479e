"""Non-graph MAPPO policy (reference ``R_MAPPOPolicy``,
onpolicy/algorithms/MAPPOPolicy.py + ``R_Actor``/``R_Critic``,
actor_critic.py) — the flat-obs path used by the classic MPE scenarios.

API-compatible with ``GRMAPPOPolicy`` (same method names and positional
signatures, with the graph arguments accepted and ignored) so the jitted
``GRMAPPOTrainer`` drives either policy unchanged.  Supports MultiDiscrete
action spaces via ``action_nvec`` (K categorical heads; per-head
log-probs concatenated on the last axis, matching ACTLayer's multi_discrete
branch — the PPO surrogate sums that axis).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from . import distributions as dist
from .actor_critic import MLPActor, MLPCritic
from .config import ModelConfig
from .policy import GRMAPPOPolicy, PolicyParams

__all__ = ["RMAPPOPolicy", "FlatPolicyDims"]

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FlatPolicyDims:
    obs_dim: int
    cent_obs_dim: int
    action_nvec: Tuple[int, ...] = (5,)

    @property
    def num_actions(self) -> int:
        return self.action_nvec[0]

    @property
    def action_dim(self) -> int:
        return len(self.action_nvec)


class RMAPPOPolicy:
    """Two Adam(eps 1e-5) optimizers + act/evaluate API (MAPPOPolicy.py)."""

    def __init__(
        self,
        cfg: ModelConfig,
        dims: FlatPolicyDims,
        lr: float = 7e-4,
        critic_lr: float = 7e-4,
        opti_eps: float = 1e-5,
        weight_decay: float = 0.0,
        max_grad_norm: float = 10.0,
        use_max_grad_norm: bool = True,
        use_linear_lr_decay: bool = False,
    ):
        self.cfg = cfg
        self.dims = dims
        self.nvec = tuple(dims.action_nvec)
        self.actor = MLPActor(cfg, self.nvec)
        self.critic = MLPCritic(cfg)
        self.lr = lr
        self.critic_lr = critic_lr
        self.use_linear_lr_decay = use_linear_lr_decay

        def make_opt(base_lr):
            tx = optax.inject_hyperparams(optax.adam)(learning_rate=base_lr, eps=opti_eps)
            if use_max_grad_norm:
                tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
            return tx

        self.actor_tx = make_opt(lr)
        self.critic_tx = make_opt(critic_lr)

    # ---------------- init ----------------
    def init_params(self, key: Array, dtype=jnp.float32) -> PolicyParams:
        d = self.dims
        k1, k2 = jax.random.split(key)
        obs = jnp.zeros((1, d.obs_dim), dtype)
        cent = jnp.zeros((1, d.cent_obs_dim), dtype)
        h = jnp.zeros((1, self.cfg.recurrent_n, self.cfg.hidden_size), dtype)
        m = jnp.ones((1, 1), dtype)
        actor = self.actor.init(k1, obs, h, m)["params"]
        critic = self.critic.init(k2, cent, h, m)["params"]
        return PolicyParams(actor=actor, critic=critic)

    def init_opt_states(self, params: PolicyParams):
        return self.actor_tx.init(params.actor), self.critic_tx.init(params.critic)

    # lr scheduling identical to the graph policy
    set_lr = staticmethod(GRMAPPOPolicy.set_lr)

    def lr_decay(self, ts, episode: int, episodes: int):
        frac = episode / float(episodes)
        a = self.set_lr(ts.actor_opt, self.lr - self.lr * frac)
        c = self.set_lr(ts.critic_opt, self.critic_lr - self.critic_lr * frac)
        return ts.replace(actor_opt=a, critic_opt=c)

    # ---------------- sampling helpers ----------------
    def _sample(self, key, logits, deterministic):
        if len(self.nvec) == 1:
            return dist.mode(logits) if deterministic else dist.sample(key, logits)
        return (dist.md_mode(logits, self.nvec) if deterministic
                else dist.md_sample(key, logits, self.nvec))

    def _log_probs(self, logits, actions):
        if len(self.nvec) == 1:
            return dist.log_probs(logits, actions)
        return dist.md_log_probs(logits, actions, self.nvec)

    # ---------------- forward APIs ----------------
    def get_actions(
        self,
        params: PolicyParams,
        key: Array,
        cent_obs: Array,
        obs: Array,
        node_obs=None,
        adj=None,
        agent_id=None,
        share_agent_id=None,
        rnn_states_actor: Array = None,
        rnn_states_critic: Array = None,
        masks: Array = None,
        available_actions: Optional[Array] = None,
        deterministic: bool = False,
    ):
        """Rollout pass (MAPPOPolicy.get_actions).  Graph args ignored."""
        logits, rnn_states_actor = self.actor.apply(
            {"params": params.actor}, obs, rnn_states_actor, masks, available_actions
        )
        actions = self._sample(key, logits, deterministic)
        logp = self._log_probs(logits, actions)
        values, rnn_states_critic = self.critic.apply(
            {"params": params.critic}, cent_obs, rnn_states_critic, masks
        )
        return values, actions, logp, rnn_states_actor, rnn_states_critic

    def get_values(self, params, cent_obs, node_obs=None, adj=None,
                   share_agent_id=None, rnn_states_critic=None, masks=None):
        values, _ = self.critic.apply(
            {"params": params.critic}, cent_obs, rnn_states_critic, masks
        )
        return values

    def evaluate_actions(
        self,
        params: PolicyParams,
        cent_obs,
        obs,
        node_obs,
        adj,
        agent_id,
        share_agent_id,
        rnn_states_actor,
        rnn_states_critic,
        action,
        masks,
        available_actions=None,
        active_masks=None,
        time_major: bool = False,
    ):
        """Training-time logp/entropy/values.  With ``time_major`` the MLP
        trunks run over all (T*B) rows in one launch and only the GRU head
        scans, exactly like the graph policy."""
        if not time_major:
            logits, _ = self.actor.apply(
                {"params": params.actor}, obs, rnn_states_actor, masks,
                available_actions,
            )
            values, _ = self.critic.apply(
                {"params": params.critic}, cent_obs, rnn_states_critic, masks
            )
        else:
            T = obs.shape[0]
            flat = lambda x: x.reshape((T * x.shape[1],) + x.shape[2:])
            unflat = lambda x: x.reshape((T, -1) + x.shape[1:])

            feats_a = unflat(self.actor.apply(
                {"params": params.actor}, flat(obs), method=MLPActor.trunk))
            feats_c = unflat(self.critic.apply(
                {"params": params.critic}, flat(cent_obs), method=MLPCritic.trunk))

            def actor_head(h, xs):
                f, m, av = xs
                lg, h = self.actor.apply(
                    {"params": params.actor}, f, h, m, av, method=MLPActor.head
                )
                return h, lg

            _, logits = jax.lax.scan(
                actor_head, rnn_states_actor, (feats_a, masks, available_actions)
            )

            def critic_head(h, xs):
                f, m = xs
                v, h = self.critic.apply(
                    {"params": params.critic}, f, h, m, method=MLPCritic.head
                )
                return h, v

            _, values = jax.lax.scan(critic_head, rnn_states_critic, (feats_c, masks))

        logp = self._log_probs(logits, action)
        if len(self.nvec) == 1:
            ent = dist.entropy(logits)
        else:
            # per-head masked means, averaged over heads (act.py:185-203;
            # WITH gradient — see distributions.md_entropy docstring)
            ent = dist.md_entropy(logits, self.nvec).mean(axis=-1)
        if active_masks is not None:
            am = active_masks.squeeze(-1)
            dist_entropy = jnp.sum(ent * am) / jnp.sum(am)
        else:
            dist_entropy = ent.mean()
        return values, logp, dist_entropy

    def act(self, params, key, obs, node_obs=None, adj=None, agent_id=None,
            rnn_states_actor=None, masks=None, available_actions=None,
            deterministic: bool = False):
        logits, rnn_states_actor = self.actor.apply(
            {"params": params.actor}, obs, rnn_states_actor, masks, available_actions
        )
        return self._sample(key, logits, deterministic), rnn_states_actor
