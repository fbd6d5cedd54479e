"""Policy wrapper: actor+critic params, optimizers, and the action API.

Functional counterpart of ``GR_MAPPOPolicy``
(onpolicy/algorithms/graph_MAPPOPolicy.py:11-307): two Adam optimizers with
eps=1e-5 (:71-77), ``get_actions``/``get_values``/``evaluate_actions``/``act``,
and linear lr decay (``lr_decay``:79 -> utils.util.update_linear_schedule).
All methods are pure (params in, tensors out) so they jit/vmap/shard freely.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from . import distributions as dist
from .actor_critic import GRActor, GRCritic
from .config import ModelConfig

__all__ = ["GRMAPPOPolicy", "PolicyParams", "PolicyDims"]

Array = jax.Array


@struct.dataclass
class PolicyParams:
    actor: Any
    critic: Any


@dataclasses.dataclass(frozen=True)
class PolicyDims:
    obs_dim: int
    cent_obs_dim: int
    num_entities: int
    node_feat_dim: int
    num_actions: int


class GRMAPPOPolicy:
    def __init__(
        self,
        cfg: ModelConfig,
        dims: PolicyDims,
        lr: float = 7e-4,
        critic_lr: float = 7e-4,
        opti_eps: float = 1e-5,
        weight_decay: float = 0.0,
        max_grad_norm: float = 10.0,
        use_max_grad_norm: bool = True,
        total_updates: int = 1,
        use_linear_lr_decay: bool = False,
        fuse_gnn_trunks: bool = False,
    ):
        from .config import apply_entity_envelope

        # Auto-selected pallas_fused is downgraded to transposed above the
        # backward kernel's validated entity envelope (config.py
        # PALLAS_BWD_MAX_ENTITIES — the Mosaic compiler crashes at E>=8).
        cfg = apply_entity_envelope(cfg, dims.num_entities)
        self.cfg = cfg
        self.dims = dims
        self.actor = GRActor(cfg, dims.num_actions)
        self.critic = GRCritic(cfg)
        # BPTT structure: "batched" runs the GNN/MLP trunk over all timesteps
        # in one launch and scans only the GRU head; "scanned" keeps the whole
        # network inside the time scan (lower peak memory).  "scanned" is
        # GATED on TPU — see the trunk_mode property.
        self._trunk_mode = "batched"
        # Fused trunks: the actor and critic GNNs have identical parameter
        # structures, so the PPO update can run BOTH as one vmapped launch
        # over stacked params.  MEASURED: 1.20x standalone on the double-GNN
        # fwd+bwd, but 0.88x at the EPISODE level (3.63 s vs 3.19-3.26 s) —
        # the stacking disrupts XLA's own scheduling inside the fused
        # program.  NOT an optimization; retained flag-off as the validated
        # measurement closing the structural-batching hypothesis
        # (BENCH_NOTES.md).
        self.fuse_gnn_trunks = fuse_gnn_trunks

        # Linear lr decay is applied per-EPISODE by the runner via ``set_lr``
        # (reference lr_decay -> update_linear_schedule, graph_MAPPOPolicy.py:79),
        # not per optimizer step, hence inject_hyperparams instead of an optax
        # schedule.
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

    @property
    def trunk_mode(self) -> str:
        return self._trunk_mode

    @trunk_mode.setter
    def trunk_mode(self, value: str) -> None:
        if value not in ("batched", "scanned"):
            raise ValueError(f"unknown trunk_mode {value!r}")
        if value == "scanned":
            import jax as _jax

            if _jax.default_backend() == "tpu":
                raise RuntimeError(
                    "trunk_mode='scanned' is disabled on TPU: the full-network "
                    "time scan produces an HLO graph that reliably crashes the "
                    "remote compile helper (HTTP 500 / SIGSEGV) on this "
                    "deployment (see BENCH_NOTES.md). Use the default "
                    "'batched' mode (trunk over all timesteps in one launch, "
                    "GRU-only scan) — it is also the faster formulation."
                )
        self._trunk_mode = value

    # ---------------- init ----------------
    def init_params(self, key: Array, dtype=jnp.float32) -> PolicyParams:
        d = self.dims
        k1, k2 = jax.random.split(key)
        obs = jnp.zeros((1, d.obs_dim), dtype)
        cent = jnp.zeros((1, d.cent_obs_dim), dtype)
        node = jnp.zeros((1, d.num_entities, d.node_feat_dim), dtype)
        adj = jnp.zeros((1, d.num_entities, d.num_entities), dtype)
        aid = jnp.zeros((1, 1), jnp.int32)
        h = jnp.zeros((1, self.cfg.recurrent_n, self.cfg.hidden_size), dtype)
        m = jnp.ones((1, 1), dtype)
        actor = self.actor.init(k1, obs, node, adj, aid, h, m)["params"]
        critic = self.critic.init(k2, cent, node, adj, aid, h, m)["params"]
        return PolicyParams(actor=actor, critic=critic)

    def init_opt_states(self, params: PolicyParams):
        return self.actor_tx.init(params.actor), self.critic_tx.init(params.critic)

    @staticmethod
    def set_lr(opt_state, lr: float):
        """Update the injected learning rate in an optimizer state
        (reference ``update_linear_schedule``: lr * (1 - episode/episodes))."""
        import numpy as np

        def fix(st):
            if hasattr(st, "hyperparams") and "learning_rate" in st.hyperparams:
                hp = dict(st.hyperparams)
                old = hp["learning_rate"]
                # keep the existing leaf's shape/dtype: separated training
                # vmaps a stacked (N,) lr leaf, so a rank-0 replacement would
                # break the vmapped train call
                hp["learning_rate"] = jnp.full_like(jnp.asarray(old), lr)
                return st._replace(hyperparams=hp)
            if isinstance(st, tuple) and not hasattr(st, "_fields"):
                return tuple(fix(s) for s in st)
            return st

        return fix(opt_state)

    def lr_decay(self, ts, episode: int, episodes: int):
        """Apply per-episode linear decay to both optimizers (lr_decay:79)."""
        frac = episode / float(episodes)
        a = self.set_lr(ts.actor_opt, self.lr - self.lr * frac)
        c = self.set_lr(ts.critic_opt, self.critic_lr - self.critic_lr * frac)
        return ts.replace(actor_opt=a, critic_opt=c)

    # ---------------- fused trunks ----------------
    def _fused_trunks(self, params, obs, cent_obs, node_obs, adj, agent_id):
        """Run actor+critic GNNs as ONE vmapped launch over stacked params
        (identical subtree structures), then each side's aggregation and
        trunk tail.  Inputs are flat (R, ...) rows."""
        from flax import linen as nn

        from .actor_critic import GRActor, GRCritic
        from .nets import GNNBase

        raw = nn.vmap(
            GNNBase, in_axes=(0, 0, 0), out_axes=0,
            variable_axes={"params": None}, split_rngs={"params": False},
        )(self.cfg, graph_aggr="none")
        stacked = jax.tree.map(
            lambda a, c: jnp.stack([a, c]),
            params.actor["gnn_base"], params.critic["gnn_base"],
        )
        nodes = jax.vmap(
            lambda p: raw.apply({"params": p}, node_obs, adj, agent_id)
        )(stacked)  # (2, R, E, H)

        onehot = jax.nn.one_hot(
            agent_id.reshape(-1).astype(jnp.int32), nodes.shape[2], dtype=nodes.dtype
        )
        nbd_a = jnp.einsum("re,reh->rh", onehot, nodes[0])
        aggr = self.cfg.global_aggr_type
        if aggr == "mean":
            nbd_c = nodes[1].mean(axis=1)
        elif aggr == "max":
            nbd_c = nodes[1].max(axis=1)
        else:  # add
            nbd_c = nodes[1].sum(axis=1)

        feats_a = self.actor.apply(
            {"params": params.actor}, obs, nbd_a, method=GRActor.post_gnn
        )
        feats_c = self.critic.apply(
            {"params": params.critic}, cent_obs, nbd_c, method=GRCritic.post_gnn
        )
        return feats_a, feats_c

    def _transposed_trunks(self, params, obs, cent_obs, node_obs, adj, agent_id, share_agent_id):
        """GNN trunks via the transposed-layout formulation
        (nets.gnn_transposed_apply; 5.4x fwd+bwd at the update batch)."""
        from .actor_critic import GRActor, GRCritic
        from .nets import gnn_transposed_apply

        # NB: a dual-launch variant (both trunks in ONE pallas kernel,
        # nets.gnn_transposed_apply_dual) measured a WASH on the episode
        # (633 vs 628 ms) — kept in-tree and tested, not routed; the two
        # independent calls are the path the 5M training run validated.
        nbd_a = gnn_transposed_apply(
            self.cfg, params.actor["gnn_base"], node_obs, adj, agent_id,
            "node",
        )
        nbd_c = gnn_transposed_apply(
            self.cfg, params.critic["gnn_base"], node_obs, adj, None,
            self.cfg.global_aggr_type,
        )
        feats_a = self.actor.apply(
            {"params": params.actor}, obs, nbd_a, method=GRActor.post_gnn
        )
        feats_c = self.critic.apply(
            {"params": params.critic}, cent_obs, nbd_c, method=GRCritic.post_gnn
        )
        return feats_a, feats_c

    # ---------------- forward APIs ----------------
    def _transposed_routable(self) -> bool:
        """True when the transposed/pallas trunk formulation computes the
        same function as the dense per-row GNN (node actor aggr, global
        critic aggr, no concat heads) — the routing condition
        ``evaluate_actions`` uses for the update path."""
        return (
            self.cfg.gnn_impl in ("transposed", "pallas_fused")
            and self.cfg.actor_graph_aggr == "node"
            and self.cfg.critic_graph_aggr == "global"
            and not self.cfg.gnn_concat_heads
        )

    def get_actions(
        self,
        params: PolicyParams,
        key: Array,
        cent_obs: Array,
        obs: Array,
        node_obs: Array,
        adj: Array,
        agent_id: Array,
        share_agent_id: Array,
        rnn_states_actor: Array,
        rnn_states_critic: Array,
        masks: Array,
        available_actions: Optional[Array] = None,
        deterministic: bool = False,
    ):
        """Rollout-time joint actor+critic pass (graph_MAPPOPolicy.py:96-165).

        When the transposed/pallas trunk formulation is routable (same
        condition as the update path in ``evaluate_actions``) the collect
        step runs BOTH GNN trunks through it instead of the dense per-row
        path — the rollout scan was the last place still paying the dense
        cost (VERDICT r4 item 2: kernel coverage of the collect path)."""
        if self._transposed_routable():
            feats_a, feats_c = self._transposed_trunks(
                params, obs, cent_obs, node_obs, adj, agent_id, share_agent_id
            )
            logits, rnn_states_actor = self.actor.apply(
                {"params": params.actor}, feats_a, rnn_states_actor, masks,
                available_actions, method=GRActor.head,
            )
            values, rnn_states_critic = self.critic.apply(
                {"params": params.critic}, feats_c, rnn_states_critic, masks,
                method=GRCritic.head,
            )
        else:
            logits, rnn_states_actor = self.actor.apply(
                {"params": params.actor},
                obs,
                node_obs,
                adj,
                agent_id,
                rnn_states_actor,
                masks,
                available_actions,
            )
            values, rnn_states_critic = self.critic.apply(
                {"params": params.critic},
                cent_obs,
                node_obs,
                adj,
                share_agent_id,
                rnn_states_critic,
                masks,
            )
        actions = dist.mode(logits) if deterministic else dist.sample(key, logits)
        action_log_probs = dist.log_probs(logits, actions)
        return values, actions, action_log_probs, rnn_states_actor, rnn_states_critic

    def get_values(
        self, params, cent_obs, node_obs, adj, share_agent_id, rnn_states_critic, masks
    ):
        values, _ = self.critic.apply(
            {"params": params.critic},
            cent_obs,
            node_obs,
            adj,
            share_agent_id,
            rnn_states_critic,
            masks,
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
        """Training-time logp/entropy/values (graph_MAPPOPolicy.py:199-264).

        With ``time_major=True`` the leading axes are (T, B, ...): the
        time-independent GNN+MLP trunks run over all T*B rows in ONE batched
        launch, and only the tiny GRU head scans over time — replacing the
        reference's has_zeros chunk loop (rnn.py:42-75), which re-runs the
        whole network sequentially.
        """
        if not time_major:
            logits, _ = self.actor.apply(
                {"params": params.actor},
                obs, node_obs, adj, agent_id, rnn_states_actor, masks,
                available_actions,
            )
            values, _ = self.critic.apply(
                {"params": params.critic},
                cent_obs, node_obs, adj, share_agent_id, rnn_states_critic, masks,
            )
        elif self.trunk_mode == "scanned":
            # whole network inside the time scan (residuals stay per-step)
            def actor_step(h, xs):
                o, no, ad, ai, m, av = xs
                lg, h = self.actor.apply(
                    {"params": params.actor}, o, no, ad, ai, h, m, av
                )
                return h, lg

            _, logits = jax.lax.scan(
                actor_step, rnn_states_actor,
                (obs, node_obs, adj, agent_id, masks, available_actions),
            )

            def critic_step(h, xs):
                co, no, ad, ai, m = xs
                v, h = self.critic.apply(
                    {"params": params.critic}, co, no, ad, ai, h, m
                )
                return h, v

            _, values = jax.lax.scan(
                critic_step, rnn_states_critic,
                (cent_obs, node_obs, adj, share_agent_id, masks),
            )
        else:
            T = obs.shape[0]
            flat = lambda x: x.reshape((T * x.shape[1],) + x.shape[2:])
            unflat = lambda x: x.reshape((T, -1) + x.shape[1:])

            fuse = (
                self.fuse_gnn_trunks
                and self.cfg.actor_graph_aggr == "node"
                and self.cfg.critic_graph_aggr == "global"
            )
            transposed = (
                self.cfg.gnn_impl in ("transposed", "pallas_fused")
                and self.cfg.actor_graph_aggr == "node"
                and self.cfg.critic_graph_aggr == "global"
                and not self.cfg.gnn_concat_heads
            )
            if transposed:
                feats_a, feats_c = self._transposed_trunks(
                    params, flat(obs), flat(cent_obs), flat(node_obs),
                    flat(adj), flat(agent_id), flat(share_agent_id),
                )
                feats_a, feats_c = unflat(feats_a), unflat(feats_c)
            elif fuse:
                feats_a, feats_c = self._fused_trunks(
                    params, flat(obs), flat(cent_obs), flat(node_obs),
                    flat(adj), flat(agent_id),
                )
                feats_a, feats_c = unflat(feats_a), unflat(feats_c)
            else:
                feats_a = unflat(
                    self.actor.apply(
                        {"params": params.actor},
                        flat(obs), flat(node_obs), flat(adj), flat(agent_id),
                        method=GRActor.trunk,
                    )
                )
                feats_c = unflat(
                    self.critic.apply(
                        {"params": params.critic},
                        flat(cent_obs), flat(node_obs), flat(adj), flat(share_agent_id),
                        method=GRCritic.trunk,
                    )
                )

            # ONE scan advances both heads (same math as two sequential
            # scans; halves the per-step scan overhead of the tiny GRUs)
            def both_heads(carry, xs):
                h_a, h_c = carry
                f_a, f_c, m, av = xs
                lg, h_a = self.actor.apply(
                    {"params": params.actor}, f_a, h_a, m, av, method=GRActor.head
                )
                v, h_c = self.critic.apply(
                    {"params": params.critic}, f_c, h_c, m, method=GRCritic.head
                )
                return (h_a, h_c), (lg, v)

            _, (logits, values) = jax.lax.scan(
                both_heads, (rnn_states_actor, rnn_states_critic),
                (feats_a, feats_c, masks, available_actions),
            )
        action_log_probs = dist.log_probs(logits, action)
        ent = dist.entropy(logits)
        if active_masks is not None:
            am = active_masks.squeeze(-1)
            dist_entropy = jnp.sum(ent * am) / jnp.sum(am)
        else:
            dist_entropy = ent.mean()
        return values, action_log_probs, dist_entropy

    def act(
        self,
        params: PolicyParams,
        key: Array,
        obs,
        node_obs,
        adj,
        agent_id,
        rnn_states_actor,
        masks,
        available_actions=None,
        deterministic: bool = False,
    ):
        logits, rnn_states_actor = self.actor.apply(
            {"params": params.actor},
            obs, node_obs, adj, agent_id, rnn_states_actor, masks,
            available_actions,
        )
        actions = dist.mode(logits) if deterministic else dist.sample(key, logits)
        return actions, rnn_states_actor
