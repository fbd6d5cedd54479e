"""Graph-recurrent actor and critic (reference ``GR_Actor``/``GR_Critic``,
onpolicy/algorithms/graph_actor_critic.py:32-397) as Flax modules.

Shapes (single step):
    obs         (B, obs_dim)          flattened threads*agents rows
    node_obs    (B, E, F)
    adj         (B, E, E)
    agent_id    (B, 1)
    rnn_states  (B, recurrent_N, H)
    masks       (B, 1)   0 => episode boundary, reset hidden state
    available_actions (B, A) or None

Each network is split into ``trunk`` (GNN + MLP — expensive, time-independent)
and ``head`` (GRU + output — cheap, carries state) so BPTT scans only the
head while the trunk runs over every timestep in one batched launch.  The
reference instead re-runs its whole network inside the chunk loop.

The reference's ``split_batch`` minibatching (graph_actor_critic.py:16-29,
147-163) is a host-side OOM workaround with no numeric effect; under XLA the
whole batch is one fused launch, so it has no equivalent here.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import distributions as dist
from .config import ModelConfig
from .nets import GNNBase, MLPBase, RNNLayer, dense_init

Array = jax.Array


def _make_gnn(cfg: ModelConfig, graph_aggr: str, name: str):
    return nn.vmap(
        GNNBase,
        in_axes=(0, 0, 0),
        out_axes=0,
        variable_axes={"params": None},
        split_rngs={"params": False},
    )(cfg, graph_aggr=graph_aggr, name=name)


class GRActor(nn.Module):
    """GNN(node ego-gather) ++ obs -> MLP -> GRU -> categorical logits."""

    cfg: ModelConfig
    num_actions: int

    def setup(self):
        cfg = self.cfg
        self.gnn_base = _make_gnn(cfg, cfg.actor_graph_aggr, "gnn_base")
        self.base = MLPBase(cfg, name="base")
        if cfg.use_recurrent_policy:
            self.rnn = RNNLayer(cfg, name="rnn")
        self.action_out = nn.Dense(
            self.num_actions, kernel_init=dense_init(cfg, cfg.gain), name="action_out"
        )

    def trunk(self, obs: Array, node_obs: Array, adj: Array, agent_id: Array) -> Array:
        nbd = self.gnn_base(node_obs, adj, agent_id)
        return self.post_gnn(obs, nbd)

    def post_gnn(self, obs: Array, nbd: Array) -> Array:
        """Trunk tail after the GNN (for the fused-trunk path, which computes
        ``nbd`` externally from stacked actor+critic GNN params)."""
        return self.base(jnp.concatenate([obs, nbd], axis=-1))

    def head(
        self,
        features: Array,
        rnn_states: Array,
        masks: Array,
        available_actions: Optional[Array] = None,
    ):
        x = features
        if self.cfg.use_recurrent_policy:
            x, rnn_states = self.rnn(x, rnn_states, masks)
        logits = dist.mask_logits(self.action_out(x), available_actions)
        return logits, rnn_states

    def __call__(
        self,
        obs: Array,
        node_obs: Array,
        adj: Array,
        agent_id: Array,
        rnn_states: Array,
        masks: Array,
        available_actions: Optional[Array] = None,
    ):
        return self.head(
            self.trunk(obs, node_obs, adj, agent_id),
            rnn_states,
            masks,
            available_actions,
        )


class GRCritic(nn.Module):
    """GNN(global pool) [++ cent_obs] -> MLP -> GRU -> scalar value."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.gnn_base = _make_gnn(cfg, cfg.critic_graph_aggr, "gnn_base")
        self.base = MLPBase(cfg, name="base")
        if cfg.use_recurrent_policy:
            self.rnn = RNNLayer(cfg, name="rnn")
        # v_out: plain linear (PopArt handled by the ValueNorm-style wrapper in
        # the trainer; reference defaults use_popart=False, config.py).
        self.v_out = nn.Dense(1, kernel_init=dense_init(cfg, 1.0), name="v_out")

    def trunk(self, cent_obs: Array, node_obs: Array, adj: Array, agent_id: Array) -> Array:
        nbd = self.gnn_base(node_obs, adj, agent_id)
        return self.post_gnn(cent_obs, nbd)

    def post_gnn(self, cent_obs: Array, nbd: Array) -> Array:
        if self.cfg.use_cent_obs:
            nbd = jnp.concatenate([cent_obs, nbd], axis=-1)
        return self.base(nbd)

    def head(self, features: Array, rnn_states: Array, masks: Array):
        x = features
        if self.cfg.use_recurrent_policy:
            x, rnn_states = self.rnn(x, rnn_states, masks)
        return self.v_out(x), rnn_states

    def __call__(
        self,
        cent_obs: Array,
        node_obs: Array,
        adj: Array,
        agent_id: Array,
        rnn_states: Array,
        masks: Array,
    ):
        return self.head(
            self.trunk(cent_obs, node_obs, adj, agent_id), rnn_states, masks
        )


class MLPActor(nn.Module):
    """Non-graph actor (reference ``R_Actor``, onpolicy/algorithms/
    actor_critic.py): obs -> MLPBase -> GRU -> categorical logits.  Used for
    the classic flat-obs MPE path (env_name 'MPE').

    ``action_nvec`` with K>1 entries builds the reference ACTLayer's
    MultiDiscrete branch (act.py:44-51): K categorical heads whose logits are
    concatenated; sampling/log-probs are per-head (see
    distributions.md_sample/md_log_probs).  With a single entry this is the
    plain Discrete head incl. available-action masking.
    Same trunk/head split as GRActor so BPTT scans only the GRU."""

    cfg: ModelConfig
    action_nvec: tuple = (5,)

    def setup(self):
        cfg = self.cfg
        self.base = MLPBase(cfg, name="base")
        if cfg.use_recurrent_policy:
            self.rnn = RNNLayer(cfg, name="rnn")
        self.action_out = nn.Dense(
            sum(self.action_nvec), kernel_init=dense_init(cfg, cfg.gain),
            name="action_out",
        )

    def trunk(self, obs: Array) -> Array:
        return self.base(obs)

    def head(self, features: Array, rnn_states: Array, masks: Array,
             available_actions: Optional[Array] = None):
        x = features
        if self.cfg.use_recurrent_policy:
            x, rnn_states = self.rnn(x, rnn_states, masks)
        logits = self.action_out(x)
        if len(self.action_nvec) == 1:
            logits = dist.mask_logits(logits, available_actions)
        return logits, rnn_states

    def __call__(self, obs, rnn_states, masks, available_actions=None):
        return self.head(self.trunk(obs), rnn_states, masks, available_actions)


class MLPCritic(nn.Module):
    """Non-graph critic (reference ``R_Critic``): cent_obs -> MLP -> GRU -> V."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.base = MLPBase(cfg, name="base")
        if cfg.use_recurrent_policy:
            self.rnn = RNNLayer(cfg, name="rnn")
        self.v_out = nn.Dense(1, kernel_init=dense_init(cfg, 1.0), name="v_out")

    def trunk(self, cent_obs: Array) -> Array:
        return self.base(cent_obs)

    def head(self, features: Array, rnn_states: Array, masks: Array):
        x = features
        if self.cfg.use_recurrent_policy:
            x, rnn_states = self.rnn(x, rnn_states, masks)
        return self.v_out(x), rnn_states

    def __call__(self, cent_obs, rnn_states, masks):
        return self.head(self.trunk(cent_obs), rnn_states, masks)
