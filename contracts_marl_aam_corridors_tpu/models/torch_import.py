"""Import reference PyTorch checkpoints (``actor.pt``/``critic.pt``) into
flax params for :class:`GRActor`/:class:`GRCritic`.

The reference saves plain ``state_dict``s (onpolicy/runner/shared/
base_runner.py:172-177).  Mapping notes:

- torch ``nn.Linear`` kernels are (out, in); flax ``Dense`` are (in, out).
- ``EmbedConv`` builds ``lin1`` over ``[node_feat, entity_embed, edge_attr]``
  (gnn_new.py:133-137); our dense kernel splits the last input row off as
  ``lin1_edge`` so the (E,E,.) tensor forms at hidden width.
- ``EmbedConv`` appends the *same* LayerNorm instance after every linear
  (gnn_new.py:67,88-92), so ``layer_norm`` and ``layers.2`` are one tensor —
  we copy it into each of our per-block LayerNorms.
- ``MLPLayer.fc_h`` is a dead template (deepcopy'd into ``fc2`` clones,
  mlp.py:30-35); only ``fc1`` and ``fc2.i`` are live.
- torch ``nn.GRU`` weights (3H, in) with r/z/n row blocks transpose to our
  ``(in, 3H)`` ``w_ih``/``w_hh``.

Requires ``torch`` only for deserialization (CPU).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .config import ModelConfig


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()}


def _dense(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _gnn_params(sd, cfg: ModelConfig, prefix: str = "gnn_base.gnn"):
    p = {}
    # EmbedConv
    lin1_w = sd[f"{prefix}.embed_layer.lin1.weight"]  # (hidden, feat+emb+edge)
    embed = {
        "entity_embed": {"embedding": sd[f"{prefix}.embed_layer.entity_embed.weight"]},
        "lin1": {"kernel": lin1_w[:, :-1].T, "bias": sd[f"{prefix}.embed_layer.lin1.bias"]},
        "lin1_edge": lin1_w[:, -1:].T,  # (1, hidden)
        "ln1": _ln(sd, f"{prefix}.embed_layer.layer_norm"),
    }
    for i in range(cfg.embed_layer_n):
        embed[f"lin{i+2}"] = _dense(sd, f"{prefix}.embed_layer.layers.{3*i}")
        embed[f"ln{i+2}"] = _ln(sd, f"{prefix}.embed_layer.layer_norm")
    p["embed_layer"] = embed

    def conv(cp):
        out = {
            "lin_query": _dense(sd, f"{cp}.lin_query"),
            "lin_key": _dense(sd, f"{cp}.lin_key"),
            "lin_value": _dense(sd, f"{cp}.lin_value"),
            "lin_edge": sd[f"{cp}.lin_edge.weight"].T,  # (1, H*C)
            "lin_skip": _dense(sd, f"{cp}.lin_skip"),
        }
        return out

    p["gnn1"] = conv(f"{prefix}.gnn1")
    for i in range(cfg.gnn_layer_n):
        p[f"gnn2_{i}"] = conv(f"{prefix}.gnn2.{i}")
    return p


def _mlp_base(sd, cfg: ModelConfig, prefix: str = "base"):
    p = {}
    if cfg.use_feature_normalization:
        p["feature_norm"] = _ln(sd, f"{prefix}.feature_norm")
    mlp = {
        "fc0": _dense(sd, f"{prefix}.mlp.fc1.0"),
        "ln0": _ln(sd, f"{prefix}.mlp.fc1.2"),
    }
    for i in range(cfg.layer_N):
        mlp[f"fc{i+1}"] = _dense(sd, f"{prefix}.mlp.fc2.{i}.0")
        mlp[f"ln{i+1}"] = _ln(sd, f"{prefix}.mlp.fc2.{i}.2")
    p["mlp"] = mlp
    return p


def _rnn(sd, cfg: ModelConfig, prefix: str = "rnn"):
    p = {}
    for l in range(cfg.recurrent_n):
        p[f"gru{l}"] = {
            "w_ih": sd[f"{prefix}.rnn.weight_ih_l{l}"].T,
            "w_hh": sd[f"{prefix}.rnn.weight_hh_l{l}"].T,
            "b_ih": sd[f"{prefix}.rnn.bias_ih_l{l}"],
            "b_hh": sd[f"{prefix}.rnn.bias_hh_l{l}"],
        }
    p["norm"] = _ln(sd, f"{prefix}.norm")
    return p


def import_actor(path: str, cfg: ModelConfig) -> dict:
    """actor.pt state_dict -> GRActor params pytree."""
    sd = _load_state_dict(path)
    return {
        "gnn_base": _gnn_params(sd, cfg),
        "base": _mlp_base(sd, cfg),
        **({"rnn": _rnn(sd, cfg)} if cfg.use_recurrent_policy else {}),
        "action_out": _dense(sd, "act.action_out.linear"),
    }


def import_critic(path: str, cfg: ModelConfig) -> dict:
    """critic.pt state_dict -> GRCritic params pytree."""
    sd = _load_state_dict(path)
    return {
        "gnn_base": _gnn_params(sd, cfg),
        "base": _mlp_base(sd, cfg),
        **({"rnn": _rnn(sd, cfg)} if cfg.use_recurrent_policy else {}),
        "v_out": _dense(sd, "v_out"),
    }
