"""Checkpoint save/restore.

Improves on the reference's actor.pt/critic.pt-only saves
(onpolicy/runner/shared/base_runner.py:172-192): full TrainState (params +
BOTH optimizer states + value-normalizer + episode counter) via orbax, plus a
``config.yaml`` next to the weights like the reference's wandb-written one so
eval can re-merge hyperparameters (eval_mpe.py:97-151).

``restore_reference_policy`` loads the reference's torch ``actor.pt`` /
``critic.pt`` directly (see models/torch_import.py), so trained reference
runs can be evaluated in this framework.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import yaml


def save_checkpoint(save_dir: str, ts, episode: int, config: Optional[dict] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(save_dir, f"ckpt_{episode}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, ts), force=True)
    meta = {"episode": episode, "path": path}
    with open(os.path.join(save_dir, "latest.json"), "w") as f:
        json.dump(meta, f)
    if config is not None:
        with open(os.path.join(save_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(config, f)
    return path


def restore_checkpoint(save_dir: str, ts_template) -> tuple[Any, int]:
    import orbax.checkpoint as ocp

    with open(os.path.join(save_dir, "latest.json")) as f:
        meta = json.load(f)
    with ocp.StandardCheckpointer() as ckptr:
        target = jax.tree.map(np.asarray, ts_template)
        ts = ckptr.restore(meta["path"], target)
    return ts, meta["episode"]


def load_run_config(model_dir: str) -> dict:
    """Read the run's config.yaml (ours, or a reference wandb config.yaml
    whose entries look like {key: {value: v}})."""
    path = os.path.join(model_dir, "config.yaml")
    with open(path) as f:
        raw = yaml.safe_load(f)
    out = {}
    for k, v in (raw or {}).items():
        if isinstance(v, dict) and set(v) >= {"value"}:
            out[k] = v["value"]  # wandb export format
        else:
            out[k] = v
    return out


def merge_eval_args(args, run_cfg: dict):
    """eval_mpe.py ``modify_args``:97-151 — trained-run config wins except for
    an exclude-list of env-shape/eval args the CLI controls."""
    exclude = {
        "num_agents", "num_landmarks", "num_obstacles", "episode_length",
        "model_dir", "use_render", "save_gifs", "render_episodes", "seed",
        "n_rollout_threads", "n_render_rollout_threads", "use_wandb",
        "scenario_name", "run_dir", "experiment_name", "eval_episodes",
    }
    for k, v in run_cfg.items():
        if k in exclude or not hasattr(args, k):
            continue
        cur = getattr(args, k)
        try:
            if isinstance(cur, bool) and isinstance(v, str):
                # reference wandb yamls store bools as 'True'/'False' strings;
                # bool('False') is True, so parse the string explicitly
                setattr(args, k, v.strip().lower() in ("1", "true", "yes", "y", "t"))
            else:
                setattr(args, k, type(cur)(v) if cur is not None else v)
        except (TypeError, ValueError):
            setattr(args, k, v)
    return args


def restore_reference_policy(model_dir: str, cfg, params_template):
    """Load reference torch actor.pt/critic.pt into PolicyParams."""
    from ..models.policy import PolicyParams
    from ..models.torch_import import import_actor, import_critic

    actor = import_actor(os.path.join(model_dir, "actor.pt"), cfg)
    critic_path = os.path.join(model_dir, "critic.pt")
    if os.path.exists(critic_path):
        critic = import_critic(critic_path, cfg)
    else:
        critic = params_template.critic
    return PolicyParams(actor=actor, critic=critic)
