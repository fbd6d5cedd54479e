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
    """Restore a full TrainState.  ``save_dir`` may be a run/models dir
    (latest.json wins), a direct ckpt_<N> dir, or a dir containing ckpt_<N>
    subdirs (highest N wins) — same layouts as ``_resolve_ckpt_path``."""
    import orbax.checkpoint as ocp

    path = _resolve_ckpt_path(save_dir)
    episode = int(os.path.basename(path).split("_")[1])
    with ocp.StandardCheckpointer() as ckptr:
        target = jax.tree.map(np.asarray, ts_template)
        ts = ckptr.restore(path, target)
    return ts, episode


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


# ----------------------------------------------------------- warm start
# The reference's ``restore`` (base_runner.py:179-192) loads actor/critic
# WEIGHTS only — optimizers start fresh and the episode counter resets.  Its
# checked-in three_phase run was produced exactly this way: config.yaml
# records ``model_dir: model_weights/tube/rot_inv/airtaxi/try/three`` (a
# rot_inv-family checkpoint) feeding a three_phase_graph training run.  The
# intermediate checkpoint it used is not in the repo, so cross-scenario
# transfer here additionally supports an obs-layout remap: rot_inv's 13-dim
# observation grows to the two/three_phase 15-dim one by inserting the
# heading-alignment pair at slots 12-13 (corridor.py obs builder), with the
# trailing phase slot moving 12 -> 14.  New obs rows enter the actor's first
# dense layer as zeros (ignored at step 0) and its input LayerNorm with
# scale 1 / bias 0.  NB the transfer is approximately (not exactly)
# function-preserving: fc0 ignores the new rows, but the input LayerNorm
# normalizes across the whole feature axis, so its statistics shift with the
# two inserted features.  Empirically the shift is negligible — the
# remapped rot_inv checkpoint evaluates at 0.974 success on three_phase
# with zero further training (BENCH_NOTES.md).

# Flags that change the network FUNCTION without changing any parameter
# shape: a mismatched warm start loads cleanly and computes garbage (a
# tanh-GNN rot_inv checkpoint fine-tuned under the post-split ReLU-GNN
# defaults evaluated at 0.000 gate success where zero-shot transfer of the
# same weights scores 0.831).  Architecture-shape flags don't need this
# guard — they fail loudly in ``adopt`` with a tree/shape error.
_ARCH_ACT_FLAGS = ("use_ReLU", "embed_use_ReLU", "gnn_use_ReLU")


def warm_start_arch_flags(model_dir: str) -> dict:
    """Activation flags recorded by the warm-start source's config.yaml.

    Accepts the same dir layouts as ``warm_start_params``: a run/models dir
    or checked-in weight dir (config.yaml beside latest.json / ckpt_*), a
    direct ckpt_<N> dir (config.yaml in the parent), or a reference torch
    dir (wandb-format config.yaml beside actor.pt).  Returns {flag: bool}
    for each of ``_ARCH_ACT_FLAGS`` the yaml records; {} if no config.yaml
    exists.
    """
    cands = [model_dir, os.path.join(model_dir, "models")]
    base = os.path.basename(os.path.normpath(model_dir))
    if base.startswith("ckpt_"):
        cands.append(os.path.dirname(os.path.normpath(model_dir)))
    for d in cands:
        if os.path.exists(os.path.join(d, "config.yaml")):
            rec = load_run_config(d)
            out = {}
            for k in _ARCH_ACT_FLAGS:
                if k in rec and rec[k] is not None:
                    v = rec[k]
                    if isinstance(v, str):
                        v = v.strip().lower() in ("1", "true", "yes", "y", "t")
                    out[k] = bool(v)
            return out
    return {}


# (old_obs_dim, new_obs_dim) -> (insert position, count) in the obs vector.
_OBS_LAYOUT_INSERTS = {(13, 15): (12, 2)}


def _obs_index_map(old_dim: int, new_dim: int) -> list[int]:
    """new-row index -> old-row index, -1 for rows that did not exist."""
    if old_dim == new_dim:
        return list(range(old_dim))
    at, n = _OBS_LAYOUT_INSERTS[(old_dim, new_dim)]
    return list(range(at)) + [-1] * n + list(range(at, old_dim))


def _remap_rows(old: np.ndarray, index_map: list[int], fill: float) -> np.ndarray:
    """Reindex the leading axis of a kernel/scale/bias by ``index_map``;
    rows mapped from -1 are filled with ``fill``."""
    idx = np.asarray(index_map)
    out = old[np.clip(idx, 0, old.shape[0] - 1)].copy()
    out[idx < 0] = fill
    return out


def _resolve_ckpt_path(model_dir: str) -> str:
    """Accept a run dir with latest.json, a direct ckpt_<N> dir, or a dir
    containing ckpt_<N> subdirs (the checked-in weight layout)."""
    latest = os.path.join(model_dir, "latest.json")
    if os.path.exists(latest):
        with open(latest) as f:
            return json.load(f)["path"]
    base = os.path.basename(os.path.normpath(model_dir))
    if base.startswith("ckpt_"):
        return os.path.abspath(model_dir)
    cands = sorted(
        (d for d in os.listdir(model_dir) if d.startswith("ckpt_")),
        key=lambda d: int(d.split("_")[1]),
    )
    if not cands:
        raise FileNotFoundError(f"no checkpoint under {model_dir}")
    return os.path.abspath(os.path.join(model_dir, cands[-1]))


def warm_start_params(model_dir: str, ts_new, new_obs_dim: int, cfg=None):
    """Params-only warm start (reference base_runner.py:179 semantics).

    Returns ``ts_new`` with actor/critic params and the value-normalizer
    stats taken from the checkpoint at ``model_dir``; optimizer states are
    left as freshly initialized and the episode counter is NOT restored.
    When the checkpointed actor consumed a narrower observation than
    ``ts_new``'s, its obs-consuming leaves (input LayerNorm + first dense
    kernel of the post-GNN MLP, actor_critic.py ``post_gnn``) are row-
    remapped per ``_OBS_LAYOUT_INSERTS``.

    ``model_dir`` may be one of our orbax run/ckpt dirs OR a reference-style
    torch checkpoint dir (``actor.pt``/``critic.pt`` — what the reference's
    own ``model_dir`` restore consumed); the latter needs ``cfg`` (the
    ModelConfig) for the torch import.
    """
    if os.path.exists(os.path.join(model_dir, "actor.pt")):
        if cfg is None:
            raise ValueError(
                "warm start from a torch actor.pt/critic.pt dir needs cfg")
        pp = restore_reference_policy(model_dir, cfg, ts_new.params)
        raw = {"params": {"actor": jax.tree.map(np.asarray, dict(pp.actor)),
                          "critic": jax.tree.map(np.asarray, dict(pp.critic))},
               "vn": None}
    else:
        import orbax.checkpoint as ocp

        path = _resolve_ckpt_path(model_dir)
        with ocp.StandardCheckpointer() as ckptr:
            # Restore to HOST numpy arrays explicitly.  A bare restore(path)
            # (no target) materializes jax.Arrays on the default device; on
            # the axon TPU backend that device-put path hangs indefinitely
            # (observed 2026-08-19: 30+ min stuck in orbax threads on a
            # <1 MB checkpoint).  The tree shapes differ from ts_new's when
            # the obs layout is remapped below, so the target comes from the
            # checkpoint's own metadata, not from ts_new.
            meta = ckptr.metadata(path).item_metadata
            target = jax.tree.map(
                lambda m: np.zeros(m.shape, m.dtype)
                if hasattr(m, "shape") and m.shape is not None else m,
                meta)
            raw = ckptr.restore(path, target)

    old_actor, new_actor = raw["params"]["actor"], dict(ts_new.params.actor)
    old_in = old_actor["base"]["mlp"]["fc0"]["kernel"].shape[0]
    new_in = new_actor["base"]["mlp"]["fc0"]["kernel"].shape[0]
    if old_in != new_in:
        nbd_dim = new_in - new_obs_dim  # GNN aggregate rows, appended after obs
        old_obs = old_in - nbd_dim
        omap = _obs_index_map(old_obs, new_obs_dim)
        full = omap + list(range(old_obs, old_in))
        base = jax.tree.map(np.asarray, dict(old_actor["base"]))
        fn = dict(base["feature_norm"])
        fn["scale"] = _remap_rows(fn["scale"], full, 1.0)
        fn["bias"] = _remap_rows(fn["bias"], full, 0.0)
        mlp = dict(base["mlp"])
        fc0 = dict(mlp["fc0"])
        fc0["kernel"] = _remap_rows(fc0["kernel"], full, 0.0)
        mlp["fc0"] = fc0
        base["feature_norm"], base["mlp"] = fn, mlp
        old_actor = {**old_actor, "base": base}

    from flax import serialization

    def adopt(template, state):
        # match by field/key name (raw restore yields plain dicts), then pin
        # each leaf to the template's dtype
        restored = serialization.from_state_dict(template, state)
        return jax.tree.map(
            lambda t, r: np.asarray(r, dtype=np.asarray(t).dtype), template, restored
        )

    params = ts_new.params.replace(
        actor=adopt(ts_new.params.actor, old_actor),
        critic=adopt(ts_new.params.critic, raw["params"]["critic"]),
    )
    ts = ts_new.replace(params=params)
    if raw.get("vn") is not None and ts_new.vn is not None:
        try:
            ts = ts.replace(vn=adopt(ts_new.vn, raw["vn"]))
        except ValueError:
            # PopArt vs ValueNorm mismatch between the runs: the reference's
            # restore is weights-only anyway, so keep the fresh normalizer
            print("warm start: value-norm type differs from checkpoint; "
                  "keeping freshly initialized normalizer")
    return ts
