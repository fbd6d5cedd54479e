"""Params-only warm start (reference base_runner.py:179 restore semantics)
including the rot_inv(13-dim obs) -> two/three_phase(15-dim) input remap
(utils/checkpoint.py warm_start_params).  Uses the checked-in from-scratch
rot_inv checkpoint as the source."""
import os

import jax
import numpy as np
import pytest

from contracts_marl_aam_corridors_tpu.cli.train import build
from contracts_marl_aam_corridors_tpu.config.flags import parse_all
from contracts_marl_aam_corridors_tpu.utils.checkpoint import (
    _obs_index_map,
    _remap_rows,
    _resolve_ckpt_path,
    warm_start_arch_flags,
    warm_start_params,
)

CKPT = os.path.join(os.path.dirname(__file__), "..", "model_weights", "rot_inv", "airtaxi")


def _recipe(scenario, extra=()):
    return parse_all([
        "--scenario_name", scenario, "--dynamics_type", "air_taxi",
        "--seed", "0", "--num_agents=3", "--num_landmarks=3",
        "--episode_length", "10", "--n_rollout_threads", "4",
        "--total_actions", "9", "--use_ReLU", "--use_popart", "--use_valuenorm",
        "--collision_rew", "20", "--goal_rew", "20", "--formation_rew", "5",
        "--fair_rew", "5", "--world_size=4", "--compute_dtype", "float32",
        *extra,
    ])


def test_obs_index_map():
    assert _obs_index_map(13, 13) == list(range(13))
    # rot_inv -> phase family: heading-alignment pair inserted at 12-13,
    # phase slot moves 12 -> 14 (corridor.py obs builder)
    assert _obs_index_map(13, 15) == list(range(12)) + [-1, -1, 12]


def test_remap_rows_kernel_and_norm():
    old = np.arange(6.0).reshape(3, 2)
    out = _remap_rows(old, [0, -1, 1, 2], 0.0)
    assert out.shape == (4, 2)
    assert np.allclose(out[0], old[0]) and np.allclose(out[1], 0.0)
    assert np.allclose(out[2:], old[1:])
    scale = _remap_rows(np.array([2.0, 3.0]), [-1, 0, 1], 1.0)
    assert np.allclose(scale, [1.0, 2.0, 3.0])


def test_resolve_ckpt_path_layouts(tmp_path):
    # direct ckpt dir
    d = tmp_path / "ckpt_7"
    d.mkdir()
    assert _resolve_ckpt_path(str(d)).endswith("ckpt_7")
    # containing dir picks the highest episode
    (tmp_path / "ckpt_12").mkdir()
    assert _resolve_ckpt_path(str(tmp_path)).endswith("ckpt_12")
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        _resolve_ckpt_path(str(empty))  # no latest.json and no ckpt_* inside


def test_warm_start_arch_flags_layouts(tmp_path):
    import yaml

    # our flat layout: config.yaml directly in the dir
    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "config.yaml").write_text(yaml.safe_dump(
        {"use_ReLU": False, "embed_use_ReLU": False, "gnn_use_ReLU": False}))
    assert warm_start_arch_flags(str(flat)) == {
        "use_ReLU": False, "embed_use_ReLU": False, "gnn_use_ReLU": False}

    # run dir layout: config.yaml under models/
    run = tmp_path / "run"
    (run / "models").mkdir(parents=True)
    (run / "models" / "config.yaml").write_text(yaml.safe_dump(
        {"use_ReLU": True, "gnn_use_ReLU": False}))
    assert warm_start_arch_flags(str(run)) == {
        "use_ReLU": True, "gnn_use_ReLU": False}

    # direct ckpt_<N> dir: config.yaml in the parent
    ck = run / "models" / "ckpt_3"
    ck.mkdir()
    assert warm_start_arch_flags(str(ck)) == {
        "use_ReLU": True, "gnn_use_ReLU": False}

    # reference wandb export format ({key: {value: v}}, possibly strings)
    ref = tmp_path / "ref"
    ref.mkdir()
    (ref / "config.yaml").write_text(yaml.safe_dump({
        "use_ReLU": {"desc": None, "value": "False"},
        "embed_use_ReLU": {"desc": None, "value": True},
        "gnn_use_ReLU": {"desc": None, "value": "True"},
    }))
    assert warm_start_arch_flags(str(ref)) == {
        "use_ReLU": False, "embed_use_ReLU": True, "gnn_use_ReLU": True}

    # no config.yaml at all -> {}
    bare = tmp_path / "bare"
    bare.mkdir()
    assert warm_start_arch_flags(str(bare)) == {}


@pytest.mark.skipif(not os.path.isdir(CKPT), reason="checked-in ckpt absent")
def test_warm_start_arch_flags_checked_in_ckpt():
    # the checked-in rot_inv run trained with a tanh GNN under the pre-split
    # single flag; its rewritten config.yaml must keep saying so (CLAUDE.md)
    assert warm_start_arch_flags(CKPT) == {
        "use_ReLU": False, "embed_use_ReLU": False, "gnn_use_ReLU": False}


@pytest.mark.skipif(not os.path.isdir(CKPT), reason="checked-in ckpt absent")
def test_warm_start_cross_scenario_remap():
    args = _recipe("three_phase_graph")
    env_params, policy, trainer, runner = build(args)
    assert env_params.obs_dim == 15
    ts = trainer.init_state(jax.random.PRNGKey(0))
    ts2 = warm_start_params(CKPT, ts, env_params.obs_dim)

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as c:
        raw = c.restore(_resolve_ckpt_path(CKPT))
    k_old = np.asarray(raw["params"]["actor"]["base"]["mlp"]["fc0"]["kernel"])
    k_new = np.asarray(ts2.params.actor["base"]["mlp"]["fc0"]["kernel"])
    assert k_new.shape[0] == k_old.shape[0] + 2
    # obs rows 0-11 kept, new heading-alignment rows zero (ignored at step
    # 0), phase row moved 12 -> 14, GNN-aggregate rows shifted by 2
    assert np.allclose(k_new[:12], k_old[:12])
    assert np.allclose(k_new[12:14], 0.0)
    assert np.allclose(k_new[14], k_old[12])
    assert np.allclose(k_new[15:], k_old[13:])
    fn_new = ts2.params.actor["base"]["feature_norm"]
    assert np.allclose(np.asarray(fn_new["scale"])[12:14], 1.0)
    assert np.allclose(np.asarray(fn_new["bias"])[12:14], 0.0)
    # critic consumes only the GNN aggregate (use_cent_obs False) -> exact
    critic_diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        dict(ts2.params.critic), jax.tree.map(np.asarray, raw["params"]["critic"]),
    )
    assert max(jax.tree.leaves(critic_diff)) == 0.0
    # PopArt stats carried over (reference keeps them inside critic.pt)
    assert float(np.asarray(ts2.vn.mean).ravel()[0]) == pytest.approx(
        float(np.asarray(raw["vn"]["mean"]).ravel()[0])
    )
    # optimizers stay fresh: adam moments all-zero
    mu_leaves = [np.asarray(x) for x in jax.tree.leaves(ts2.actor_opt)]
    assert all(np.allclose(m, 0.0) for m in mu_leaves if m.dtype.kind == "f" and m.ndim > 0)


@pytest.mark.skipif(not os.path.isdir(CKPT), reason="checked-in ckpt absent")
def test_warm_start_vn_type_mismatch_keeps_fresh(capsys):
    # checkpoint holds PopArt stats; a run with PopArt off templates a
    # ValueNormState -> params still transfer, normalizer stays fresh
    args = _recipe("three_phase_graph")
    args.use_popart = False
    args.use_valuenorm = True  # _recipe's --use_valuenorm is store_false
    env_params, policy, trainer, runner = build(args)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    assert ts.vn is not None
    ts2 = warm_start_params(CKPT, ts, env_params.obs_dim)
    assert "value-norm type differs" in capsys.readouterr().out
    assert type(ts2.vn) is type(ts.vn)
    assert float(np.asarray(ts2.vn.running_mean).ravel()[0]) == 0.0  # fresh
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as c:
        raw = c.restore(_resolve_ckpt_path(CKPT))
    k_old = np.asarray(raw["params"]["actor"]["base"]["mlp"]["fc0"]["kernel"])
    k_new = np.asarray(ts2.params.actor["base"]["mlp"]["fc0"]["kernel"])
    assert np.allclose(k_new[:12], k_old[:12])  # params did transfer
    assert np.allclose(k_new[12:14], 0.0)


@pytest.mark.skipif(not os.path.isdir(CKPT), reason="checked-in ckpt absent")
def test_warm_start_same_scenario_identity():
    args = _recipe("nav_graph_metered_single_corridor_rot_inv")
    env_params, policy, trainer, runner = build(args)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    ts2 = warm_start_params(CKPT, ts, env_params.obs_dim)
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as c:
        raw = c.restore(_resolve_ckpt_path(CKPT))
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)).max()),
        dict(ts2.params.actor), jax.tree.map(np.asarray, raw["params"]["actor"]),
    )
    assert max(jax.tree.leaves(diff)) == 0.0


REF_TORCH = "/root/reference/model_weights/tube/rot_inv/airtaxi"


@pytest.mark.skipif(not os.path.isdir(REF_TORCH), reason="reference weights absent")
def test_warm_start_from_reference_torch_dir():
    """--warm_start_dir also accepts the reference's actor.pt/critic.pt
    layout — exactly what the reference's own model_dir restore consumed."""
    from contracts_marl_aam_corridors_tpu.utils.checkpoint import (
        restore_reference_policy,
    )

    args = _recipe("nav_graph_metered_single_corridor_rot_inv")
    env_params, policy, trainer, runner = build(args)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    ts2 = warm_start_params(REF_TORCH, ts, env_params.obs_dim, cfg=policy.cfg)
    pp = restore_reference_policy(REF_TORCH, policy.cfg, ts.params)
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max()),
        dict(ts2.params.actor), jax.tree.map(np.asarray, dict(pp.actor)),
    )
    assert max(jax.tree.leaves(diff)) == 0.0
    # optimizers fresh
    mu = [np.asarray(x) for x in jax.tree.leaves(ts2.actor_opt)]
    assert all(np.allclose(m, 0.0) for m in mu if m.dtype.kind == "f" and m.ndim > 0)
    # missing cfg errors loudly
    with pytest.raises(ValueError):
        warm_start_params(REF_TORCH, ts, env_params.obs_dim)
