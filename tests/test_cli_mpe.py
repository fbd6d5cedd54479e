"""CLI round-trip for the classic-MPE path: train a tiny run (checkpoint
saved), then evaluate it back with GIF rendering — the reference's
train_mpe.py -> eval_mpe.py workflow for env_name MPE."""
import os

import numpy as np


def test_mpe_train_then_eval_roundtrip(tmp_path):
    from contracts_marl_aam_corridors_tpu.cli.eval import main as eval_main
    from contracts_marl_aam_corridors_tpu.cli.train import main as train_main

    run_dir = str(tmp_path / "runs")
    argv = [
        "--env_name", "MPE", "--scenario_name", "simple_spread",
        "--num_agents", "3", "--num_landmarks", "3",
        "--episode_length", "10", "--n_rollout_threads", "8",
        "--num_env_steps", "240", "--ppo_epoch", "2",
        "--run_dir", run_dir, "--seed", "7",
    ]
    out = train_main(argv)
    model_dir = os.path.join(out, "models")
    assert os.path.exists(os.path.join(model_dir, "latest.json"))

    rows = eval_main(argv + [
        "--model_dir", model_dir, "--render_episodes", "2",
        "--use_render", "--save_gifs",
    ])
    assert len(rows) == 2
    assert all(np.isfinite(r["ep_rew"]) for r in rows)
    gifs = os.path.join(run_dir, "gifs")
    assert os.path.exists(os.path.join(gifs, "mpe_episode_0.gif"))


def test_mpe_train_separated_cli(tmp_path):
    """--share_policy (store_false idiom) routes to the separated runner."""
    from contracts_marl_aam_corridors_tpu.cli.train import main as train_main

    from contracts_marl_aam_corridors_tpu.cli.eval import main as eval_main

    out = train_main([
        "--env_name", "MPE", "--scenario_name", "simple_tag",
        "--episode_length", "10", "--n_rollout_threads", "8",
        "--num_env_steps", "160", "--ppo_epoch", "2",
        "--run_dir", str(tmp_path / "runs"), "--seed", "3",
        "--share_policy",
    ])
    model_dir = os.path.join(out, "models")
    assert os.path.exists(os.path.join(model_dir, "latest.json"))

    # separated eval: share_policy=False comes back via the config.yaml merge
    rows = eval_main([
        "--env_name", "MPE", "--scenario_name", "simple_tag",
        "--episode_length", "10", "--model_dir", model_dir,
        "--render_episodes", "1", "--run_dir", str(tmp_path / "runs"),
        "--seed", "3",
    ])
    assert np.isfinite(rows[0]["ep_rew"])
