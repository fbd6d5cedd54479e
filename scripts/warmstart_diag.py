"""Diagnostic: warm-start from the reference's trained rot_inv checkpoint and
check (1) our eval reports its known ~100% success, (2) continued training
with the reference recipe does not destroy the policy (VERDICT r1 item 1b).

Run: JAX_PLATFORMS=cpu python scripts/warmstart_diag.py [n_episodes]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import yaml

from contracts_marl_aam_corridors_tpu.cli.train import build
from contracts_marl_aam_corridors_tpu.config.flags import parse_all

MODEL_DIR = "/root/reference/model_weights/tube/rot_inv/airtaxi"

RECIPE = [
    "--scenario_name", "nav_graph_metered_single_corridor_rot_inv",
    "--dynamics_type", "air_taxi", "--seed", "0",
    "--num_agents=3", "--num_landmarks=3",
    "--episode_length", "75", "--n_rollout_threads", "64",
    "--ppo_epoch", "10", "--num_mini_batch", "1",
    "--auto_mini_batch_size", "--target_mini_batch_size", "8192",
    "--lr", "7e-4", "--critic_lr", "7e-4", "--gain", "0.01",
    "--use_ReLU", "--use_popart", "--use_valuenorm",
    "--use_cent_obs", "False", "--use_dones", "False", "--collaborative", "False",
    "--collision_rew", "30", "--goal_rew", "20", "--formation_rew", "5",
    "--fair_rew", "5", "--fair_wt", "1", "--zeroshift", "10",
    "--num_walls", "0", "--world_size=4", "--graph_feat_type", "relative",
    "--total_actions", "9", "--max_speed", "2",
    "--compute_dtype", "float32",
]


def main(episodes=20):
    args = parse_all(RECIPE)
    env_params, policy, trainer, runner = build(args)
    key = jax.random.PRNGKey(0)
    ts = trainer.init_state(jax.random.PRNGKey(1))

    from contracts_marl_aam_corridors_tpu.utils.checkpoint import (
        restore_reference_policy,
    )
    params = restore_reference_policy(MODEL_DIR, policy.cfg, ts.params)
    ts = ts.replace(params=params)

    eval_fn = jax.jit(lambda t, k: runner.eval_episode(t, k, 32))
    e0 = {k: float(v) for k, v in eval_fn(ts, jax.random.PRNGKey(42)).items()}
    print(f"[warm-start eval] success {e0['eval_success_rate']:.3f} "
          f"rew {e0['eval_average_episode_rewards']:.1f} "
          f"collisions {e0['eval_num_agent_collisions']:.2f}", flush=True)

    carry = runner.init_carry(jax.random.PRNGKey(2))
    step_fn = jax.jit(runner.train_episode)
    for ep in range(episodes):
        key, ekey = jax.random.split(key)
        ts, carry, ti, _ = step_fn(ts, carry, ekey)
        if ep % 5 == 0 or ep == episodes - 1:
            key, evk = jax.random.split(key)
            e = {k: float(v) for k, v in eval_fn(ts, evk).items()}
            print(f"[ep {ep}] train_rew {float(ti['average_episode_rewards']):.1f} "
                  f"ratio {float(ti['ratio']):.3f} "
                  f"eval_success {e['eval_success_rate']:.3f} "
                  f"eval_rew {e['eval_average_episode_rewards']:.1f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
