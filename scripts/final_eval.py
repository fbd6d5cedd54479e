"""Final eval: from-scratch checkpoint vs reference-trained weights, same
batched deterministic harness (256 episodes)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

from contracts_marl_aam_corridors_tpu.cli.train import build
from contracts_marl_aam_corridors_tpu.config.flags import parse_all

RUN = "/root/repo/results/GraphMPE/nav_graph_metered_single_corridor_rot_inv/rmappo/ref_recipe_rot_inv/seed0/models"
REF = "/root/reference/model_weights/tube/rot_inv/airtaxi"

RECIPE = [
    "--scenario_name", "nav_graph_metered_single_corridor_rot_inv",
    "--dynamics_type", "air_taxi", "--seed", "0",
    "--num_agents=3", "--num_landmarks=3", "--episode_length", "75",
    "--n_rollout_threads", "64", "--total_actions", "9",
    "--use_ReLU", "--use_popart", "--use_valuenorm",
    "--collision_rew", "30", "--goal_rew", "20", "--formation_rew", "5",
    "--fair_rew", "5", "--world_size=4", "--compute_dtype", "float32",
]


def main(n_eval=256):
    args = parse_all(RECIPE)
    env_params, policy, trainer, runner = build(args)
    ts = trainer.init_state(jax.random.PRNGKey(1))
    eval_fn = jax.jit(lambda t, k: runner.eval_episode(t, k, n_eval))

    from contracts_marl_aam_corridors_tpu.utils.checkpoint import (
        restore_checkpoint,
        restore_reference_policy,
    )

    ts_ours, ep = restore_checkpoint(RUN, ts)
    for name, t in [
        ("ours-from-scratch", ts_ours),
        ("reference-trained", ts.replace(
            params=restore_reference_policy(REF, policy.cfg, ts.params))),
    ]:
        agg = {}
        for s in range(4):  # 4 x n_eval episodes
            out = {k: float(np.asarray(v))
                   for k, v in eval_fn(t, jax.random.PRNGKey(100 + s)).items()}
            for k, v in out.items():
                agg.setdefault(k, []).append(v)
        print(f"[{name}] " + " ".join(
            f"{k.replace('eval_', '')}={np.mean(v):.4f}" for k, v in agg.items()))


if __name__ == "__main__":
    main()
