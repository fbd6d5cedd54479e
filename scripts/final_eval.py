"""Final eval: from-scratch checkpoint vs reference-trained weights, same
batched deterministic harness (256 episodes)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

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
    from contracts_marl_aam_corridors_tpu.utils.checkpoint import (
        restore_checkpoint,
        restore_reference_policy,
    )
    from _eval_common import build_for

    # each side's model uses the activation flags its config.yaml records
    pol_o, ts_o, eval_o = build_for(RECIPE, RUN, n_eval)
    pol_r, ts_r, eval_r = build_for(RECIPE, REF, n_eval)
    ts_ours, ep = restore_checkpoint(RUN, ts_o)
    for name, t, eval_fn in [
        ("ours-from-scratch", ts_ours, eval_o),
        ("reference-trained", ts_r.replace(
            params=restore_reference_policy(REF, pol_r.cfg, ts_r.params)), eval_r),
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
