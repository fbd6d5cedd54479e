"""Three-phase transfer eval: our warm-started from-scratch checkpoint vs the
reference's checked-in three_phase weights
(/root/reference/model_weights/tube/rot_inv/airtaxi/three_phase), same batched
deterministic harness (4 x 256 episodes).  Companion to final_eval.py (the
rot_inv headline eval)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN = ("/root/repo/results/GraphMPE/three_phase_graph/rmappo/"
       "ref_recipe_three_phase_graph_warm/seed0/models")
REF = "/root/reference/model_weights/tube/rot_inv/airtaxi/three_phase"

# the reference three_phase config.yaml recipe (collision_rew 20, 4M steps)
RECIPE = [
    "--scenario_name", "three_phase_graph",
    "--dynamics_type", "air_taxi", "--seed", "0",
    "--num_agents=3", "--num_landmarks=3", "--episode_length", "75",
    "--n_rollout_threads", "64", "--total_actions", "9",
    "--use_ReLU", "--use_popart", "--use_valuenorm",
    "--collision_rew", "20", "--goal_rew", "20", "--formation_rew", "5",
    "--fair_rew", "5", "--world_size=4", "--compute_dtype", "float32",
]


def main(n_eval=256, run=RUN, ref=REF):
    from contracts_marl_aam_corridors_tpu.utils.checkpoint import (
        restore_checkpoint,
        restore_reference_policy,
    )
    from _eval_common import build_for, run_side

    # each side's model uses the activation flags its config.yaml records
    pol_o, ts_o, eval_o = build_for(RECIPE, run, n_eval)
    pol_r, ts_r, eval_r = build_for(RECIPE, ref, n_eval)
    ts_ours, ep = restore_checkpoint(run, ts_o)
    print(f"ours: episode {ep} from {run}")
    run_side("ours-warm-started-from-our-rot_inv", ts_ours, eval_o)
    run_side("reference-trained", ts_r.replace(
        params=restore_reference_policy(ref, pol_r.cfg, ts_r.params)), eval_r)


if __name__ == "__main__":
    main(run=sys.argv[1] if len(sys.argv) > 1 else RUN,
         ref=sys.argv[2] if len(sys.argv) > 2 else REF)
