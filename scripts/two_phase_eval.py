"""Two-phase from-scratch eval: our checkpoint (reference two_phase_only
recipe, trained from scratch by ``SCENARIO=old_two_graph WARM= \
scripts/train_three_phase.sh``) vs the reference's checked-in two_phase_only
weights, same batched deterministic harness.

Gate success (agent froze at the exit transition before the time limit) is
the meaningful criterion for two_phase — dist-to-goal success reads 0 by
design because successful episodes end frozen at the gate, not on a landmark
(see BENCH_NOTES "Gate-success metric").  Runs the comparison at the trained
config (3 agents, ep_len 75, world 4) and at the reference's eval
generalization config (5 agents, ep_len 100, world 3 —
eval_scripts/commands_test_run.md).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN = ("/root/repo/results/GraphMPE/old_two_graph/rmappo/"
       "ref_recipe_old_two_graph/seed0/models")
REF = "/root/reference/model_weights/tube/rot_inv/airtaxi/two_phase_only"

CONFIGS = {
    "trained(3ag/ep75/w4)": ["--num_agents=3", "--num_landmarks=3",
                             "--episode_length", "75", "--world_size=4"],
    "general(5ag/ep100/w3)": ["--num_agents=5", "--num_landmarks=5",
                              "--episode_length", "100", "--world_size=3"],
}
BASE = [
    "--scenario_name", "old_two_graph",
    "--dynamics_type", "air_taxi", "--seed", "0",
    "--n_rollout_threads", "64", "--total_actions", "9",
    "--use_ReLU", "--use_popart", "--use_valuenorm",
    "--collision_rew", "20", "--goal_rew", "20", "--formation_rew", "5",
    "--fair_rew", "5", "--compute_dtype", "float32",
]


def main(n_eval=256, run=RUN, ref=REF):
    from contracts_marl_aam_corridors_tpu.utils.checkpoint import (
        restore_checkpoint,
        restore_reference_policy,
    )

    from _eval_common import build_for, run_side

    for cname, extra in CONFIGS.items():
        # each side's model uses the activation flags its config.yaml records
        pol_o, ts_o, eval_o = build_for(BASE + extra, run, n_eval)
        pol_r, ts_r, eval_r = build_for(BASE + extra, ref, n_eval)
        ts_ours, ep = restore_checkpoint(run, ts_o)
        print(f"== {cname} == (ours: episode {ep} from {run})")
        run_side("ours-from-scratch", ts_ours, eval_o)
        run_side("reference-trained", ts_r.replace(
            params=restore_reference_policy(ref, pol_r.cfg, ts_r.params)), eval_r)


if __name__ == "__main__":
    main(run=sys.argv[1] if len(sys.argv) > 1 else RUN,
         ref=sys.argv[2] if len(sys.argv) > 2 else REF)
