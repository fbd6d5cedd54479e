"""July head-to-head: our checkpoint from the reference's own july pipeline
(metered_formation_rotate.sh: warm-start from FA_FR/metered, unicycle,
ep150, 15M steps) vs `old_FA_FR/tube/jul/rots` — produced by an earlier run
of the same pipeline (same scenario and `model_dir:
model_weights/FA_FR/metered`; trained at ep120/10M per its config.yaml,
where the checked-in script now says ep150/15M).  Same batched deterministic
harness (4 x 256 episodes), each side's model built with the activation
flags its own config.yaml records (scripts/_eval_common.py).

The reference side is evaluated twice: at the recipe config (ep150, the
eval our side trained at) and at its own trained ep_len 120 — legacy-era
artifacts predate current upstream semantics (see
eval_scripts/commands_test_run.md), so we give it its best shot.

Run (TPU or CPU): python scripts/july_eval.py [CKPT_DIR]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN = ("/root/repo/results/GraphMPE/nav_metered_one_goal_graph_rotate_tube_july/"
       "rmappo/ref_pipeline_july_warm_metered/seed0/models")
REF = "/root/reference/model_weights/old_FA_FR/tube/jul/rots"

# metered_formation_rotate.sh, unicycle branch (ep150, world 4)
def recipe(ep_len):
    return [
        "--scenario_name", "nav_metered_one_goal_graph_rotate_tube_july",
        "--dynamics_type", "unicycle_vehicle", "--seed", "0",
        "--num_agents=3", "--num_landmarks=3", "--episode_length", str(ep_len),
        "--n_rollout_threads", "64", "--total_actions", "9",
        "--use_ReLU", "--use_popart", "--use_valuenorm",
        "--collision_rew", "30", "--goal_rew", "20", "--formation_rew", "5",
        "--fair_rew", "5", "--fair_wt", "1", "--zeroshift", "10",
        "--world_size=4", "--compute_dtype", "float32",
    ]


def main(run=RUN, n_eval=256):
    from contracts_marl_aam_corridors_tpu.utils.checkpoint import (
        restore_checkpoint,
        restore_reference_policy,
    )
    from _eval_common import build_for, run_side

    pol_o, ts_o, eval_o = build_for(recipe(150), run, n_eval)
    ts_ours, ep = restore_checkpoint(run, ts_o)
    print(f"ours: episode {ep} from {run}")
    run_side("ours(ref-july-pipeline, ep150)", ts_ours, eval_o)
    for ep_len in (150, 120):
        pol_r, ts_r, eval_r = build_for(recipe(ep_len), REF, n_eval)
        t_ref = ts_r.replace(
            params=restore_reference_policy(REF, pol_r.cfg, ts_r.params))
        run_side(f"reference jul/rots (ep{ep_len})", t_ref, eval_r)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or [RUN]))
