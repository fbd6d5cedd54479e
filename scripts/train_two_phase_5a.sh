#!/bin/bash
# Close the two_phase generalization gap (VERDICT r2 #3): fine-tune our
# rot_inv checkpoint DIRECTLY AT the reference's 5-agent eval config
# (5 agents / ep_len 100 / world 3 — eval_scripts/commands_test_run.md,
# reference eval_scripts/commands_test_run.txt:1-24).  Gate success is the
# criterion (two_phase episodes end frozen at the exit gate by design).
#
# Warm start auto-adopts the source checkpoint's activation flags
# (cli/train.py + utils/checkpoint.py warm_start_arch_flags) — do not pass
# gnn/embed activation flags here.
set -e
cd "$(dirname "$0")/.."
WARM="${WARM-model_weights/rot_inv/airtaxi}"
EXP="${EXP:-two_phase_5a_ft}"
WARM_ARGS=()
if [ -n "$WARM" ]; then WARM_ARGS=(--warm_start_dir "$WARM"); EXP="${EXP}_warm"; fi
exec python -u -m contracts_marl_aam_corridors_tpu.cli.train \
  --scenario_name two_phase_graph --dynamics_type air_taxi --seed "${SEED:-0}" \
  --num_agents=5 --num_landmarks=5 --episode_length 100 --n_rollout_threads 64 \
  --total_actions 9 --use_ReLU --use_popart --use_valuenorm \
  --collision_rew 20 --goal_rew 20 --formation_rew 5 --fair_rew 5 --fair_wt 1 \
  --zeroshift 10 --world_size=3 --num_env_steps "${STEPS:-2000000}" \
  --ppo_epoch 10 --num_mini_batch 1 --auto_mini_batch_size --target_mini_batch_size 8192 \
  --lr 7e-4 --critic_lr 7e-4 --gain 0.01 --entropy_coef 0.01 --data_chunk_length 10 \
  --use_eval --eval_interval 10 --eval_episodes 64 --save_interval 10 --log_interval 5 \
  --compute_dtype float32 \
  "${WARM_ARGS[@]}" \
  --experiment_name "$EXP" --use_wandb "$@"
