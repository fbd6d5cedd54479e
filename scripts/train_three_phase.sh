#!/bin/bash
# The reference's phase-scenario training recipes, reproduced end to end.
#
# three_phase (default): the reference's checked-in three_phase run was
# warm-started from a rot_inv-family checkpoint (three_phase/config.yaml:
# model_dir model_weights/tube/rot_inv/airtaxi/try/three) with the same
# hparams as the rot_inv recipe except collision_rew 20 and 4M steps.  Here
# the warm start comes from OUR from-scratch rot_inv checkpoint
# (model_weights/rot_inv/airtaxi), with the 13->15-dim obs remap
# (utils/checkpoint.py warm_start_params).
#
# two_phase: SCENARIO=old_two_graph WARM= ./scripts/train_three_phase.sh
# reproduces the two_phase_only recipe (its config.yaml: model_dir None —
# from scratch, same hparams, 4M steps).
#
# NB: --use_ReLU / --use_valuenorm / --use_wandb are the reference's
# store_false idioms (passing them turns the feature OFF).
set -e
cd "$(dirname "$0")/.."
SCENARIO="${SCENARIO:-three_phase_graph}"
WARM="${WARM-model_weights/rot_inv/airtaxi}"
EXP="${EXP:-ref_recipe_${SCENARIO}}"
WARM_ARGS=()
if [ -n "$WARM" ]; then WARM_ARGS=(--warm_start_dir "$WARM"); EXP="${EXP}_warm"; fi
exec python -u -m contracts_marl_aam_corridors_tpu.cli.train \
  --scenario_name "$SCENARIO" --dynamics_type air_taxi --seed "${SEED:-0}" \
  --num_agents=3 --num_landmarks=3 --episode_length 75 --n_rollout_threads 64 \
  --total_actions 9 --use_ReLU --use_popart --use_valuenorm \
  --collision_rew 20 --goal_rew 20 --formation_rew 5 --fair_rew 5 --fair_wt 1 \
  --zeroshift 10 --world_size=4 --num_env_steps 4000000 \
  --ppo_epoch 10 --num_mini_batch 1 --auto_mini_batch_size --target_mini_batch_size 8192 \
  --lr 7e-4 --critic_lr 7e-4 --gain 0.01 --entropy_coef 0.01 --data_chunk_length 10 \
  --use_eval --eval_interval 25 --eval_episodes 32 --save_interval 25 --log_interval 5 \
  --compute_dtype float32 \
  "${WARM_ARGS[@]}" \
  --experiment_name "$EXP" --use_wandb "$@"
