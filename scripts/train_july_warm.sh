#!/bin/bash
# The reference's ONLY july training recipe, reproduced end to end and
# extended (VERDICT r4 item 6: push the primary workload to success-grade).
#
# Recipe = metered_formation_rotate.sh's unicycle branch (:49-109): warm
# start from model_weights/FA_FR/metered (shipped as old_FA_FR/metered),
# ep_len 150, world 4, 128 envs, collision_rew 30, goal_rew 20,
# formation_rew 5, fair_rew 5, zeroshift 10, total_actions 9, ppo_epoch 10,
# lr 7e-4, PopArt, Tanh MLPs (--use_ReLU store_false idiom), auto-minibatch
# target 8192.  Upstream runs it for 15M steps; STEPS extends it (the
# round-4 15M re-run reached eval success ~0.54 and was still improving).
#
# NB: --use_ReLU / --use_valuenorm / --use_wandb are the reference's
# store_false idioms (passing them turns the feature OFF).
set -e
cd "$(dirname "$0")/.."
EXP="${EXP:-ref_pipeline_july_warm_metered}"
WARM="${WARM:-/root/reference/model_weights/old_FA_FR/metered}"
exec python -u -m contracts_marl_aam_corridors_tpu.cli.train \
  --scenario_name nav_metered_one_goal_graph_rotate_tube_july \
  --dynamics_type unicycle_vehicle --seed "${SEED:-0}" \
  --num_agents=3 --num_landmarks=3 --episode_length 150 --n_rollout_threads 128 \
  --total_actions 9 --use_ReLU --use_popart --use_valuenorm \
  --collision_rew 30 --goal_rew 20 --formation_rew 5 --fair_rew 5 --fair_wt 1 \
  --zeroshift 10 --world_size=4 --num_env_steps "${STEPS:-30000000}" \
  --ppo_epoch 10 --num_mini_batch 1 --auto_mini_batch_size --target_mini_batch_size 8192 \
  --lr 7e-4 --critic_lr 7e-4 --gain 0.01 --entropy_coef 0.01 --data_chunk_length 10 \
  --use_eval --eval_interval 25 --eval_episodes 32 --save_interval 25 --log_interval 5 \
  --compute_dtype float32 \
  --warm_start_dir "$WARM" \
  --experiment_name "$EXP" --use_wandb "$@"
