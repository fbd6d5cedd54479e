#!/bin/bash
# The reference's exact rot_inv from-scratch recipe (train-to-success parity
# run, BENCH_NOTES r2): model_weights/tube/rot_inv/airtaxi/config.yaml —
# 3 agents, ep_len 75, 64 envs, 5M steps, lr 7e-4, ppo_epoch 10,
# auto-minibatch->1, PopArt, Tanh MLPs (use_ReLU store_false), collision 30,
# goal 20, total_actions 9, world 4.
#
# Env overrides: SEED (default 0), STEPS (default 5M), EXP, and GNN_IMPL
# (auto|dense|transposed|pallas_fused) — used by the round-5 fused-path
# training-quality seed sweep (VERDICT r4 item 5).
#
# NB: --use_ReLU / --use_valuenorm / --use_wandb are the reference's
# store_false idioms (passing them turns the feature OFF).
set -e
cd "$(dirname "$0")/.."
EXP="${EXP:-ref_recipe_rot_inv_${GNN_IMPL:-auto}_s${SEED:-0}}"
exec python -u -m contracts_marl_aam_corridors_tpu.cli.train \
  --scenario_name nav_graph_metered_single_corridor_rot_inv \
  --dynamics_type air_taxi --seed "${SEED:-0}" \
  --num_agents=3 --num_landmarks=3 --episode_length 75 --n_rollout_threads 64 \
  --total_actions 9 --use_ReLU --use_popart --use_valuenorm \
  --collision_rew 30 --goal_rew 20 --formation_rew 5 --fair_rew 5 --fair_wt 1 \
  --zeroshift 10 --world_size=4 --num_env_steps "${STEPS:-5000000}" \
  --ppo_epoch 10 --num_mini_batch 1 --auto_mini_batch_size --target_mini_batch_size 8192 \
  --lr 7e-4 --critic_lr 7e-4 --gain 0.01 --entropy_coef 0.01 --data_chunk_length 10 \
  --use_eval --eval_interval 25 --eval_episodes 32 --save_interval 25 --log_interval 5 \
  --compute_dtype float32 --gnn_impl "${GNN_IMPL:-auto}" \
  --experiment_name "$EXP" --use_wandb "$@"
