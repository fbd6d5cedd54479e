#!/bin/bash
# From-scratch train-to-success on the PRIMARY july workload (VERDICT r2 #4).
#
# Recipe = the reference's july training script (metered_formation_rotate.sh:
# collision_rew 30, goal_rew 20, lr 7e-4, ppo_epoch 10, Tanh MLP via the
# --use_ReLU store_false idiom) crossed with the air_taxi shape of our proven
# rot_inv run (model_weights/rot_inv/airtaxi/config.yaml: 3 agents, ep_len 75,
# 64 envs, world 4, PopArt on / ValueNorm off, 9 actions, 5M steps).  The
# reference only ships july recipes for unicycle (ep 150) and double
# integrator (ep 25); air_taxi july has no upstream recipe, so the rot_inv
# shape is the closest trained-to-success precedent.
#
# NB: --use_ReLU / --use_valuenorm / --use_wandb are the reference's
# store_false idioms (passing them turns the feature OFF).
set -e
cd "$(dirname "$0")/.."
EXP="${EXP:-ref_recipe_july_scratch}"
exec python -u -m contracts_marl_aam_corridors_tpu.cli.train \
  --scenario_name nav_metered_one_goal_graph_rotate_tube_july \
  --dynamics_type air_taxi --seed "${SEED:-0}" \
  --num_agents=3 --num_landmarks=3 --episode_length 75 --n_rollout_threads 64 \
  --total_actions 9 --use_ReLU --use_popart --use_valuenorm \
  --collision_rew 30 --goal_rew 20 --formation_rew 5 --fair_rew 5 --fair_wt 1 \
  --zeroshift 10 --world_size=4 --num_env_steps "${STEPS:-5000000}" \
  --ppo_epoch 10 --num_mini_batch 1 --auto_mini_batch_size --target_mini_batch_size 8192 \
  --lr 7e-4 --critic_lr 7e-4 --gain 0.01 --entropy_coef 0.01 --data_chunk_length 10 \
  --use_eval --eval_interval 25 --eval_episodes 32 --save_interval 25 --log_interval 5 \
  --compute_dtype float32 \
  --experiment_name "$EXP" --use_wandb "$@"
