"""Full-train-episode A/B: gnn_impl dense vs transposed (BENCH_NOTES config:
1024 envs x 25 steps, 15 ppo epochs, bf16 trunks)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
from contracts_marl_aam_corridors_tpu.envs.types import EnvParams
from contracts_marl_aam_corridors_tpu.learner.mappo import GRMAPPOTrainer
from contracts_marl_aam_corridors_tpu.learner.runner import Runner
from contracts_marl_aam_corridors_tpu.models import GRMAPPOPolicy, ModelConfig, PolicyDims


def run(impl, dtype="bfloat16"):
    cfgv = vehicle_config("air_taxi")
    env_params = EnvParams(cfg=cfgv, num_agents=3, num_landmarks=3, episode_length=25)
    cfg = ModelConfig(max_edge_dist=cfgv.coordination_range,
                      compute_dtype=dtype, gnn_impl=impl)
    dims = PolicyDims(
        obs_dim=env_params.obs_dim, cent_obs_dim=env_params.obs_dim * 3,
        num_entities=env_params.num_entities, node_feat_dim=env_params.node_feat_dim,
        num_actions=env_params.num_actions)
    policy = GRMAPPOPolicy(cfg, dims)
    trainer = GRMAPPOTrainer(policy, ppo_epoch=15, num_mini_batch=1, data_chunk_length=25)
    runner = Runner(env_params=env_params, policy=policy, trainer=trainer,
                    n_rollout_threads=1024, episode_length=25)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    carry = runner.init_carry(jax.random.PRNGKey(1))
    step = jax.jit(runner.train_episode)
    key = jax.random.PRNGKey(2)
    for _ in range(2):
        key, ek = jax.random.split(key)
        ts, carry, info, _ = step(ts, carry, ek)
    float(np.asarray(info["value_loss"]))
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        key, ek = jax.random.split(key)
        ts, carry, info, _ = step(ts, carry, ek)
    float(np.asarray(info["value_loss"]))
    dt = (time.perf_counter() - t0) / n
    print(f"gnn_impl={impl} [{dtype}]: {dt*1e3:8.0f} ms/episode "
          f"({1024*25/dt:,.0f} env-steps/s incl. learning) "
          f"vloss={float(np.asarray(info['value_loss'])):.4f}", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["transposed", "dense"]
    dtype = "bfloat16"
    for impl in args:
        if impl in ("float32", "bfloat16"):
            dtype = impl
            continue
        run(impl, dtype)
