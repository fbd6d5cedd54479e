"""Multi-host scaling benchmark (BASELINE: >=85% env-steps/s efficiency from
1 to 4 hosts).

Run ONE copy of this script per host of a TPU slice/pod:

    JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=<k> \
    JAX_COORDINATOR_ADDRESS=<host0>:1234 \
    python scripts/multihost_bench.py --envs_per_device 512

Each host contributes its local devices to one global mesh; the env batch is
sharded on the data axis (host-local shards — no cross-host env traffic) and
the learner is replicated, so the only collectives are the gradient
all-reduces XLA inserts, riding ICI within a slice and DCN across slices.
Host 0 prints a JSON line with global env-steps/s; run with 1 host and N
hosts and divide to get the scaling efficiency.

Single-chip environments (like this repo's dev box) can smoke-test the exact
code path with virtual devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/multihost_bench.py --envs_per_device 16 --episodes 3
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs_per_device", type=int, default=512)
    ap.add_argument("--episode_length", type=int, default=25)
    ap.add_argument("--num_agents", type=int, default=3)
    ap.add_argument("--episodes", type=int, default=10)
    ap.add_argument("--ppo_epoch", type=int, default=10)
    args = ap.parse_args()

    import jax

    from contracts_marl_aam_corridors_tpu.parallel.multihost import (
        init_distributed,
        is_host_zero,
    )

    init_distributed()
    import jax.numpy as jnp

    from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
    from contracts_marl_aam_corridors_tpu.envs.types import EnvParams
    from contracts_marl_aam_corridors_tpu.learner.mappo import GRMAPPOTrainer
    from contracts_marl_aam_corridors_tpu.learner.runner import Runner
    from contracts_marl_aam_corridors_tpu.models import (
        GRMAPPOPolicy,
        ModelConfig,
        PolicyDims,
    )
    from contracts_marl_aam_corridors_tpu.parallel import DistributedRunner, make_mesh

    devices = jax.devices()
    B = args.envs_per_device * len(devices)
    cfgv = vehicle_config("air_taxi")
    env_params = EnvParams(
        cfg=cfgv, num_agents=args.num_agents, num_landmarks=args.num_agents,
        episode_length=args.episode_length,
    )
    cfg = ModelConfig(max_edge_dist=cfgv.coordination_range, compute_dtype="bfloat16")
    dims = PolicyDims(
        obs_dim=env_params.obs_dim,
        cent_obs_dim=env_params.obs_dim * args.num_agents,
        num_entities=env_params.num_entities,
        node_feat_dim=env_params.node_feat_dim,
        num_actions=env_params.num_actions,
    )
    policy = GRMAPPOPolicy(cfg, dims)
    trainer = GRMAPPOTrainer(
        policy, ppo_epoch=args.ppo_epoch, num_mini_batch=1,
        data_chunk_length=args.episode_length,
    )
    runner = Runner(
        env_params=env_params, policy=policy, trainer=trainer,
        n_rollout_threads=B, episode_length=args.episode_length,
    )
    mesh = make_mesh(devices)
    drunner = DistributedRunner(runner, mesh)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    carry = runner.init_carry(jax.random.PRNGKey(1))
    ts, carry = drunner.init(ts, carry)

    key = jax.random.PRNGKey(2)
    ts, carry, info, _ = drunner.train_episode(ts, carry, key)  # compile
    float(np.asarray(info["value_loss"]))

    t0 = time.perf_counter()
    for i in range(args.episodes):
        key, ek = jax.random.split(key)
        ts, carry, info, _ = drunner.train_episode(ts, carry, ek)
        float(np.asarray(info["value_loss"]))
    dt = time.perf_counter() - t0
    sps = B * args.episode_length * args.episodes / dt

    if is_host_zero():
        print(
            json.dumps(
                {
                    "hosts": jax.process_count(),
                    "devices": len(devices),
                    "envs": B,
                    "env_steps_per_sec": round(sps),
                    "episode_ms": round(dt / args.episodes * 1e3, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
