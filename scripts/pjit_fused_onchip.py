"""On-chip pjit validation of the pallas_fused GNN trunk (VERDICT r4 item 1b).

Runs the flagship sharded ``DistributedRunner.train_episode`` through a
1-device ``jax.sharding.Mesh`` on the REAL TPU with ``gnn_impl=pallas_fused``
— the same partitioned program ``tests/test_parallel.py`` proves correct on
the virtual CPU mesh (interpret mode) — to show the custom_vjp pallas custom
call composes with the pjit partitioner on hardware, not just in interpret
mode.  Also times it against ``transposed`` through the same mesh path and
cross-checks the losses.

Usage: python scripts/pjit_fused_onchip.py [impl ...]   (default: both)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
from contracts_marl_aam_corridors_tpu.envs.types import EnvParams
from contracts_marl_aam_corridors_tpu.learner.mappo import GRMAPPOTrainer
from contracts_marl_aam_corridors_tpu.learner.runner import Runner
from contracts_marl_aam_corridors_tpu.models import GRMAPPOPolicy, ModelConfig, PolicyDims
from contracts_marl_aam_corridors_tpu.parallel import DistributedRunner, make_mesh


def build(impl, dtype="bfloat16"):
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
    return runner, trainer


def main():
    impls = sys.argv[1:] or ["transposed", "pallas_fused"]
    devices = jax.devices()
    print(f"devices: {devices}", flush=True)
    mesh = make_mesh(devices[:1])
    results = {}
    for impl in impls:
        runner, trainer = build(impl)
        drunner = DistributedRunner(runner, mesh)
        ts = trainer.init_state(jax.random.PRNGKey(0))
        carry = runner.init_carry(jax.random.PRNGKey(1))
        ts, carry = drunner.init(ts, carry)
        t0 = time.perf_counter()
        ts, carry, info, _ = drunner.train_episode(ts, carry, jax.random.PRNGKey(2))
        vl = float(np.asarray(info["value_loss"]))
        print(f"[{impl}] mesh-sharded compile+first-step: "
              f"{time.perf_counter()-t0:.1f}s value_loss={vl:.5f}", flush=True)
        # timed steps (materialize a scalar each step — block_until_ready
        # does not wait over the axon tunnel)
        keys = jax.random.split(jax.random.PRNGKey(3), 8)
        ts, carry, info, _ = drunner.train_episode(ts, carry, keys[0])
        float(np.asarray(info["value_loss"]))
        t0 = time.perf_counter()
        vls = []
        for k in keys[1:6]:
            ts, carry, info, _ = drunner.train_episode(ts, carry, k)
            vls.append(float(np.asarray(info["value_loss"])))
        dt = (time.perf_counter() - t0) / 5
        assert all(np.isfinite(v) for v in vls), (impl, vls)
        print(f"[{impl}] mesh-sharded episode: {dt*1e3:.0f} ms "
              f"({1024*25/dt/1e3:.1f}K env-steps/s) value_losses={vls}",
              flush=True)
        results[impl] = (dt, vls)
    if len(results) == 2:
        (dta, vla), (dtb, vlb) = results.values()
        drift = max(abs(a - b) for a, b in zip(vla, vlb))
        print(f"speedup: {dta/dtb:.2f}x; max |value_loss| drift across 5 "
              f"episodes: {drift:.4f} (fp-tolerance expected)", flush=True)


if __name__ == "__main__":
    main()
