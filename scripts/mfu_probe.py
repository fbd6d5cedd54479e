"""MFU / roofline probe for the flagship training episode (VERDICT r2 #6).

Compiles the EXACT 863-ms episode configuration (1024 envs x 25 steps,
3 agents, 15 ppo epochs, bf16 trunks — BENCH_NOTES.md r2 headline) and
reports XLA's own cost analysis: total FLOPs, bytes accessed, and the
implied MFU / roofline position against v5e-1 peaks
(197 TFLOP/s bf16, 819 GB/s HBM).

Runs on any backend for the FLOP/byte COUNTS (pass --cpu when the axon
relay is down); the MFU number quoted in BENCH_NOTES combines these counts
with the on-chip measured episode wall time.

    python scripts/mfu_probe.py --cpu          # counts only
    python scripts/mfu_probe.py --wall-ms 863  # counts + MFU at that wall
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_FLOPS = 197e12   # per chip, dense bf16
V5E_HBM_BPS = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--episode_length", type=int, default=25)
    ap.add_argument("--ppo_epoch", type=int, default=15)
    ap.add_argument("--num_agents", type=int, default=3)
    ap.add_argument("--wall-ms", type=float, default=None,
                    help="measured on-chip episode wall time to turn counts into MFU")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
    from contracts_marl_aam_corridors_tpu.envs.types import EnvParams
    from contracts_marl_aam_corridors_tpu.learner.mappo import GRMAPPOTrainer
    from contracts_marl_aam_corridors_tpu.learner.runner import Runner
    from contracts_marl_aam_corridors_tpu.models import (
        GRMAPPOPolicy, ModelConfig, PolicyDims,
    )

    cfgv = vehicle_config("air_taxi")
    env_params = EnvParams(
        cfg=cfgv, scenario="rotate_tube_july", num_agents=args.num_agents,
        num_landmarks=args.num_agents, episode_length=args.episode_length,
    )
    cfg = ModelConfig(max_edge_dist=cfgv.coordination_range, compute_dtype="bfloat16")
    dims = PolicyDims(
        obs_dim=env_params.obs_dim,
        cent_obs_dim=env_params.obs_dim * env_params.num_agents,
        num_entities=env_params.num_entities,
        node_feat_dim=env_params.node_feat_dim,
        num_actions=env_params.num_actions,
    )
    policy = GRMAPPOPolicy(cfg, dims)
    trainer = GRMAPPOTrainer(policy, ppo_epoch=args.ppo_epoch, num_mini_batch=1,
                             data_chunk_length=args.episode_length)
    runner = Runner(env_params=env_params, policy=policy, trainer=trainer,
                    n_rollout_threads=args.envs, episode_length=args.episode_length)

    ts = trainer.init_state(jax.random.PRNGKey(0))
    carry = runner.init_carry(jax.random.PRNGKey(1))

    def episode(ts, carry, key):
        return runner.train_episode(ts, carry, key)

    lowered = jax.jit(episode).lower(ts, carry, jax.random.PRNGKey(2))
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", float("nan")))
    bts = float(cost.get("bytes accessed", float("nan")))
    env_steps = args.envs * args.episode_length
    print(f"config: {args.envs} envs x {args.episode_length} steps, "
          f"{args.num_agents} agents, {args.ppo_epoch} ppo epochs, bf16")
    print(f"XLA cost analysis ({jax.default_backend()}):")
    print(f"  flops          = {flops:.3e}  ({flops / env_steps:.0f} per env-step)")
    print(f"  bytes accessed = {bts:.3e}")
    print(f"  arithmetic intensity = {flops / bts:.2f} flop/byte "
          f"(v5e ridge: {V5E_BF16_FLOPS / V5E_HBM_BPS:.0f})")
    if args.wall_ms:
        wall = args.wall_ms / 1e3
        mfu = flops / wall / V5E_BF16_FLOPS
        hbm = bts / wall / V5E_HBM_BPS
        print(f"at wall {args.wall_ms:.0f} ms:")
        print(f"  MFU            = {100 * mfu:.2f}% of v5e bf16 peak")
        print(f"  HBM utilization= {100 * hbm:.2f}% of 819 GB/s")
        print(f"  compute-bound floor = {flops / V5E_BF16_FLOPS * 1e3:.2f} ms; "
              f"bandwidth-bound floor = {bts / V5E_HBM_BPS * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
