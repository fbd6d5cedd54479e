"""Training entry point (reference ``onpolicy/scripts/train_mpe.py``).

    python -m contracts_marl_aam_corridors_tpu.cli.train \
        --scenario_name nav_metered_one_goal_graph_rotate_tube_july \
        --num_agents 3 --episode_length 25 --n_rollout_threads 128 \
        --num_env_steps 2000000 --dynamics_type air_taxi

Differences from the reference launcher: no subprocess vec-env (envs live on
device), no torch threads/cuda setup; when more than one accelerator is
visible the env batch is sharded over a data mesh automatically.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np


def build(args):
    import jax

    from ..config.flags import build_env_params, build_model_config
    from ..learner.mappo import GRMAPPOTrainer
    from ..learner.runner import Runner
    from ..models import GRMAPPOPolicy, PolicyDims

    env_params = build_env_params(args)
    cfg = build_model_config(args)
    dims = PolicyDims(
        obs_dim=env_params.obs_dim,
        cent_obs_dim=env_params.obs_dim * env_params.num_agents,
        num_entities=env_params.num_entities,
        node_feat_dim=env_params.node_feat_dim,
        num_actions=env_params.num_actions,
    )
    policy = GRMAPPOPolicy(
        cfg,
        dims,
        lr=args.lr,
        critic_lr=args.critic_lr,
        opti_eps=args.opti_eps,
        weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        use_max_grad_norm=args.use_max_grad_norm,
        use_linear_lr_decay=args.use_linear_lr_decay,
        fuse_gnn_trunks=getattr(args, "fuse_gnn_trunks", False),
    )
    # non-recurrent 'mappo' uses the flat feed-forward generator semantics
    # (graph_buffer.py:368): chunk length 1 == per-timestep shuffling.
    # --use_naive_recurrent_policy trains on whole-episode sequences
    # (naive_recurrent_generator, graph_buffer.py:455-596): that is exactly
    # the chunked path with chunk length == episode_length (contiguous
    # full-T chunks, head rnn state from t=0, permuted over env*agent).
    if not cfg.use_recurrent_policy:
        chunk = 1
    elif args.use_naive_recurrent_policy and not args.use_recurrent_policy:
        chunk = args.episode_length
    else:
        chunk = args.data_chunk_length
    trainer = GRMAPPOTrainer(
        policy,
        clip_param=args.clip_param,
        ppo_epoch=args.ppo_epoch,
        num_mini_batch=args.num_mini_batch,
        data_chunk_length=chunk,
        value_loss_coef=args.value_loss_coef,
        entropy_coef=args.entropy_coef,
        huber_delta=args.huber_delta,
        gamma=args.gamma,
        gae_lambda=args.gae_lambda,
        use_clipped_value_loss=args.use_clipped_value_loss,
        use_huber_loss=args.use_huber_loss,
        use_valuenorm=args.use_valuenorm and not args.use_popart,
        use_popart=args.use_popart,
        use_value_active_masks=args.use_value_active_masks,
        use_policy_active_masks=args.use_policy_active_masks,
        use_gae=args.use_gae,
        use_proper_time_limits=args.use_proper_time_limits,
    )
    # HJ value data for the air-taxi safety filter (train_mpe.py:104-116);
    # the reference's pickle is absent upstream, so fall back to the
    # synthetic distance-based table when the file is missing
    hj_data = None
    if env_params.use_safety_filter and args.safety_filter_type == "hj" \
            and args.dynamics_type == "air_taxi":
        from .. import safety as safety_mod

        if os.path.exists(args.safety_value_fn):
            hj_data = safety_mod.load_hj_pickle(
                args.safety_value_fn, env_params.cfg.separation_distance
            )
        else:
            print(f"[safety] {args.safety_value_fn} not found; using the "
                  "synthetic HJ table (safety.make_synthetic_airtaxi_hj)")
            hj_data = safety_mod.make_synthetic_airtaxi_hj(env_params.cfg)
    runner = Runner(
        env_params=env_params,
        policy=policy,
        trainer=trainer,
        n_rollout_threads=args.n_rollout_threads,
        episode_length=args.episode_length,
        use_centralized_v=args.use_centralized_V,
        hj_data=hj_data,
    )
    return env_params, policy, trainer, runner


def build_mpe(args):
    """Flat-obs classic-MPE path (reference train_mpe.py with env_name 'MPE'
    -> MPEEnv + R_MAPPOPolicy): non-graph MLP policy over a vectorized
    scenario kernel, same jitted trainer."""
    import dataclasses as _dc

    from ..config.flags import build_model_config
    from ..learner.mappo import GRMAPPOTrainer
    from ..learner.mpe_runner import MPERunner, make_env
    from ..models.mlp_policy import FlatPolicyDims, RMAPPOPolicy

    cfg = build_model_config(args)
    overrides = {}
    from ..envs import mpe_classic as _mc
    from ..envs import mpe_scenarios as _ms

    params_cls = {
        "simple_spread": _mc.MPEParams,
        "simple_tag": _mc.TagParams,
        **{k: v[0] for k, v in _ms.SCENARIOS.items()},
    }[args.scenario_name]
    fields = {f.name for f in _dc.fields(params_cls)}
    for name in ("num_agents", "num_landmarks", "episode_length"):
        if name in fields:
            overrides[name] = getattr(args, name)
    env, nvec = make_env(args.scenario_name, **overrides)
    dims = FlatPolicyDims(
        obs_dim=env.params.obs_dim,
        cent_obs_dim=env.params.obs_dim * env.params.num_agents,
        action_nvec=nvec,
    )
    policy = RMAPPOPolicy(
        cfg, dims, lr=args.lr, critic_lr=args.critic_lr, opti_eps=args.opti_eps,
        max_grad_norm=args.max_grad_norm, use_max_grad_norm=args.use_max_grad_norm,
        use_linear_lr_decay=args.use_linear_lr_decay,
    )
    chunk = args.data_chunk_length if cfg.use_recurrent_policy else 1
    trainer = GRMAPPOTrainer(
        policy,
        clip_param=args.clip_param, ppo_epoch=args.ppo_epoch,
        num_mini_batch=args.num_mini_batch, data_chunk_length=chunk,
        value_loss_coef=args.value_loss_coef, entropy_coef=args.entropy_coef,
        huber_delta=args.huber_delta, gamma=args.gamma,
        gae_lambda=args.gae_lambda,
        use_clipped_value_loss=args.use_clipped_value_loss,
        use_huber_loss=args.use_huber_loss,
        use_valuenorm=args.use_valuenorm and not args.use_popart,
        use_popart=args.use_popart,
        use_value_active_masks=args.use_value_active_masks,
        use_policy_active_masks=args.use_policy_active_masks,
        use_gae=args.use_gae,
        use_proper_time_limits=args.use_proper_time_limits,
    )
    if not args.share_policy:
        # separated per-agent policies (reference runner/separated/*):
        # params stacked on an agent axis, trained via vmap
        from ..learner.separated import SeparatedMPERunner, SeparatedTrainer

        trainer = SeparatedTrainer(base=trainer, num_agents=env.params.num_agents)
        runner = SeparatedMPERunner(
            env=env, policy=policy, trainer=trainer,
            n_rollout_threads=args.n_rollout_threads,
            episode_length=args.episode_length,
            use_centralized_v=args.use_centralized_V,
        )
        return policy, trainer, runner
    runner = MPERunner(
        env=env, policy=policy, trainer=trainer,
        n_rollout_threads=args.n_rollout_threads,
        episode_length=args.episode_length,
        use_centralized_v=args.use_centralized_V,
    )
    return policy, trainer, runner


def main_mpe(args):
    import jax

    from ..utils.checkpoint import save_checkpoint
    from ..utils.logging import MetricsLogger, print_box

    policy, trainer, runner = build_mpe(args)
    run_dir = os.path.join(
        args.run_dir, "MPE", args.scenario_name, args.algorithm_name,
        args.experiment_name, f"seed{args.seed}",
    )
    os.makedirs(run_dir, exist_ok=True)
    save_dir = os.path.join(run_dir, "models")
    os.makedirs(save_dir, exist_ok=True)
    logger = MetricsLogger(run_dir, use_wandb=args.use_wandb, config=vars(args))

    key = jax.random.PRNGKey(args.seed)
    key, k_init, k_carry = jax.random.split(key, 3)
    ts = trainer.init_state(k_init)
    carry = runner.init_carry(k_carry)
    step_fn = jax.jit(runner.train_episode)
    # in-training eval cadence (reference MPERunner.eval via mpe_runner.py
    # :162-194's interval logic)
    n_eval = max(args.n_eval_rollout_threads, args.eval_episodes)
    eval_fn = (jax.jit(lambda t, k: runner.eval_episode(t, k, n_eval))
               if args.use_eval else None)
    episodes = int(args.num_env_steps) // args.episode_length // args.n_rollout_threads
    print_box(
        f"MPE {args.scenario_name} | {runner.num_agents} agents | "
        f"{args.n_rollout_threads} envs | {episodes} episodes"
    )
    start = time.time()
    for episode in range(episodes):
        if args.use_linear_lr_decay:
            ts = policy.lr_decay(ts, episode, episodes)
        key, ekey = jax.random.split(key)
        ts, carry, train_info = step_fn(ts, carry, ekey)
        total_steps = (episode + 1) * args.episode_length * args.n_rollout_threads
        if episode % args.save_interval == 0 or episode == episodes - 1:
            save_checkpoint(save_dir, ts, episode, config=vars(args))
        if episode % args.log_interval == 0:
            info = {k: float(np.asarray(v)) for k, v in train_info.items()}
            sps = total_steps / max(time.time() - start, 1e-9)
            info["env_steps_per_sec"] = sps
            logger.log(info, total_steps)
            print(
                f"ep {episode}/{episodes} steps {total_steps} "
                f"rew {info.get('average_episode_rewards', float('nan')):.3f} "
                f"sps {sps:,.0f}",
                flush=True,
            )
        if eval_fn is not None and episode % args.eval_interval == 0:
            key, evkey = jax.random.split(key)
            einfo = {k: float(np.asarray(v)) for k, v in eval_fn(ts, evkey).items()}
            logger.log(einfo, total_steps)
            print(
                f"[eval ep {episode}] rew "
                f"{einfo['eval_average_episode_rewards']:.2f}",
                flush=True,
            )
    save_checkpoint(save_dir, ts, episodes - 1 if episodes else 0, config=vars(args))
    print(f"[FINAL SAVE] checkpoints at: {save_dir}")
    logger.close()
    return run_dir


def main(argv=None):
    from ..config.flags import parse_all

    args = parse_all(argv)
    if args.env_name == "MPE" or args.scenario_name.startswith("simple_"):
        return main_mpe(args)
    import jax

    from ..parallel import DistributedRunner, make_mesh
    from ..utils.checkpoint import save_checkpoint
    from ..utils.logging import MetricsLogger, agent_env_infos, print_box

    if args.warm_start_dir and not args.model_dir:
        # adopt the source checkpoint's activation flags BEFORE building the
        # model: these change the function without changing param shapes, so
        # a mismatch warm-starts cleanly into a broken policy (see
        # utils/checkpoint.py _ARCH_ACT_FLAGS)
        from ..utils.checkpoint import warm_start_arch_flags

        for k, v in warm_start_arch_flags(args.warm_start_dir).items():
            if getattr(args, k) != v:
                print(
                    f"warm start: adopting {k}={v} from the checkpoint's "
                    f"config.yaml (run requested {getattr(args, k)}; the "
                    f"activation must match the loaded weights)",
                    flush=True,
                )
                setattr(args, k, v)

    env_params, policy, trainer, runner = build(args)

    run_dir = os.path.join(
        args.run_dir, args.env_name, args.scenario_name, args.algorithm_name,
        args.experiment_name, f"seed{args.seed}",
    )
    os.makedirs(run_dir, exist_ok=True)
    save_dir = os.path.join(run_dir, "models")
    os.makedirs(save_dir, exist_ok=True)
    # reference: wandb on by default, --use_wandb flag DISABLES it
    logger = MetricsLogger(run_dir, use_wandb=args.use_wandb, config=vars(args))

    key = jax.random.PRNGKey(args.seed)
    key, k_init, k_carry = jax.random.split(key, 3)
    ts = trainer.init_state(k_init)
    carry = runner.init_carry(k_carry)

    start_episode = 0
    if args.model_dir:
        # resume: full TrainState (params + optimizers + value norm) — richer
        # than the reference's actor/critic-only warm start (base_runner:179)
        from ..utils.checkpoint import restore_checkpoint

        ts, start_episode = restore_checkpoint(args.model_dir, ts)
        print(f"resumed from {args.model_dir} at episode {start_episode}")
    elif args.warm_start_dir:
        # weights-only transfer (reference base_runner.py:179): params + value
        # norm from the checkpoint, fresh optimizers, episode counter at 0;
        # handles the rot_inv(13-dim obs) -> two/three_phase(15-dim) remap
        from ..utils.checkpoint import warm_start_params

        ts = warm_start_params(args.warm_start_dir, ts, env_params.obs_dim,
                               cfg=policy.cfg)
        print(f"warm-started params from {args.warm_start_dir}")

    devices = jax.devices()
    use_mesh = len(devices) > 1 and args.n_rollout_threads % len(devices) == 0
    if use_mesh:
        drunner = DistributedRunner(runner, make_mesh(devices))
        ts, carry = drunner.init(ts, carry)
        step_fn = drunner.train_episode
    else:
        step_fn = jax.jit(runner.train_episode)

    # in-training eval (reference GMPERunner.eval, cadence at
    # graph_mpe_runner.py:162-194): eval_episodes deterministic episodes run
    # as one vectorized batch every eval_interval episodes
    n_eval = max(args.n_eval_rollout_threads, args.eval_episodes)
    eval_fn = jax.jit(lambda t, k: runner.eval_episode(t, k, n_eval)) if args.use_eval else None

    episodes = int(args.num_env_steps) // args.episode_length // args.n_rollout_threads
    print_box(
        f"{args.scenario_name} | {args.num_agents} agents | "
        f"{args.n_rollout_threads} envs x {len(devices)} device(s) | {episodes} episodes"
    )

    base_rews = (args.collision_rew, args.formation_rew, args.fair_rew)
    cur_stage = -1

    def rebuild():
        # re-parameterized step function; on a mesh the wrapper must be
        # re-initialized so its jitted step carries the right shardings
        nonlocal step_fn, runner, ts, carry, eval_fn
        _, _, _, runner = build(args)
        if use_mesh:
            dr = DistributedRunner(runner, make_mesh(devices))
            ts, carry = dr.init(ts, carry)
            step_fn = dr.train_episode
        else:
            step_fn = jax.jit(runner.train_episode)
        if args.use_eval:
            eval_fn = jax.jit(lambda t, k: runner.eval_episode(t, k, n_eval))

    start = time.time()
    for episode in range(start_episode, episodes):
        # mid-training fairness bump (graph_mpe_runner.py:56-61): fair_rew=10
        # at half training.  EnvParams is static per compile, so this swaps in
        # a re-parameterized step function (one recompile).
        if args.increase_fairness and episode == episodes // 2:
            args.fair_rew = 10
            base_rews = (args.collision_rew, args.formation_rew, args.fair_rew)
            rebuild()
        # curriculum (reference update_curriculum, july:424-438 — commented
        # out upstream): collision/formation/fair weights scale with training
        # progress, staged in tenths to bound recompiles
        if args.use_curriculum:
            ratio = float(np.clip(episode / max(episodes, 1), 0.1, 1.0))
            stage = int(ratio * 10)
            if stage != cur_stage:
                cur_stage = stage
                s = stage / 10.0
                args.collision_rew = base_rews[0] * s
                args.formation_rew = base_rews[1] * s
                args.fair_rew = base_rews[2] * s
                rebuild()
        if args.use_linear_lr_decay:
            ts = policy.lr_decay(ts, episode, episodes)
        key, ekey = jax.random.split(key)
        # the axon remote-compile helper fails transiently (HTTP 500 /
        # SIGSEGV); retry the episode — compiles are cached, so a retry after
        # a pause usually lands
        for attempt in range(3):
            try:
                ts, carry, train_info, env_info = step_fn(ts, carry, ekey)
                break
            except Exception as e:  # pragma: no cover - backend flake
                if attempt == 2 or "remote_compile" not in str(e):
                    raise
                print(f"episode {episode}: compile-service error, retrying "
                      f"({attempt + 1}/3): {str(e)[:80]}", flush=True)
                time.sleep(20)

        total_steps = (episode + 1) * args.episode_length * args.n_rollout_threads
        if episode % args.save_interval == 0 or episode == episodes - 1:
            save_checkpoint(save_dir, ts, episode, config=vars(args))
        if episode % args.log_interval == 0:
            info = {k: float(np.asarray(v)) for k, v in train_info.items()}
            info.update(agent_env_infos(env_info, args.num_agents))
            sps = total_steps / max(time.time() - start, 1e-9)
            info["env_steps_per_sec"] = sps
            logger.log(info, total_steps)
            print(
                f"ep {episode}/{episodes} steps {total_steps} "
                f"rew {info.get('average_episode_rewards', float('nan')):.3f} "
                f"vloss {info.get('value_loss', float('nan')):.4f} "
                f"sps {sps:,.0f}",
                flush=True,
            )
        if eval_fn is not None and episode % args.eval_interval == 0:
            key, evkey = jax.random.split(key)
            einfo = {k: float(np.asarray(v)) for k, v in eval_fn(ts, evkey).items()}
            logger.log(einfo, total_steps)
            print(
                f"[eval ep {episode}] rew {einfo['eval_average_episode_rewards']:.2f} "
                f"success {einfo['eval_success_rate']:.3f} "
                f"all-success {einfo['eval_all_success_rate']:.3f} "
                f"collisions {einfo['eval_num_agent_collisions']:.2f}",
                flush=True,
            )
    save_checkpoint(save_dir, ts, episodes - 1 if episodes else 0, config=vars(args))
    print(f"[FINAL SAVE] checkpoints at: {save_dir}")
    logger.close()
    return run_dir


if __name__ == "__main__":
    main(sys.argv[1:])
