"""Evaluation / render entry point (reference ``onpolicy/scripts/eval_mpe.py``
+ ``GMPERunner.render``, graph_mpe_runner.py:525-1060).

    python -m contracts_marl_aam_corridors_tpu.cli.eval \
        --model_dir <run>/models --render_episodes 5 [--use_render --save_gifs]

``--model_dir`` accepts either this framework's orbax checkpoints (with
latest.json) OR a reference torch run directory containing actor.pt
[/critic.pt] + config.yaml — reference-trained policies evaluate directly.
Deterministic actions; done agents are stop-masked (:580-589); prints the
success/fairness stats block (:830-903) and writes eval_stats.csv.
"""
from __future__ import annotations

import csv
import os
import sys

import numpy as np


def run_eval(args, ts_params, policy, runner, env_params, episodes: int,
             save_gif_dir: str | None = None):
    import jax
    import jax.numpy as jnp

    from ..envs import dynamics, env as env_mod
    from ..utils.render import render_frame, save_gif

    B = 1
    N = env_params.num_agents
    E = env_params.num_entities
    cfg = env_params.cfg
    rows = []
    key = jax.random.PRNGKey(args.seed)

    reset_j = jax.jit(lambda k: env_mod.reset(env_params, k))
    step_j = jax.jit(lambda s, a: env_mod.step(env_params, s, a))

    def act_fn(params, obs, node, adj, aid, h, m, avail):
        return policy.act(params, jax.random.PRNGKey(0), obs, node, adj, aid, h, m,
                          avail, deterministic=True)

    act_j = jax.jit(act_fn)

    for ep in range(episodes):
        key, rkey = jax.random.split(key)
        state, ts = reset_j(rkey)
        h = jnp.zeros((N, policy.cfg.recurrent_n, policy.cfg.hidden_size))
        masks = jnp.ones((N, 1))
        prev_done = np.zeros((N,), bool)
        frames = []
        ep_rew = 0.0
        info = {}
        reached = np.zeros((N,), bool)  # goal-freeze before the time limit
        final = jax.tree.map(np.asarray, state)
        for t in range(env_params.episode_length):
            A = env_params.num_actions
            avail = np.ones((N, A), np.float32)
            stop = np.zeros((A,), np.float32)
            stop[A // 2] = 1.0
            avail[prev_done] = stop
            adj_rep = jnp.broadcast_to(ts.adj[None], (N, E, E))
            actions, h = act_j(
                ts_params, ts.obs, ts.node_obs, adj_rep, ts.agent_id, h, masks,
                jnp.asarray(avail),
            )
            state, ts = step_j(state, actions[:, 0])
            done = np.asarray(ts.done)
            ep_rew += float(np.asarray(ts.reward).mean())
            masks = jnp.asarray(1.0 - done[:, None].astype(np.float32))
            h = h * (1.0 - done[:, None, None].astype(np.float32))
            prev_done = done
            # ts.done reflects the terminal step BEFORE any auto-reset; an
            # agent done before the time limit froze at its goal
            if t + 1 < env_params.episode_length:
                reached |= done
            info = {k: np.asarray(v) for k, v in ts.info.items()}
            if save_gif_dir is not None:
                st = jax.tree.map(np.asarray, state)
                frames.append(
                    render_frame(
                        st.agent_states[:, :2],
                        np.asarray(dynamics.heading_of(state.agent_states, cfg)),
                        st.landmark_pos,
                        np.asarray(st.tube.entrance),
                        np.asarray(st.tube.exit),
                        float(st.tube.half_width),
                        world_size=env_params.world_size,
                        status=st.status,
                    )
                )
            if bool(done.all()):
                break
            final = jax.tree.map(np.asarray, state)
        success = float((reached | (final.goal_tracker >= 0)).mean())
        row = {
            "episode": ep,
            "ep_rew": ep_rew,
            "success_frac": success,
            "time_mean": float(info.get("Time_mean", np.nan)),
            "time_stddev": float(info.get("Time_stddev", np.nan)),
            "dist_mean": float(info.get("Distance_mean", np.nan)),
            "dist_stddev": float(info.get("Distance_variance", np.nan)),
            "agent_collisions": float(np.asarray(info.get("Num_agent_collisions", np.nan)).sum()),
            "conformance": float(np.asarray(info.get("Conformance", np.nan)).mean()),
            "spacing_violations": float(np.asarray(info.get("Spacing_violations", np.nan)).mean()),
        }
        rows.append(row)
        print(
            f"[eval ep {ep}] rew {ep_rew:.2f} success {success:.2f} "
            f"collisions {row['agent_collisions']:.0f} conformance {row['conformance']:.3f}"
        )
        if save_gif_dir is not None and frames:
            os.makedirs(save_gif_dir, exist_ok=True)
            save_gif(frames, os.path.join(save_gif_dir, f"episode_{ep}.gif"))
    return rows


def run_eval_mpe(args):
    """Classic flat-obs MPE evaluation: restore an orbax checkpoint trained
    by the MPE path, run deterministic episodes on one env, optionally render
    GIFs (reference separated/shared MPERunner render loops)."""
    import jax
    import jax.numpy as jnp

    from ..utils.checkpoint import restore_checkpoint
    from ..utils.render import render_mpe_frame, save_gif
    from .train import build_mpe

    policy, trainer, runner = build_mpe(args)
    ts = trainer.init_state(jax.random.PRNGKey(args.seed))
    ts, _ = restore_checkpoint(args.model_dir, ts)
    print(f"restored orbax checkpoint from {args.model_dir}")

    env = runner.env
    N = env.params.num_agents
    K = policy.dims.action_dim
    separated = hasattr(trainer, "base")
    key = jax.random.PRNGKey(args.seed + 1)
    gif_dir = (
        os.path.join(args.run_dir, "gifs")
        if (args.use_render and args.save_gifs) else None
    )

    sizes = getattr(env.params, "sizes", lambda: None)()
    adv_mask = None
    if hasattr(env.params, "num_adversaries"):
        adv_mask = np.arange(N) < env.params.num_adversaries

    def act1(params, obs, h, m):
        return policy.act(
            params, jax.random.PRNGKey(0), obs,
            rnn_states_actor=h, masks=m, deterministic=True,
        )

    if separated:
        act_j = jax.jit(jax.vmap(act1, in_axes=(0, 0, 0, 0)))
    else:
        act_j = jax.jit(act1)
    rows = []
    for ep in range(args.render_episodes):
        key, rkey = jax.random.split(key)
        state = env.vec_reset(jax.random.split(rkey, 1))  # batch of one env
        obs = np.asarray(env.observations(state))[0]
        h = jnp.zeros((N, policy.cfg.recurrent_n, policy.cfg.hidden_size))
        masks = jnp.ones((N, 1))
        frames = []
        ep_rew = 0.0
        for t in range(env.params.episode_length):
            if separated:
                actions, h = act_j(
                    ts.params, jnp.asarray(obs)[:, None], h[:, None], masks[:, None]
                )
                actions = actions[:, 0]
                h = h[:, 0]
            else:
                actions, h = act_j(ts.params, jnp.asarray(obs), h, masks)
            env_actions = actions[..., 0] if K == 1 else actions
            state, (obs_b, rew, done) = env.vec_step(state, env_actions[None])
            obs = np.asarray(obs_b)[0]
            ep_rew += float(np.asarray(rew).mean())
            if gif_dir is not None:
                st = jax.tree.map(lambda x: np.asarray(x)[0], state)
                frames.append(render_mpe_frame(
                    st.agent_pos, st.landmark_pos, agent_sizes=sizes,
                    world_size=1.5, adversary_mask=adv_mask,
                ))
            if bool(np.asarray(done).all()):
                break
        rows.append({"episode": ep, "ep_rew": ep_rew})
        print(f"[eval ep {ep}] rew {ep_rew:.2f}")
        if gif_dir is not None and frames:
            os.makedirs(gif_dir, exist_ok=True)
            save_gif(frames, os.path.join(gif_dir, f"mpe_episode_{ep}.gif"))
    out_csv = os.path.join(args.run_dir, "eval_stats.csv")
    os.makedirs(args.run_dir, exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"eval done: {len(rows)} episodes; stats -> {out_csv}")
    return rows


def main(argv=None):
    from ..config.flags import parse_all
    from .train import build

    args = parse_all(argv)
    assert args.model_dir, "--model_dir required"
    import jax

    from ..utils.checkpoint import (
        load_run_config,
        merge_eval_args,
        restore_checkpoint,
        restore_reference_policy,
    )

    cfg_dir = args.model_dir
    if not os.path.exists(os.path.join(cfg_dir, "config.yaml")) and os.path.exists(
        os.path.join(os.path.dirname(cfg_dir), "config.yaml")
    ):
        cfg_dir = os.path.dirname(cfg_dir)
    if os.path.exists(os.path.join(cfg_dir, "config.yaml")):
        args = merge_eval_args(args, load_run_config(cfg_dir))

    if args.env_name == "MPE" or args.scenario_name.startswith("simple_"):
        return run_eval_mpe(args)

    # deterministic evaluation runs in full precision regardless of the
    # training-time compute dtype
    args.compute_dtype = "float32"
    env_params, policy, trainer, runner = build(args)
    ts = trainer.init_state(jax.random.PRNGKey(args.seed))

    if os.path.exists(os.path.join(args.model_dir, "latest.json")):
        ts, _ = restore_checkpoint(args.model_dir, ts)
        params = ts.params
        print(f"restored orbax checkpoint from {args.model_dir}")
    elif os.path.exists(os.path.join(args.model_dir, "actor.pt")):
        params = restore_reference_policy(args.model_dir, policy.cfg, ts.params)
        print(f"imported reference torch weights from {args.model_dir}")
    else:
        raise FileNotFoundError(f"no checkpoint found under {args.model_dir}")

    gif_dir = os.path.join(args.run_dir, "gifs") if (args.use_render and args.save_gifs) else None
    rows = run_eval(args, params, policy, runner, env_params,
                    args.render_episodes, gif_dir)

    out_csv = os.path.join(args.run_dir, "eval_stats.csv")
    os.makedirs(args.run_dir, exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    mean_succ = float(np.mean([r["success_frac"] for r in rows]))
    print(f"eval done: {len(rows)} episodes, mean success {mean_succ:.3f}; stats -> {out_csv}")
    return rows


if __name__ == "__main__":
    main(sys.argv[1:])
