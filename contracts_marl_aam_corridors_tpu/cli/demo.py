"""Scripted-policy demo: fly agents through the corridor with a heuristic
controller and save a GIF.

Replaces the reference scenarios' ``__main__`` keyboard demos
(july:1852-1914 with pyglet ``InteractivePolicy``) — pyglet/keyboard input
doesn't exist in headless TPU environments, so the smoke-demo role is served
by a waypoint-chasing heuristic instead.

    python -m contracts_marl_aam_corridors_tpu.cli.demo --scenario_name ... \
        --num_agents 3 --episode_length 100
"""
from __future__ import annotations

import os
import sys

import numpy as np


def heuristic_actions(params, state):
    """Steer each agent toward entrance -> exit -> goal by picking the motion
    primitive whose (angle_rate, accel) best aligns with the bearing error."""
    import jax.numpy as jnp

    from ..envs import actions as action_mod, dynamics, tube as tube_mod

    cfg = params.cfg
    pos = np.asarray(state.agent_states[:, :2])
    heading = np.asarray(dynamics.heading_of(state.agent_states, cfg))
    phase = np.asarray(state.prev_phase)
    entrance = np.asarray(state.tube.entrance)
    exit_ = np.asarray(state.tube.exit)
    goals = np.asarray(state.landmark_pos)[np.asarray(state.goal_match)]

    target = np.where(
        (phase == 0)[:, None], entrance, np.where((phase == 1)[:, None], exit_, goals)
    )
    bearing = np.arctan2(target[:, 1] - pos[:, 1], target[:, 0] - pos[:, 0])
    err = (bearing - heading + np.pi) % (2 * np.pi) - np.pi

    table = action_mod.action_table(cfg, params.total_actions)  # (A, 2)
    # score: turn toward the bearing error, accelerate when roughly aligned
    scores = -np.abs(err[:, None] - table[None, :, 0] * cfg.dt * 5) + np.where(
        np.abs(err)[:, None] < 0.5, table[None, :, 1] * 100, -table[None, :, 1] * 100
    )
    return np.argmax(scores, axis=1)


def main_mpe(args):
    """Random-policy demo of a classic-MPE scenario (the vendored scenarios'
    ``__main__`` harness role): roll one episode, save a GIF."""
    import jax
    import jax.numpy as jnp

    from ..learner.mpe_runner import make_env
    from ..utils.render import render_mpe_frame, save_gif

    env, nvec = make_env(args.scenario_name)
    key = jax.random.PRNGKey(args.seed)
    key, rkey = jax.random.split(key)
    state = env.vec_reset(jax.random.split(rkey, 1))
    n = env.params.num_agents
    sizes = getattr(env.params, "sizes", lambda: None)()
    adv_mask = (
        np.arange(n) < env.params.num_adversaries
        if hasattr(env.params, "num_adversaries") else None
    )
    frames = []
    total = np.zeros(n)
    for t in range(env.params.episode_length):
        key, akey = jax.random.split(key)
        acts = jnp.stack(
            [jax.random.randint(akey, (1, n), 0, v) for v in (nvec * 2)[:2]],
            axis=-1,
        )
        state, (obs, rew, done) = env.vec_step(
            state, acts[..., 0] if len(nvec) == 1 else acts
        )
        total += np.asarray(rew)[0]
        st = jax.tree.map(lambda x: np.asarray(x)[0], state)
        frames.append(render_mpe_frame(
            st.agent_pos, st.landmark_pos, agent_sizes=sizes, world_size=1.5,
            adversary_mask=adv_mask,
        ))
        if bool(np.asarray(done).all()):
            break
    out = os.path.join(args.run_dir, f"demo_{args.scenario_name}.gif")
    os.makedirs(args.run_dir, exist_ok=True)
    save_gif(frames, out)
    print(f"demo: {t+1} steps, per-agent return {np.round(total, 1)}, gif -> {out}")
    return out


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..config.flags import build_env_params, parse_all
    from ..envs import dynamics, env as env_mod
    from ..utils.render import render_frame, save_gif

    args = parse_all(argv)
    if args.interactive:
        from .interactive import run as interactive_run

        return interactive_run(args)
    if args.env_name == "MPE" or args.scenario_name.startswith("simple_"):
        return main_mpe(args)
    params = build_env_params(args)
    e = env_mod.CorridorEnv(params, dtype=jnp.float32)
    state, ts = e.reset(jax.random.PRNGKey(args.seed))

    frames = []
    total = np.zeros(params.num_agents)
    for t in range(args.episode_length):
        acts = heuristic_actions(params, state)
        state, ts = e.step(state, jnp.asarray(acts))
        total += np.asarray(ts.reward)
        st = jax.tree.map(np.asarray, state)
        frames.append(
            render_frame(
                st.agent_states[:, :2],
                np.asarray(dynamics.heading_of(state.agent_states, params.cfg)),
                st.landmark_pos,
                np.asarray(st.tube.entrance),
                np.asarray(st.tube.exit),
                float(st.tube.half_width),
                world_size=params.world_size,
                status=st.status,
            )
        )
        if bool(np.asarray(ts.done).all()):
            break
    out = os.path.join(args.run_dir, "demo.gif")
    os.makedirs(args.run_dir, exist_ok=True)
    save_gif(frames, out)
    print(f"demo: {t+1} steps, per-agent return {np.round(total, 1)}, gif -> {out}")
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
