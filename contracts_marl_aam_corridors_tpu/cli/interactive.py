"""Keyboard-interactive demo (the reference's ``InteractivePolicy``,
multiagent/policy.py:13-52: pyglet arrow-key events -> move flags -> env
action, with a no-move default).

Pyglet needs a display server; in a headless TPU environment the keyboard is
the controlling TTY instead: keys are read raw (termios cbreak + select,
arrow-escape sequences parsed), the world is drawn as an ANSI frame in the
terminal each step, and the whole episode is additionally saved as a GIF on
exit.  One agent is keyboard-driven; the rest fly the scripted heuristic
(``cli/demo.py``), mirroring the reference's one-viewer-per-agent setup.

Run:  python -m contracts_marl_aam_corridors_tpu.cli.demo --interactive \
          --scenario_name ... --num_agents 3 --episode_length 100

Keys: arrows or WASD steer (left/right = yaw, up/down = accelerate/brake),
space = coast, q = quit.
"""
from __future__ import annotations

import os
import select
import sys
from typing import Iterable, Iterator, Optional

import numpy as np

# Canonical key tokens produced by the reader / consumed by the mappers.
LEFT, RIGHT, UP, DOWN, COAST, QUIT = "left", "right", "up", "down", "coast", "quit"

_WASD = {"a": LEFT, "d": RIGHT, "w": UP, "s": DOWN, " ": COAST, "q": QUIT}
_ARROW = {"A": UP, "B": DOWN, "C": RIGHT, "D": LEFT}  # ESC [ <x>


def mpe_action_from_keys(move) -> int:
    """Reference ``InteractivePolicy.action`` discrete branch
    (multiagent/policy.py:26-31): move flags [left, right, up, down] ->
    {0 noop, 1 left, 2 right, 3 down, 4 up}, later if-clauses winning."""
    u = 0
    if move[0]:
        u = 1
    if move[1]:
        u = 2
    if move[2]:
        u = 4
    if move[3]:
        u = 3
    return u


def key_to_move_flags(key: Optional[str]):
    """One held key -> the reference's 4-flag move list."""
    return [key == LEFT, key == RIGHT, key == UP, key == DOWN]


def corridor_action_from_key(key: Optional[str], table: np.ndarray) -> int:
    """Map a key to the corridor env's discrete motion primitives.

    ``table`` is the (A, 2) [angle_rate, accel] grid (envs/actions.py
    ``action_table``, reference ``_set_action``).  The key expresses a
    desired (turn, accel) at the extremes of the table's own range; the
    nearest primitive (normalized L2) is chosen, so the mapping is exact for
    any ``total_actions`` layout.  LEFT = max positive yaw rate (CCW),
    UP = max accel, COAST/None = nearest to (0, 0).
    """
    table = np.asarray(table, dtype=np.float64)
    r_max = np.abs(table[:, 0]).max()
    a_max = np.abs(table[:, 1]).max()
    want = {
        LEFT: (r_max, 0.0),
        RIGHT: (-r_max, 0.0),
        UP: (0.0, a_max),
        DOWN: (0.0, -a_max),
    }.get(key, (0.0, 0.0))
    norm = np.where(np.array([r_max, a_max]) > 0, [r_max, a_max], 1.0)
    d = ((table - np.asarray(want)) / norm) ** 2
    return int(np.argmin(d.sum(axis=1)))


# ----------------------------------------------------------------- TTY input
def tty_keys(timeout: float = 0.15) -> Iterator[Optional[str]]:
    """Yield one key token per env step, reading the controlling TTY raw.

    cbreak (not full raw) keeps Ctrl-C working; a ``timeout`` with no
    keypress yields None (= coast), so the episode advances at a steady
    rate like the reference's pyglet render loop (ifi).
    """
    import termios
    import tty

    if not sys.stdin.isatty():
        raise SystemExit(
            "--interactive needs a TTY on stdin (run from a terminal); "
            "use the scripted demo (no --interactive) headless"
        )
    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    tty.setcbreak(fd)
    try:
        while True:
            r, _, _ = select.select([sys.stdin], [], [], timeout)
            if not r:
                yield None
                continue
            ch = os.read(fd, 1).decode(errors="ignore")
            if ch == "\x1b":  # arrow escape sequence ESC [ A..D
                r2, _, _ = select.select([sys.stdin], [], [], 0.01)
                seq = os.read(fd, 2).decode(errors="ignore") if r2 else ""
                yield _ARROW.get(seq[-1:] or "", None)
            else:
                yield _WASD.get(ch.lower())
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)


# ------------------------------------------------------------ ANSI rendering
def ascii_frame(
    agent_pos: np.ndarray,
    heading: np.ndarray,
    landmark_pos: np.ndarray,
    entrance: np.ndarray,
    exit_: np.ndarray,
    world_size: float,
    status: np.ndarray,
    control_agent: int,
    cols: int = 64,
    rows: int = 24,
) -> str:
    """Draw the world as a character grid: agents are their index digit (the
    controlled one highlighted, frozen ones 'x'), goals '*', corridor
    entrance '[' and exit ']'.  Pure (testable without a TTY)."""
    grid = [[" "] * cols for _ in range(rows)]

    def put(p, ch):
        c = int((p[0] + world_size) / (2 * world_size) * (cols - 1))
        r = int((world_size - p[1]) / (2 * world_size) * (rows - 1))
        if 0 <= r < rows and 0 <= c < cols:
            grid[r][c] = ch

    put(np.asarray(entrance), "[")
    put(np.asarray(exit_), "]")
    for p in np.asarray(landmark_pos):
        put(p, "*")
    arrows = "→↗↑↖←↙↓↘"
    for i, p in enumerate(np.asarray(agent_pos)):
        if status is not None and int(np.asarray(status)[i]) != 0:
            ch = "x"
        elif i == control_agent:
            ch = arrows[int(((float(heading[i]) % (2 * np.pi)) + np.pi / 8) // (np.pi / 4)) % 8]
        else:
            ch = str(i % 10)
        put(p, ch)
    border = "+" + "-" * cols + "+"
    return "\n".join([border] + ["|" + "".join(r) + "|" for r in grid] + [border])


# ------------------------------------------------------------------ the loop
def run(args, key_source: Optional[Iterable[Optional[str]]] = None):
    """Interactive episode: agent ``args.control_agent`` follows the
    keyboard, others follow the heuristic.  ``key_source`` overrides the TTY
    reader (scripted keys in tests)."""
    import jax
    import jax.numpy as jnp

    from ..config.flags import build_env_params
    from ..envs import actions as action_mod, dynamics, env as env_mod
    from ..utils.render import render_frame, save_gif
    from .demo import heuristic_actions

    if args.env_name == "MPE" or args.scenario_name.startswith("simple_"):
        raise SystemExit(
            "--interactive drives the corridor scenarios; classic-MPE "
            "scenarios use the scripted demo (cli/demo.py without --interactive)"
        )
    params = build_env_params(args)
    e = env_mod.CorridorEnv(params, dtype=jnp.float32)
    state, ts = e.reset(jax.random.PRNGKey(args.seed))
    table = np.asarray(action_mod.action_table(params.cfg, args.total_actions))
    ctrl = int(getattr(args, "control_agent", 0))
    keys = iter(key_source) if key_source is not None else tty_keys(args.ifi)
    live = key_source is None

    frames = []
    total = np.zeros(params.num_agents)
    t = -1
    for t in range(args.episode_length):
        key = next(keys, None)
        if key == QUIT:
            break
        acts = np.asarray(heuristic_actions(params, state))
        acts[ctrl] = corridor_action_from_key(key, table)
        state, ts = e.step(state, jnp.asarray(acts))
        total += np.asarray(ts.reward)
        st = jax.tree.map(np.asarray, state)
        heading = np.asarray(dynamics.heading_of(state.agent_states, params.cfg))
        if live:
            frame = ascii_frame(
                st.agent_states[:, :2], heading, st.landmark_pos,
                st.tube.entrance, st.tube.exit, params.world_size,
                st.status, ctrl,
            )
            sys.stdout.write("\x1b[H\x1b[2J" + frame)
            sys.stdout.write(
                f"\nstep {t+1}/{args.episode_length}  key={key or '-'}  "
                f"return {np.round(total, 1)}  [arrows/wasd, space coast, q quit]\n"
            )
            sys.stdout.flush()
        frames.append(
            render_frame(
                st.agent_states[:, :2], heading, st.landmark_pos,
                np.asarray(st.tube.entrance), np.asarray(st.tube.exit),
                float(st.tube.half_width), world_size=params.world_size,
                status=st.status,
            )
        )
        if bool(np.asarray(ts.done).all()):
            break
    out = os.path.join(args.run_dir, "interactive.gif")
    os.makedirs(args.run_dir, exist_ok=True)
    save_gif(frames, out)
    print(f"\ninteractive: {t+1} steps, per-agent return {np.round(total, 1)}, gif -> {out}")
    return out
