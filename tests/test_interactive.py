"""Interactive (keyboard) policy: the reference's ``InteractivePolicy``
(multiagent/policy.py:13-52) as a TTY/scripted-key driver (cli/interactive.py)."""
import numpy as np
import pytest

from contracts_marl_aam_corridors_tpu.cli import interactive as ia
from contracts_marl_aam_corridors_tpu.config.flags import parse_all


def _ref_discrete_action(move):
    """The reference's exact if-chain (multiagent/policy.py:26-31)."""
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


def test_mpe_mapping_matches_reference_for_all_flag_combos():
    for bits in range(16):
        move = [bool(bits >> i & 1) for i in range(4)]
        assert ia.mpe_action_from_keys(move) == _ref_discrete_action(move)


def test_key_to_move_flags_single_held_key():
    assert ia.key_to_move_flags(ia.LEFT) == [True, False, False, False]
    assert ia.key_to_move_flags(ia.DOWN) == [False, False, False, True]
    assert ia.key_to_move_flags(None) == [False] * 4
    # composed: key -> flags -> reference action
    assert ia.mpe_action_from_keys(ia.key_to_move_flags(ia.UP)) == 4


def test_corridor_key_mapping_picks_extreme_primitives():
    from contracts_marl_aam_corridors_tpu.envs.actions import action_table
    from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config

    table = np.asarray(action_table(vehicle_config("air_taxi"), 9))  # (9, 2)
    a_left = ia.corridor_action_from_key(ia.LEFT, table)
    a_right = ia.corridor_action_from_key(ia.RIGHT, table)
    a_up = ia.corridor_action_from_key(ia.UP, table)
    a_coast = ia.corridor_action_from_key(None, table)
    assert table[a_left, 0] == table[:, 0].max() and table[a_left, 0] > 0
    assert table[a_right, 0] == table[:, 0].min() and table[a_right, 0] < 0
    assert table[a_up, 1] == table[:, 1].max()
    assert np.allclose(table[a_coast], 0.0, atol=1e-9) or (
        np.abs(table[a_coast]).sum() == np.abs(table).sum(axis=1).min()
    )
    assert len({a_left, a_right, a_up, a_coast}) == 4


def test_ascii_frame_places_entities():
    frame = ia.ascii_frame(
        agent_pos=np.array([[0.0, 0.0], [1.0, 1.0]]),
        heading=np.array([0.0, np.pi / 2]),
        landmark_pos=np.array([[-1.0, -1.0]]),
        entrance=np.array([-2.0, 0.0]),
        exit_=np.array([2.0, 0.0]),
        world_size=4.0,
        status=np.array([0, 1]),
        control_agent=0,
        cols=32,
        rows=12,
    )
    lines = frame.split("\n")
    assert len(lines) == 14 and all(len(l) == 34 for l in lines)
    body = "\n".join(lines[1:-1])
    assert "→" in body  # controlled agent drawn as its heading arrow
    assert "x" in body  # frozen agent
    assert "*" in body and "[" in body and "]" in body


def test_scripted_interactive_episode(tmp_path):
    """End-to-end with a scripted key source (no TTY): the episode advances,
    the controlled agent obeys the keys, and a GIF lands in run_dir."""
    args = parse_all([
        "--scenario_name", "nav_graph_metered_single_corridor_rot_inv",
        "--dynamics_type", "air_taxi", "--num_agents=3", "--num_landmarks=3",
        "--episode_length", "6", "--total_actions", "9", "--world_size=4",
        "--interactive", "--control_agent", "0", "--seed", "3",
        "--run_dir", str(tmp_path),
    ])
    out = ia.run(args, key_source=[ia.UP, ia.UP, ia.LEFT, None, ia.QUIT])
    import os

    assert os.path.exists(out)


def test_tty_reader_refuses_without_tty(monkeypatch):
    import io

    monkeypatch.setattr("sys.stdin", io.StringIO(""))
    with pytest.raises(SystemExit):
        next(ia.tty_keys())


def test_tty_end_to_end_over_pty(tmp_path):
    """Full keyboard loop on a REAL pty: arrow escape sequences and wasd keys
    are read from the TTY, ANSI frames are written, 'q' quits, and the GIF is
    saved — the complete cli/interactive.py path, not just the pure helpers."""
    import os
    import pty
    import select
    import sys
    import time

    script = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from contracts_marl_aam_corridors_tpu.cli.demo import main;"
        "main(['--interactive','--scenario_name',"
        "'nav_graph_metered_single_corridor_rot_inv',"
        "'--dynamics_type','air_taxi','--num_agents=3','--num_landmarks=3',"
        "'--total_actions','9','--episode_length','12','--world_size=4',"
        f"'--ifi','0.05','--run_dir','{tmp_path}'])"
    )
    pid, fd = pty.fork()
    if pid == 0:  # child: becomes the demo with the pty as its TTY
        os.execvp(sys.executable, [sys.executable, "-u", "-c", script])

    out = b""
    keys = [b"\x1b[A", b"w", b"a", b"\x1b[C", b" "]
    sent = 0
    t0 = time.time()
    try:
        while time.time() - t0 < 240:
            r, _, _ = select.select([fd], [], [], 1.0)
            if not r:
                continue
            try:
                chunk = os.read(fd, 4096)
            except OSError:
                break
            if not chunk:
                break
            out += chunk
            if b"step" in out:
                if sent < len(keys):
                    os.write(fd, keys[sent])
                    sent += 1
                elif b"step 4" in out:
                    os.write(fd, b"q")
    finally:
        os.close(fd)
    _, status = os.waitpid(pid, 0)
    assert os.waitstatus_to_exitcode(status) == 0, out[-2000:]
    txt = out.decode(errors="replace")
    assert "key=up" in txt      # arrow escape sequence parsed
    assert "interactive:" in txt  # clean quit summary line
    assert (tmp_path / "interactive.gif").exists()
