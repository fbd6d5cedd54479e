"""Episode rendering to PNG frames / animated GIF via PIL.

Replaces the reference's pyglet viewer (multiagent/rendering.py) and the
render loop's imageio GIF export (graph_mpe_runner.py:525-1060): draws the
rotated corridor, entrance/exit gates, landmarks, and heading-oriented
aircraft triangles.  Pure host-side; consumes numpy snapshots of EnvState.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

AGENT_COLORS = [
    (66, 135, 245), (245, 130, 48), (60, 180, 75), (230, 25, 75),
    (145, 30, 180), (70, 240, 240), (240, 50, 230), (210, 245, 60),
    (0, 128, 128), (170, 110, 40),
]


def _to_px(p, world_size: float, size: int):
    x = (p[0] / world_size + 1.0) * 0.5 * size
    y = (1.0 - (p[1] / world_size + 1.0) * 0.5) * size
    return (float(x), float(y))


def render_frame(
    agent_pos: np.ndarray,
    agent_heading: np.ndarray,
    landmark_pos: np.ndarray,
    tube_entrance: np.ndarray,
    tube_exit: np.ndarray,
    tube_half_width: float,
    world_size: float = 2.0,
    size: int = 512,
    status: Optional[np.ndarray] = None,
):
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (size, size), (255, 255, 255))
    d = ImageDraw.Draw(img)

    e = tube_exit - tube_entrance
    L = np.linalg.norm(e) + 1e-9
    e = e / L
    n = np.array([-e[1], e[0]])
    corners = [
        tube_entrance + n * tube_half_width,
        tube_exit + n * tube_half_width,
        tube_exit - n * tube_half_width,
        tube_entrance - n * tube_half_width,
    ]
    d.polygon([_to_px(c, world_size, size) for c in corners],
              fill=(235, 240, 250), outline=(120, 140, 180))
    for gate, col in ((tube_entrance, (60, 160, 60)), (tube_exit, (180, 60, 60))):
        a = _to_px(gate + n * tube_half_width, world_size, size)
        b = _to_px(gate - n * tube_half_width, world_size, size)
        d.line([a, b], fill=col, width=3)

    for lm in np.atleast_2d(landmark_pos):
        cx, cy = _to_px(lm, world_size, size)
        r = 0.035 / world_size * size
        d.ellipse([cx - r, cy - r, cx + r, cy + r], fill=(250, 220, 90), outline=(0, 0, 0))

    for i, (p, th) in enumerate(zip(np.atleast_2d(agent_pos), np.atleast_1d(agent_heading))):
        col = AGENT_COLORS[i % len(AGENT_COLORS)]
        if status is not None and status[i]:
            col = tuple(int(c * 0.45 + 140) for c in col)
        s = 0.05 / world_size * size
        nose = p + 0.06 * np.array([np.cos(th), np.sin(th)])
        left = p + 0.035 * np.array([np.cos(th + 2.5), np.sin(th + 2.5)])
        right = p + 0.035 * np.array([np.cos(th - 2.5), np.sin(th - 2.5)])
        d.polygon(
            [_to_px(nose, world_size, size), _to_px(left, world_size, size),
             _to_px(right, world_size, size)],
            fill=col, outline=(0, 0, 0),
        )
    return img


def save_gif(frames: List, path: str, fps: float = 10.0):
    if not frames:
        return
    frames[0].save(
        path,
        save_all=True,
        append_images=frames[1:],
        duration=int(1000 / fps),
        loop=0,
    )


def read_gif(path: str):
    """GIF -> list of RGB numpy frames (replaces the reference's imageio-based
    ``read_gif.py`` analysis script)."""
    from PIL import Image, ImageSequence

    with Image.open(path) as im:
        return [np.asarray(f.convert("RGB")).copy() for f in ImageSequence.Iterator(im)]


def tile_images(img_nhwc):
    """Tile N images into one near-square grid (reference ``tile_images``,
    onpolicy/utils/util.py:55-73), used to compose multi-env render frames."""
    import numpy as np

    img_nhwc = np.asarray(img_nhwc)
    N, h, w, c = img_nhwc.shape
    H = int(np.ceil(np.sqrt(N)))
    W = int(np.ceil(float(N) / H))
    img_nhwc = np.array(list(img_nhwc) + [img_nhwc[0] * 0 for _ in range(N, H * W)])
    return (
        img_nhwc.reshape(H, W, h, w, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(H * h, W * w, c)
    )


def render_mpe_frame(
    agent_pos: np.ndarray,
    landmark_pos: np.ndarray,
    agent_sizes=None,
    landmark_sizes=None,
    world_size: float = 1.0,
    size: int = 512,
    adversary_mask=None,
):
    """Classic-MPE frame (reference vendored pyglet render,
    onpolicy/envs/mpe/environment.py:300-430): filled circles for agents
    (red = adversaries, blue = good) and gray circles for landmarks, in a
    [-world_size, world_size]^2 viewport."""
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (size, size), (255, 255, 255))
    d = ImageDraw.Draw(img)
    agent_pos = np.atleast_2d(agent_pos)
    landmark_pos = np.atleast_2d(landmark_pos)
    n = len(agent_pos)
    if agent_sizes is None:
        agent_sizes = np.full((n,), 0.05)
    if landmark_sizes is None:
        landmark_sizes = np.full((len(landmark_pos),), 0.05)

    def px(p):
        return _to_px(p, world_size, size)

    def circle(c, r_world, fill, outline):
        cx, cy = px(c)
        r = r_world / world_size * 0.5 * size
        d.ellipse([cx - r, cy - r, cx + r, cy + r], fill=fill, outline=outline)

    for lm, r in zip(landmark_pos, landmark_sizes):
        circle(lm, r, (190, 190, 190), (120, 120, 120))
    for i, (p, r) in enumerate(zip(agent_pos, agent_sizes)):
        if adversary_mask is not None and bool(np.asarray(adversary_mask)[i]):
            col = (214, 69, 65)
        else:
            col = AGENT_COLORS[i % len(AGENT_COLORS)]
        circle(p, r, col, (40, 40, 40))
    return img
