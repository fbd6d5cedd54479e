"""Rotated-corridor ("tube") geometry and the 3-phase state machine.

Pure-array counterparts of the reference scenario helpers:
``setup_tube_params`` (july:518-613), ``_tube_coords``/``_in_tube_rect``/
``_in_entrance_gate``/``_entrance_gate_distance`` (july:616-645) and
``get_agent_phase`` (july:683-733).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import TubeParams

Array = jax.Array

EPS = 0.05


def make_tube(
    angle: Array,
    world_size: float,
    agent_size: float,
    dtype=jnp.float64,
    length: Array | None = None,
) -> TubeParams:
    """Build tube geometry for a sampled rotation angle.

    Mirrors july:518-613: width = max(3*agent_size*2.5*2? — note the
    reference computes ``3 * agents[0].size * 2.5`` with size .06 -> 0.45?
    No: ``max(3*size*2.5, world_size*0.15)``; length = 0.8*world_size;
    entrance/exit are ±length/4 rotated about the origin.
    """
    angle = jnp.asarray(angle, dtype)
    width = jnp.maximum(3 * agent_size * 2.5, world_size * 0.15)
    width = jnp.asarray(width, dtype)
    if length is None:
        length = jnp.asarray(world_size * 0.8, dtype)
    else:
        length = jnp.asarray(length, dtype)
    # rotation matrix [[cos, sin], [-sin, cos]] applied to (0, ±length/4)
    c, s = jnp.cos(angle), jnp.sin(angle)
    entrance = jnp.stack([s * (length / 4), c * (length / 4)])
    exit_ = -entrance
    span = exit_ - entrance
    frame_length = jnp.linalg.norm(span) + 1e-9
    e = span / frame_length
    n = jnp.stack([-e[1], e[0]])
    return TubeParams(
        entrance=entrance.astype(dtype),
        exit=exit_.astype(dtype),
        width=width,
        angle=angle,
        length=length,
        e=e.astype(dtype),
        n=n.astype(dtype),
        frame_length=frame_length.astype(dtype),
        half_width=(width * 0.5).astype(dtype),
    )


def tube_coords(tube: TubeParams, pos: Array) -> tuple[Array, Array]:
    """Longitudinal s (from entrance, along e) and signed lateral y for (...,2) pos.

    The reference rounds the position to float32 (july:624 ``np.asarray(pos,
    dtype=np.float32)``) and stores the normal in float32 (july:602), but the
    subtraction/dots then promote back to float64; we replicate that exact
    mixed precision so gate/phase decisions flip at identical thresholds.
    """
    dtype = tube.entrance.dtype
    r = pos.astype(jnp.float32).astype(dtype) - tube.entrance
    s = r @ tube.e
    y = r @ tube.n.astype(jnp.float32).astype(dtype)
    return s, y


def in_tube_rect(tube: TubeParams, s: Array, y: Array) -> Array:
    L = tube.frame_length
    return (-EPS <= s) & (s <= L + EPS) & (jnp.abs(y) <= tube.half_width + EPS)


def in_entrance_gate(
    tube: TubeParams, s: Array, y: Array, gate_front_ratio: float, gate_back_ratio: float
) -> Array:
    L = tube.frame_length
    gate_front = gate_front_ratio * L
    gate_back = gate_back_ratio * L
    return (
        (-gate_back - EPS <= s)
        & (s <= gate_front + EPS)
        & (jnp.abs(y) <= tube.half_width + EPS)
    )


def entrance_gate_distance(tube: TubeParams, s: Array, y: Array) -> Array:
    clamped_y = jnp.clip(y, -tube.half_width, tube.half_width)
    return jnp.hypot(jnp.abs(s), y - clamped_y)


def in_exit_gate(
    tube: TubeParams, s: Array, y: Array, exit_back_ratio: float, exit_front_ratio: float
) -> Array:
    """Full-width exit gate: s in [L-exit_back, L+exit_front] (rot_inv:655-659)."""
    L = tube.frame_length
    return (
        (L - exit_back_ratio * L - EPS <= s)
        & (s <= L + exit_front_ratio * L + EPS)
        & (jnp.abs(y) <= tube.half_width + EPS)
    )


def exit_gate_distance(tube: TubeParams, s: Array, y: Array) -> Array:
    """Distance to the exit edge, forward-only (rot_inv:662-672)."""
    clamped_y = jnp.clip(y, -tube.half_width, tube.half_width)
    ds = jnp.maximum(0.0, tube.frame_length - s)
    return jnp.hypot(ds, y - clamped_y)


def agent_phase_gated(
    tube: TubeParams,
    pos: Array,
    prev_phase: Array,
    phase_reached: Array,
    gate_front_ratio: float,
    gate_back_ratio: float,
    exit_back_ratio: float,
    exit_front_ratio: float,
    in_tube_exit_levels: int = 0,
) -> Array:
    """Exit-gated phase machine shared by rot_inv / two_phase / three_phase
    (rot_inv ``get_agent_phase``:681-733, two_phase variant).

    Differences from the july machine: ``passed`` is ``s > L`` (not a dot
    against the exit point), phase 2 additionally requires the agent to be in
    the EXIT GATE (or already in phase 2) and ``phase_reached >= 1``, and no
    ``previous_phase`` mutation happens inside the call.

    ``in_tube_exit_levels``: 0 = exit only past the tube (rot_inv);
    1 = prev==1 & valid_exit returns 2 even while in-tube (two_phase);
    2 = also prev==2 & valid_exit (three_phase).
    """
    s, y = tube_coords(tube, pos)
    in_tube = in_tube_rect(tube, s, y)
    passed = s > tube.frame_length
    valid_entrance = in_entrance_gate(tube, s, y, gate_front_ratio, gate_back_ratio)
    valid_exit = in_exit_gate(tube, s, y, exit_back_ratio, exit_front_ratio)

    phase_in = jnp.where(prev_phase == 0, jnp.where(valid_entrance, 1, 0), 1)
    if in_tube_exit_levels >= 1:
        exit_in_tube = (prev_phase == 1) & valid_exit
        if in_tube_exit_levels >= 2:
            exit_in_tube |= (prev_phase == 2) & valid_exit
        phase_in = jnp.where((prev_phase != 0) & exit_in_tube, 2, phase_in)

    phase_out = jnp.where(
        (phase_reached >= 1)
        & (((prev_phase == 1) & valid_exit) | (prev_phase == 2)),
        2,
        0,
    )
    return jnp.where(
        ~in_tube & ~passed,
        0,
        jnp.where(in_tube, phase_in, jnp.where(passed, phase_out, 0)),
    ).astype(prev_phase.dtype)


def passed_tube(tube: TubeParams, pos: Array) -> Array:
    """dot(pos - exit, unit(exit-entrance)) > 0 (july:688-691).

    Note the reference normalizes exit-entrance *without* the 1e-9 epsilon
    here (unlike the cached frame 'e'), in float64; replicate that.
    """
    span = tube.exit - tube.entrance
    direction = span / jnp.linalg.norm(span)
    return (pos - tube.exit) @ direction > 0


def entrance_projection(tube: TubeParams, pos: Array) -> tuple[Array, Array]:
    """(proj, perp_dist) of pos relative to entrance along the tube direction.

    Used by the phase-1 entry-bonus condition (july:1151-1158), computed in
    float64 like the reference (no float32 cast on this path).
    """
    span = tube.exit - tube.entrance
    direction = span / jnp.linalg.norm(span)
    rel = pos - tube.entrance
    proj = rel @ direction
    perp = jnp.linalg.norm(rel - proj[..., None] * direction, axis=-1)
    return proj, perp


def agent_phase(
    tube: TubeParams,
    pos: Array,
    prev_phase: Array,
    gate_front_ratio: float,
    gate_back_ratio: float,
) -> tuple[Array, Array]:
    """One evaluation of the reference phase machine (july:683-733).

    Returns ``(phase, new_prev_phase)``.  The reference mutates
    ``agent.previous_phase`` in exactly one branch — the 1->2 exit transition
    (july:724-728); every other branch leaves it unchanged (``reward`` later
    overwrites it with the current phase).  Each call also decrements the
    entry cooldown; the caller handles that (it is scenario state).
    """
    s, y = tube_coords(tube, pos)
    in_tube = in_tube_rect(tube, s, y)
    passed = passed_tube(tube, pos)
    valid_entrance = in_entrance_gate(tube, s, y, gate_front_ratio, gate_back_ratio)

    # Branch structure (0-indexed phases):
    #   not in_tube and not passed      -> 0
    #   in_tube: prev==0 -> 1 if valid_entrance else 0 ; prev>0 -> 1
    #   else (past the exit plane): prev==1 -> 2 (and prev:=2)
    #                               prev==2 and passed -> 2
    #                               otherwise -> 0
    phase_pre = jnp.where(~in_tube & ~passed, 0, -1)
    phase_in = jnp.where(prev_phase == 0, jnp.where(valid_entrance, 1, 0), 1)
    phase_out = jnp.where(
        (prev_phase == 1) | ((prev_phase == 2) & passed), 2, 0
    )
    phase = jnp.where(
        ~in_tube & ~passed, 0, jnp.where(in_tube, phase_in, phase_out)
    )
    # mutation: only on the prev==1 -> 2 exit branch
    exited = (~in_tube) & (~(~in_tube & ~passed)) & (prev_phase == 1) & passed
    # note: reference's `if prev==1: if passed: prev=2; return 2` — the branch
    # is only reached when not in_tube and not(pre-tube), and returns 2 only
    # when passed; if prev==1 and not passed it falls through to return 0.
    phase = jnp.where(
        (~in_tube) & ~(~in_tube & ~passed) & (prev_phase == 1) & ~passed, 0, phase
    )
    new_prev = jnp.where(exited, 2, prev_phase)
    return phase.astype(prev_phase.dtype), new_prev


def agent_phase_v4oct(tube: TubeParams, pos: Array) -> Array:
    """v4oct ``get_agent_phase`` (v4oct:627-670) with ``previous_phase``
    pinned at 0.

    The reward code that would advance ``agent.previous_phase`` sits after an
    unconditional ``return`` (v4oct:938-1146, dead), and ``get_agent_phase``'s
    own 1->2 mutation requires prev==1, so prev stays 0 forever.  Effective
    machine: phase 1 iff inside the tube AND inside the un-gated entrance
    region (proj in [0, 0.1L), perp < width/2); otherwise 0.  Phase 2 is
    unreachable.  ``is_in_tube_fast`` (v4oct:82-110) uses inclusive bounds
    and NO epsilon, unlike july's eps=0.05 rectangle.
    """
    span = tube.exit - tube.entrance
    L = jnp.linalg.norm(span)
    direction = span / L
    rel = pos - tube.entrance
    proj = rel @ direction
    perp = jnp.linalg.norm(rel - proj[..., None] * direction, axis=-1)
    half = tube.width * 0.5
    in_tube = (proj >= 0) & (proj <= L) & (perp <= half)
    valid_entrance = (proj >= 0) & (proj < 0.1 * L) & (perp < half)
    return (in_tube & valid_entrance).astype(jnp.int32)
