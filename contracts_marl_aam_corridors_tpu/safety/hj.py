"""Hamilton-Jacobi reachability safety filter for the air-taxi model.

TPU-native redesign of ``AirTaxiSafetyHandle`` (multiagent/safety_filter.py
:176-309): the HJ value function lives as a dense 5-D grid (relative state
[x_r, y_r, dtheta, v_a, v_b]) with precomputed gradients; lookup is batched
multilinear interpolation; the least-restrictive logic (optimal evasive
control when V < eps, else CBF-QP) is a ``where`` ladder over closed forms —
no cvxpy, no per-agent Python.

The reference loads its value function from ``data/airtaxi_value_function.pkl``
(NOT shipped in the repo, multiagent/config.py:32).  ``load_hj_pickle``
replicates ``HjDataHandle`` (:154-174) for users who have the file;
``make_synthetic_airtaxi_hj`` builds a distance-based stand-in for tests.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..config.physics import VehicleConfig
from .cbf import cbf_qp_analytic

Array = jax.Array

EPS_HJ = 0.4  # safety_filter.py:236


@struct.dataclass
class HjValueData:
    lo: Array  # (5,)
    hi: Array  # (5,)
    values: Array  # grid shape
    grads: Array  # grid shape + (5,)
    separation_distance: float = struct.field(pytree_node=False, default=0.4572)


def interpolate(data_lo, data_hi, table: Array, x: Array) -> tuple[Array, Array]:
    """Batched multilinear interpolation on a rectangular grid.

    table: (*grid_shape, ...) — trailing dims are interpolated channelwise.
    x: (..., d).  Returns (value, in_range) where in_range mirrors the
    reference's NaN/exception -> "out of hj range" handling (:195-201).
    """
    d = x.shape[-1]
    shape = jnp.asarray(table.shape[:d])
    lo = jnp.asarray(data_lo)
    hi = jnp.asarray(data_hi)
    in_range = jnp.all((x >= lo) & (x <= hi), axis=-1)
    t = (x - lo) / (hi - lo) * (shape - 1)
    t = jnp.clip(t, 0, shape - 1)
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, shape - 2)
    frac = t - i0

    # flat linear-index gathers (one per corner): multi-dimensional advanced
    # indexing under vmap generates gather HLOs that SEGV the TPU compiler at
    # ~100 pairwise lookups; jnp.take over a flattened table lowers cleanly
    grid_shape = table.shape[:d]
    strides = np.cumprod((grid_shape[1:] + (1,))[::-1])[::-1].copy()
    strides = jnp.asarray(strides)
    table_flat = table.reshape((-1,) + table.shape[d:])

    out = None
    for corner in range(2**d):
        bits = jnp.asarray([(corner >> k) & 1 for k in range(d)])
        idx = i0 + bits
        w = jnp.prod(jnp.where(bits == 1, frac, 1.0 - frac), axis=-1)
        lin = jnp.sum(idx * strides, axis=-1)
        val = jnp.take(table_flat, lin, axis=0)
        contrib = w[..., None] * val if val.ndim > w.ndim else w * val
        out = contrib if out is None else out + contrib
    return out, in_range


def relative_state_airtaxi(ego: Array, other: Array) -> Array:
    """5-D relative state (safety_filter.py ``get_relative_state``:279-285)."""
    dx = other[..., 0] - ego[..., 0]
    dy = other[..., 1] - ego[..., 1]
    dist = jnp.sqrt(dx**2 + dy**2)
    ang = jnp.arctan2(dy, dx)
    x_r = dist * jnp.cos(ang - ego[..., 2])
    y_r = dist * jnp.sin(ang - ego[..., 2])
    comps = jnp.broadcast_arrays(
        x_r, y_r, other[..., 2] - ego[..., 2], ego[..., 3], other[..., 3]
    )
    return jnp.stack(comps, axis=-1)


def _control_jacobian(rel: Array) -> Array:
    """B(x) for the Air4d relative dynamics (safety_filter.py:54-60).
    Controls: [w_a, w_b, a_a, a_b]."""
    z = jnp.zeros_like(rel[..., 0])
    one = jnp.ones_like(z)
    return jnp.stack(
        [
            jnp.stack([rel[..., 1], z, z, z], -1),
            jnp.stack([-rel[..., 0], z, z, z], -1),
            jnp.stack([-one, one, z, z], -1),
            jnp.stack([z, z, one, z], -1),
            jnp.stack([z, z, z, one], -1),
        ],
        axis=-2,
    )  # (..., 5, 4)


def _open_loop(rel: Array) -> Array:
    """f(x) (safety_filter.py:42-51)."""
    th, va, vb = rel[..., 2], rel[..., 3], rel[..., 4]
    z = jnp.zeros_like(th)
    return jnp.stack([-va + vb * jnp.cos(th), vb * jnp.sin(th), z, z, z], axis=-1)


def _optimal_control(rel: Array, grad: Array, cfg: VehicleConfig) -> Array:
    """Bang-bang evasive control from the value gradient
    (safety_filter.py ``optimal_control_and_disturbance``:64-85, mode 'max'),
    including the speed-bound box shrinking."""
    direction = jnp.einsum("...i,...ij->...j", grad, _control_jacobian(rel))
    batch = rel.shape[:-1]
    dt = rel.dtype
    lo = jnp.broadcast_to(
        jnp.asarray(
            [-cfg.angular_rate_max, -cfg.angular_rate_max, cfg.accel_min, cfg.accel_min],
            dt,
        ),
        batch + (4,),
    )
    hi = jnp.broadcast_to(
        jnp.asarray(
            [cfg.angular_rate_max, cfg.angular_rate_max, cfg.accel_max, cfg.accel_max],
            dt,
        ),
        batch + (4,),
    )
    # box shrinking at the speed bounds (ego accel slot 2, other slot 3)
    lo = lo.at[..., 2].set(jnp.where(rel[..., 3] <= cfg.v_min, 0.0, lo[..., 2]))
    hi = hi.at[..., 2].set(jnp.where(rel[..., 3] >= cfg.v_max, 0.0, hi[..., 2]))
    lo = lo.at[..., 3].set(jnp.where(rel[..., 4] <= cfg.v_min, 0.0, lo[..., 3]))
    hi = hi.at[..., 3].set(jnp.where(rel[..., 4] >= cfg.v_max, 0.0, hi[..., 3]))
    return jnp.where(direction > 0, hi, lo)


def airtaxi_hj_filter(
    states: Array,
    actions: Array,
    hj: HjValueData,
    cfg: VehicleConfig,
    active: Array | None = None,
):
    """Least-restrictive HJ filter for all air-taxi agents at once
    (``apply_safety_filter``, safety_filter.py:203-263).

    states: (N, 4) [x, y, theta, v]; actions: (N, 2) [w, a].
    Returns (filtered_actions, filtered_flags, action_diff, min_value_index).
    """
    n = states.shape[0]
    dtype = states.dtype
    eye = jnp.eye(n, dtype=bool)

    rel = relative_state_airtaxi(states[:, None, :], states[None, :, :])  # (N,N,5)
    dist = jnp.linalg.norm(
        states[None, :, :2] - states[:, None, :2], axis=-1
    )
    values, in_range = interpolate(hj.lo, hj.hi, hj.values, rel)
    values = jnp.where(in_range, values, jnp.inf)

    inf = jnp.asarray(jnp.inf, dtype)
    dist_o = jnp.where(eye, inf, dist)
    values_o = jnp.where(eye, inf, values)
    if active is not None:
        dist_o = jnp.where(active[None, :], dist_o, inf)
        values_o = jnp.where(active[None, :], values_o, inf)

    min_by_dist = jnp.min(dist_o, axis=1)
    j = jnp.argmin(values_o, axis=1)

    # per-row selections as one-hot matmuls: batched dynamic gathers under
    # vmap SEGV the TPU compile helper (and are slow anyway at tiny N)
    onehot = jax.nn.one_hot(j, n, dtype=dtype)  # (N, N)
    rel_j = jnp.einsum("nk,nkf->nf", onehot, rel)
    value_j = jnp.min(values_o, axis=1)  # value at j == the min (inf-safe)
    range_j = jnp.sum(onehot * (in_range & ~eye), axis=1) > 0.5
    grad_j, _ = interpolate(hj.lo, hj.hi, hj.grads, rel_j)

    actions_j = onehot @ actions
    u_ref = jnp.concatenate([actions, actions_j], axis=-1)  # (N,4) [w_a,a_a,w_b,a_b]
    # reorder into the HJ control layout [w_a, w_b, a_a, a_b]
    u_ref_hj = jnp.stack([u_ref[:, 0], u_ref[:, 2], u_ref[:, 1], u_ref[:, 3]], axis=-1)

    # branch 1: optimal evasive control when V < eps (safety_filter.py:250-252)
    u_opt = _optimal_control(rel_j, grad_j, cfg)

    # branch 2: CBF-QP (cbf_qp:287-309) — objective weights by x_r sign
    a_con = jnp.einsum("ni,nij->nj", grad_j, _control_jacobian(rel_j))
    b_con = jnp.einsum("ni,ni->n", grad_j, _open_loop(rel_j)) + cfg.cbf_rate * jnp.where(
        jnp.isfinite(value_j), value_j, 0.0
    )
    w_neg = jnp.asarray([100.0, 10.0, 10.0, 1.0], dtype)
    w_pos = jnp.asarray([10.0, 1.0, 100.0, 10.0], dtype)
    w = jnp.where((rel_j[:, 0] < 0)[:, None], w_neg, w_pos)
    u_qp = cbf_qp_analytic(u_ref_hj, a_con, b_con, w)
    # QP path clips angular rates (safety_filter.py:307-309)
    u_qp = u_qp.at[:, 0].set(jnp.clip(u_qp[:, 0], -cfg.angular_rate_max, cfg.angular_rate_max))
    u_qp = u_qp.at[:, 1].set(jnp.clip(u_qp[:, 1], -cfg.angular_rate_max, cfg.angular_rate_max))

    u = jnp.where((value_j < EPS_HJ)[:, None], u_opt, u_qp)

    # accel clipping near speed bounds (clip_ctrl_with_valid_control_bound)
    def clip_acc(acc, v):
        amax = jnp.where(v < cfg.v_max - cfg.dt * cfg.accel_max, cfg.accel_max, 0.0)
        amin = jnp.where(v > cfg.v_min - cfg.dt * cfg.accel_min, cfg.accel_min, 0.0)
        return jnp.clip(acc, amin, amax).astype(acc.dtype)

    u = u.at[:, 2].set(clip_acc(u[:, 2], rel_j[:, 3]))
    u = u.at[:, 3].set(clip_acc(u[:, 3], rel_j[:, 4]))

    apply = (min_by_dist <= cfg.coordination_range) & range_j
    diff_full = jnp.linalg.norm(u - u_ref_hj, axis=-1)
    filtered = apply & (diff_full > 1e-4)
    ego_u = jnp.stack([u[:, 0], u[:, 2]], axis=-1)  # back to [w_a, a_a]
    out = jnp.where(apply[:, None], ego_u, actions).astype(actions.dtype)
    action_diff = jnp.linalg.norm(actions - out, axis=-1).astype(actions.dtype)
    return out, filtered, action_diff, j


def make_synthetic_airtaxi_hj(
    cfg: VehicleConfig,
    shape: Sequence[int] = (21, 21, 9, 5, 5),
    span: float = 3.0,
) -> HjValueData:
    """Distance-based stand-in value function for tests/demos:
    V(x) = ||[x_r, y_r]|| - separation_distance (positive = safe)."""
    lo = np.array([-span, -span, -np.pi, cfg.v_min, cfg.v_min])
    hi = np.array([span, span, np.pi, cfg.v_max, cfg.v_max])
    axes = [np.linspace(lo[k], hi[k], shape[k]) for k in range(5)]
    mesh = np.meshgrid(*axes, indexing="ij")
    values = np.sqrt(mesh[0] ** 2 + mesh[1] ** 2) - cfg.separation_distance
    grads = np.stack(np.gradient(values, *[ax for ax in axes]), axis=-1)
    return HjValueData(
        lo=jnp.asarray(lo),
        hi=jnp.asarray(hi),
        values=jnp.asarray(values),
        grads=jnp.asarray(grads),
        separation_distance=cfg.separation_distance,
    )


def load_hj_pickle(path: str, target_separation_distance: float) -> HjValueData:
    """Replicates ``HjDataHandle`` (safety_filter.py:154-174): negate the
    stored values (stored negative-inside-safe-set), shift by the separation
    delta, precompute gradients.  Requires a pickle with ``grid_meta_data``
    (axis los/his/shape) and ``values``; the hj_reachability package itself is
    not needed when the pickle stores plain arrays."""
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f)
    original = data.info["separation_distance"]
    shift = target_separation_distance - original
    meta = data.grid_meta_data
    lo = np.asarray(meta["lo"] if isinstance(meta, dict) else meta.lo)
    hi = np.asarray(meta["hi"] if isinstance(meta, dict) else meta.hi)
    values = -np.asarray(data.values) - shift
    axes = [np.linspace(lo[k], hi[k], values.shape[k]) for k in range(values.ndim)]
    grads = np.stack(np.gradient(values, *axes), axis=-1)
    return HjValueData(
        lo=jnp.asarray(lo),
        hi=jnp.asarray(hi),
        values=jnp.asarray(values),
        grads=jnp.asarray(grads),
        separation_distance=target_separation_distance,
    )
