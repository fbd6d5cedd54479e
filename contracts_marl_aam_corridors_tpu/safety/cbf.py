"""Control-barrier-function safety filtering as closed-form batched ops.

The reference solves a tiny QP per agent per step through cvxpy
(multiagent/safety_filter.py ``cbf_qp``:287-309, 493-505).  The QP has ONE
linear inequality constraint, so its solution is the analytic projection

    min (u - u_ref)^T W (u - u_ref)  s.t.  a^T u + b >= 0
    u* = u_ref + max(0, -(a^T u_ref + b)) * W^{-1} a / (a^T W^{-1} a)

— no solver, no host round-trip, fully vmappable.

``di_exp_cbf_filter`` is the double-integrator exponential-CBF handle
(safety_filter.py:436-548): closed-form barrier value and Lie derivatives, no
HJ data required.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.physics import VehicleConfig

Array = jax.Array


def cbf_qp_analytic(u_ref: Array, a: Array, b: Array, w_diag: Array) -> Array:
    """Closed-form single-constraint weighted QP (see module docstring).

    u_ref: (..., m) reference control; a: (..., m) constraint gradient;
    b: (...,) constraint offset; w_diag: (..., m) objective weights.
    Degenerate a (all zero) returns u_ref, matching cvxpy's infeasible->u_ref
    fallback (safety_filter.py:305-307).
    """
    winv_a = a / w_diag
    denom = jnp.sum(a * winv_a, axis=-1)
    viol = -(jnp.sum(a * u_ref, axis=-1) + b)
    lam = jnp.where(denom > 1e-12, jnp.maximum(viol, 0.0) / jnp.maximum(denom, 1e-12), 0.0)
    return u_ref + lam[..., None] * winv_a


def _di_cbf_terms(rel: Array, sep: float, rate: float):
    """Barrier value + Lie derivatives for the DI exponential CBF
    (safety_filter.py:470-483).  rel = [x_r, y_r, dvx, dvy] (ego - other)."""
    d = jnp.sqrt(rel[..., 0] ** 2 + rel[..., 1] ** 2)
    d = jnp.maximum(d, 1e-9)
    ddist = (rel[..., 0] * rel[..., 2] + rel[..., 1] * rel[..., 3]) / d
    value = ddist + rate * (d - sep)
    lf = rate * ddist + (rel[..., 0] * rel[..., 3] - rel[..., 1] * rel[..., 2]) ** 2 / d**3
    lg = jnp.stack(
        [rel[..., 0] / d, rel[..., 1] / d, -rel[..., 0] / d, -rel[..., 1] / d],
        axis=-1,
    )
    return value, lf, lg


def _di_clip_bounds(vel: Array, cfg: VehicleConfig):
    """Per-axis accel clipping near velocity bounds
    (safety_filter.py:455-466): the bound collapses to 0 when one more step
    at max accel would exceed the velocity limit."""
    amax = jnp.where(vel < cfg.v_max - cfg.dt * cfg.accel_max, cfg.accel_max, 0.0)
    amin = jnp.where(vel > -cfg.v_max - cfg.dt * cfg.accel_min, cfg.accel_min, 0.0)
    return amin, amax


def di_exp_cbf_filter(
    states: Array, actions: Array, cfg: VehicleConfig, active: Array | None = None
):
    """Exponential-CBF filter for all double-integrator agents at once.

    states: (N, 4) [x, y, vx, vy]; actions: (N, 2) [ax, ay].
    Returns (filtered_actions, filtered_flags, action_diff, min_agent_index),
    replicating ``DoubleIntegratorSafetyHandleWithExponentialCBF
    .apply_safety_filter`` (safety_filter.py:507-548) per ego agent:
    pick the min-CBF-value OTHER agent; if the min-DISTANCE other agent is
    within coordination range, project [u_ego, u_other] onto the constraint
    and take the ego half; clip near velocity bounds.
    """
    n = states.shape[0]
    dtype = states.dtype
    eye = jnp.eye(n, dtype=bool)

    rel = states[:, None, :] - states[None, :, :]  # ego - other
    dist = jnp.linalg.norm(rel[..., :2], axis=-1)
    value, lf, lg = _di_cbf_terms(rel, cfg.separation_distance, cfg.cbf_rate)

    inf = jnp.asarray(jnp.inf, dtype)
    dist_o = jnp.where(eye, inf, dist)
    value_o = jnp.where(eye, inf, value)
    if active is not None:
        # done agents are excluded from the world's agent sweep upstream
        dist_o = jnp.where(active[None, :], dist_o, inf)
        value_o = jnp.where(active[None, :], value_o, inf)

    min_by_dist = jnp.min(dist_o, axis=1)
    j = jnp.argmin(value_o, axis=1)  # min-value neighbor (safety_filter.py:527)

    # one-hot selections (batched dynamic gathers under vmap SEGV the TPU
    # compile helper)
    onehot = jax.nn.one_hot(j, n, dtype=dtype)
    rel_j = jnp.einsum("nk,nkf->nf", onehot, rel)
    value_j, lf_j, lg_j = _di_cbf_terms(rel_j, cfg.separation_distance, cfg.cbf_rate)

    u_ref = jnp.concatenate([actions, onehot @ actions], axis=-1)  # (N, 4)
    b = lf_j + cfg.cbf_rate * value_j
    u = cbf_qp_analytic(u_ref, lg_j, b, jnp.ones_like(u_ref))

    # clip ego's half near the velocity bounds (ref clips using the RELATIVE
    # state's velocity slots — a quirk preserved: state[2:4] of rel)
    amin_x, amax_x = _di_clip_bounds(rel_j[:, 2], cfg)
    amin_y, amax_y = _di_clip_bounds(rel_j[:, 3], cfg)
    u = u.at[:, 0].set(jnp.clip(u[:, 0], amin_x, amax_x))
    u = u.at[:, 1].set(jnp.clip(u[:, 1], amin_y, amax_y))

    in_range = min_by_dist <= cfg.coordination_range
    diff_full = jnp.linalg.norm(u - u_ref, axis=-1)
    filtered = in_range & (diff_full > 1e-4)
    out = jnp.where(in_range[:, None], u[:, :2], actions).astype(actions.dtype)
    action_diff = jnp.linalg.norm(actions - out, axis=-1).astype(actions.dtype)
    return out, filtered, action_diff, j
