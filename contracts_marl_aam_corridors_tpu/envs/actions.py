"""Discrete action decoding as precomputed lookup tables.

The reference decodes a one-hot action per agent per step in Python
(``multiagent/environment.py:336-475`` ``_set_action``).  Decoding is a pure
function of the action index, so here the whole map is a static ``(A, 2)``
table built once; the hot path is a single gather.

Semantics replicated exactly:

* Unicycle/AirTaxi (environment.py:424-459): ``angle_rate_index = argmax //
  accel_options``, ``accel_index = argmax % accel_options`` over
  ``linspace(-w_max, w_max, angrate_options)`` x ``linspace(a_min, a_max,
  accel_options)``.
* DoubleIntegrator, 5 actions (environment.py:398-401): one-hot weights
  combine as ``u = [a1 - a2, a3 - a4]`` i.e. index 1 -> +x, 2 -> -x,
  3 -> +y, 4 -> -y, 0 -> stop.
* DoubleIntegrator, 9 actions (environment.py:372-392): the compass map
  [none, L, LD, D, RD, R, RU, U, LU] with 0.71 diagonals.
* Every decoded control is multiplied by ``sensitivity`` = 5.0
  (environment.py:460-463; ``agent.accel`` is never set in these scenarios).
  Note this applies to *all* dynamics, so the effective air-taxi angular rate
  is ±0.5 rad/s and acceleration in 5x[-0.001, 0.002] — a reference quirk we
  preserve for parity.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config.physics import DynamicsType, VehicleConfig

SENSITIVITY = 5.0

_DI_9_MAP = np.array(
    [
        [0.0, 0.0],
        [-1.0, 0.0],
        [-0.71, -0.71],
        [0.0, -1.0],
        [0.71, -0.71],
        [1.0, 0.0],
        [0.71, 0.71],
        [0.0, 1.0],
        [-0.71, 0.71],
    ]
)


def action_table(cfg: VehicleConfig, total_actions: int = 5) -> np.ndarray:
    """Return the static ``(A, 2)`` decoded-control table (sensitivity applied)."""
    if cfg.dynamics == DynamicsType.DOUBLE_INTEGRATOR:
        if total_actions == 5:
            table = np.array(
                [[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]]
            )
        elif total_actions == 9:
            table = _DI_9_MAP.copy()
        else:
            raise ValueError(f"double_integrator supports 5 or 9 actions, got {total_actions}")
    else:
        angle_rates = np.linspace(
            -cfg.angular_rate_max, cfg.angular_rate_max, cfg.angrate_options
        )
        accels = np.linspace(cfg.accel_min, cfg.accel_max, cfg.accel_options)
        idx = np.arange(cfg.num_motion_primitives)
        table = np.stack(
            [angle_rates[idx // cfg.accel_options], accels[idx % cfg.accel_options]],
            axis=-1,
        )
    return table * SENSITIVITY


def decode(action_idx: jax.Array, table: jax.Array) -> jax.Array:
    """Gather controls for integer action indices of any batch shape."""
    return jnp.take(table, action_idx, axis=0)


def stop_action_index(num_actions: int) -> int:
    """The 'stop' action the runner forces for done agents.

    Reference ``collect_with_mask`` (graph_mpe_runner.py:277) masks everything
    except ``action_space.n // 2``.
    """
    return num_actions // 2
