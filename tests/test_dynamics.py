"""Dynamics parity tests against scipy's RK45 (the reference's integrator).

The reference integrates each agent with ``scipy.integrate.solve_ivp(...,
method='RK45')`` per step (multiagent/core.py:125-139, 207-218, 300-316).
These tests check that

* ``step_rk45`` reproduces scipy's adaptive Dormand-Prince result to fp
  rounding, and
* ``step_closed_form`` (the exact solution, used on the TPU hot path) agrees
  with RK45 to its truncation error.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from contracts_marl_aam_corridors_tpu.config import physics
from contracts_marl_aam_corridors_tpu.envs import dynamics


def scipy_step(values, action, cfg):
    """Reference-equivalent single step: solve_ivp + clamp + odometry speed."""
    if cfg.dynamics == physics.DynamicsType.DOUBLE_INTEGRATOR:
        ode = lambda t, y: np.array([y[2], y[3], action[0], action[1]])
    else:
        ode = lambda t, y: np.array(
            [y[3] * np.cos(y[2]), y[3] * np.sin(y[2]), action[0], action[1]]
        )
    sol = solve_ivp(ode, [0, cfg.dt], values, method="RK45")
    out = sol.y[:, -1].copy()
    if cfg.dynamics == physics.DynamicsType.DOUBLE_INTEGRATOR:
        speed = np.hypot(out[2], out[3])
        if speed > cfg.v_max:
            out[2:] *= cfg.v_max / speed
    else:
        out[3] = np.clip(out[3], cfg.v_min, cfg.v_max)
    return out


def sample_states(cfg, n, rng):
    if cfg.dynamics == physics.DynamicsType.DOUBLE_INTEGRATOR:
        states = rng.uniform(-2, 2, size=(n, 4))
        acts = rng.uniform(cfg.accel_min, cfg.accel_max, size=(n, 2)) * 5.0
    else:
        states = np.stack(
            [
                rng.uniform(-2, 2, n),
                rng.uniform(-2, 2, n),
                rng.uniform(-np.pi, np.pi, n),
                rng.uniform(cfg.v_min, cfg.v_max, n),
            ],
            axis=-1,
        )
        # post-sensitivity(×5) control ranges as produced by the action decoder
        acts = np.stack(
            [
                rng.uniform(-cfg.angular_rate_max, cfg.angular_rate_max, n) * 5.0,
                rng.uniform(cfg.accel_min, cfg.accel_max, n) * 5.0,
            ],
            axis=-1,
        )
    return states, acts


CFGS = [physics.AIR_TAXI, physics.UNICYCLE, physics.DOUBLE_INTEGRATOR]


@pytest.mark.parametrize("cfg", CFGS, ids=lambda c: c.dynamics.name)
def test_rk45_matches_scipy(cfg):
    rng = np.random.RandomState(0)
    states, acts = sample_states(cfg, 64, rng)
    ours = np.asarray(dynamics.step_rk45(jnp.asarray(states), jnp.asarray(acts), cfg))
    ref = np.stack([scipy_step(s, a, cfg) for s, a in zip(states, acts)])
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


@pytest.mark.parametrize("cfg", CFGS, ids=lambda c: c.dynamics.name)
def test_closed_form_within_rk45_truncation(cfg):
    rng = np.random.RandomState(1)
    states, acts = sample_states(cfg, 64, rng)
    cf = np.asarray(
        dynamics.step_closed_form(jnp.asarray(states), jnp.asarray(acts), cfg)
    )
    ref = np.stack([scipy_step(s, a, cfg) for s, a in zip(states, acts)])
    # closed form is exact; RK45's own truncation error bounds the gap
    np.testing.assert_allclose(cf, ref, rtol=0, atol=5e-8)


def test_status_freezes_agents():
    cfg = physics.AIR_TAXI
    rng = np.random.RandomState(2)
    states, acts = sample_states(cfg, 8, rng)
    active = np.array([True, False] * 4)
    out = np.asarray(
        dynamics.step_closed_form(
            jnp.asarray(states), jnp.asarray(acts), cfg, jnp.asarray(active)
        )
    )
    np.testing.assert_array_equal(out[~active], states[~active])
    assert not np.allclose(out[active], states[active])


def test_speed_clamp_double_integrator():
    cfg = physics.DOUBLE_INTEGRATOR
    values = jnp.asarray([[0.0, 0.0, 3.0, 4.0]])  # speed 5 > v_max 1
    out = np.asarray(dynamics.clamp_speed(values, cfg))
    np.testing.assert_allclose(np.hypot(out[0, 2], out[0, 3]), cfg.v_max, atol=1e-12)
    # direction preserved
    np.testing.assert_allclose(out[0, 3] / out[0, 2], 4.0 / 3.0, atol=1e-12)


def test_velocity_heading_helpers():
    cfg = physics.AIR_TAXI
    v = jnp.asarray([[1.0, 2.0, np.pi / 2, 0.05]])
    vel = np.asarray(dynamics.velocity_of(v, cfg))
    np.testing.assert_allclose(vel, [[0.0, 0.05]], atol=1e-12)
    assert np.asarray(dynamics.heading_of(v, cfg))[0] == pytest.approx(np.pi / 2)
    di = physics.DOUBLE_INTEGRATOR
    v2 = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    assert np.asarray(dynamics.heading_of(v2, di))[0] == pytest.approx(np.pi / 4)
    assert np.asarray(dynamics.speed_of(v2, di))[0] == pytest.approx(np.sqrt(2))
