"""Safety-filter tests: analytic CBF-QP vs KKT/scipy, the DI exponential-CBF
handle vs a numpy port of the reference formulas, and the HJ filter's
least-restrictive branching."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
from contracts_marl_aam_corridors_tpu.safety import (
    airtaxi_hj_filter,
    cbf_qp_analytic,
    di_exp_cbf_filter,
    make_synthetic_airtaxi_hj,
)
from contracts_marl_aam_corridors_tpu.safety.hj import interpolate, relative_state_airtaxi


def test_cbf_qp_matches_scipy():
    from scipy.optimize import minimize

    rng = np.random.RandomState(0)
    for _ in range(20):
        m = 4
        u_ref = rng.randn(m)
        a = rng.randn(m)
        b = rng.randn() * 2
        w = rng.rand(m) + 0.5

        got = np.asarray(
            cbf_qp_analytic(jnp.asarray(u_ref), jnp.asarray(a), jnp.asarray(b), jnp.asarray(w))
        )
        res = minimize(
            lambda u: np.sum(w * (u - u_ref) ** 2),
            u_ref,
            constraints=[{"type": "ineq", "fun": lambda u: a @ u + b}],
            method="SLSQP",
        )
        # feasible and at least as good as scipy's (KKT-exact vs iterative)
        assert a @ got + b >= -1e-9
        assert np.sum(w * (got - u_ref) ** 2) <= res.fun + 1e-7
        # KKT stationarity: residual parallel to W^-1 a (or zero)
        r = got - u_ref
        if np.linalg.norm(r) > 1e-9:
            dirv = a / w
            cosang = (r @ dirv) / (np.linalg.norm(r) * np.linalg.norm(dirv))
            np.testing.assert_allclose(cosang, 1.0, atol=1e-9)


def _ref_di_terms(rel, sep, rate):
    """Direct numpy port of safety_filter.py:470-483."""
    d = np.sqrt(rel[0] ** 2 + rel[1] ** 2)
    dd = (rel[0] * rel[2] + rel[1] * rel[3]) / d
    value = dd + rate * (d - sep)
    lf = rate * dd + (rel[0] * rel[3] - rel[1] * rel[2]) ** 2 / d**3
    lg = np.array([rel[0] / d, rel[1] / d, -rel[0] / d, -rel[1] / d])
    return value, lf, lg


def test_di_filter_matches_reference_logic():
    cfg = vehicle_config("double_integrator")
    rng = np.random.RandomState(1)
    for trial in range(10):
        n = 4
        states = rng.randn(n, 4).astype(np.float64)
        states[:, :2] *= 0.6  # keep some agents within coordination range
        actions = rng.uniform(-1, 1, (n, 2))

        out, filtered, diff, jsel = di_exp_cbf_filter(
            jnp.asarray(states), jnp.asarray(actions), cfg
        )
        out = np.asarray(out)

        for i in range(n):
            others = [k for k in range(n) if k != i]
            dists = [np.linalg.norm(states[k, :2] - states[i, :2]) for k in others]
            vals = []
            for k in others:
                rel = states[i] - states[k]
                v, _, _ = _ref_di_terms(rel, cfg.separation_distance, cfg.cbf_rate)
                vals.append(v)
            if min(dists) > cfg.coordination_range:
                np.testing.assert_allclose(out[i], actions[i], atol=1e-9)
                continue
            k = others[int(np.argmin(vals))]
            assert k == int(jsel[i])
            rel = states[i] - states[k]
            v, lf, lg = _ref_di_terms(rel, cfg.separation_distance, cfg.cbf_rate)
            u_ref = np.concatenate([actions[i], actions[k]])
            # analytic single-constraint QP (identity weights)
            viol = -(lg @ u_ref + lf + cfg.cbf_rate * v)
            u = u_ref + max(viol, 0) * lg / (lg @ lg)
            # clip vs velocity bounds of the RELATIVE state (reference quirk)
            for ax in (0, 1):
                vrel = rel[2 + ax]
                amax = cfg.accel_max if vrel < cfg.v_max - cfg.dt * cfg.accel_max else 0.0
                amin = cfg.accel_min if vrel > -cfg.v_max - cfg.dt * cfg.accel_min else 0.0
                u[ax] = max(min(u[ax], amax), amin)
            np.testing.assert_allclose(out[i], u[:2], atol=1e-6, err_msg=f"agent {i} trial {trial}")


def test_di_filter_prevents_collision_course():
    """Two agents heading straight at each other get pushed apart."""
    cfg = vehicle_config("double_integrator")
    states = jnp.asarray(
        [[0.0, 0.0, 1.0, 0.0], [0.8, 0.0, -1.0, 0.0]]
    )
    actions = jnp.asarray([[1.0, 0.0], [-1.0, 0.0]])  # accelerate toward each other
    out, filtered, diff, _ = di_exp_cbf_filter(states, actions, cfg)
    assert bool(filtered[0]) and bool(filtered[1])
    assert float(out[0, 0]) < 1.0  # ego accel reduced / reversed
    assert float(out[1, 0]) > -1.0


def test_interpolation_matches_scipy():
    from scipy.interpolate import RegularGridInterpolator

    rng = np.random.RandomState(2)
    lo = np.array([-1.0, 0.0, -2.0])
    hi = np.array([1.0, 3.0, 2.0])
    shape = (7, 5, 9)
    axes = [np.linspace(lo[k], hi[k], shape[k]) for k in range(3)]
    table = rng.randn(*shape)
    f = RegularGridInterpolator(axes, table)
    x = rng.uniform(lo, hi, (40, 3))
    want = f(x)
    got, in_range = interpolate(jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(table), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9)
    assert bool(jnp.all(in_range))
    # out of range flagged
    _, ir = interpolate(jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(table), jnp.asarray([[5.0, 0.0, 0.0]]))
    assert not bool(ir[0])


def test_airtaxi_hj_filter_branches():
    cfg = vehicle_config("air_taxi")
    hj = make_synthetic_airtaxi_hj(cfg)

    # far apart: unfiltered
    states = jnp.asarray(
        [[0.0, 0.0, 0.0, 0.05], [50.0, 0.0, np.pi, 0.05], [100.0, 3.0, 0.0, 0.05]]
    )
    actions = jnp.zeros((3, 2))
    out, filtered, diff, _ = airtaxi_hj_filter(states, actions, hj, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(actions), atol=1e-9)
    assert not bool(jnp.any(filtered))

    # head-on inside separation: V < eps -> bang-bang evasive control
    states = jnp.asarray(
        [[0.0, 0.0, 0.0, 0.06], [0.5, 0.0, np.pi, 0.06], [100.0, 3.0, 0.0, 0.05]]
    )
    out, filtered, diff, _ = airtaxi_hj_filter(states, actions, hj, cfg)
    assert bool(filtered[0]) and bool(filtered[1])
    for i in (0, 1):
        w, a = float(out[i, 0]), float(out[i, 1])
        assert abs(w) <= cfg.angular_rate_max + 1e-9
        assert cfg.accel_min - 1e-9 <= a <= cfg.accel_max + 1e-9
    assert float(diff[0]) > 0


def test_env_integration_di_safety():
    from contracts_marl_aam_corridors_tpu.envs import env as env_mod
    from contracts_marl_aam_corridors_tpu.envs.types import EnvParams

    params = EnvParams(
        cfg=vehicle_config("double_integrator"),
        num_agents=3,
        num_landmarks=3,
        episode_length=10,
        use_safety_filter=True,
        total_actions=5,
    )
    e = env_mod.CorridorEnv(params, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    state, ts = e.vec_reset(keys)
    for _ in range(3):
        state, ts = e.vec_step(state, jnp.ones((4, 3), jnp.int32))
    assert state.action_diff.shape == (4, 3)
    assert np.isfinite(np.asarray(state.action_diff)).all()
    assert np.isfinite(np.asarray(ts.reward)).all()


def test_env_integration_airtaxi_hj():
    from contracts_marl_aam_corridors_tpu.envs import env as env_mod
    from contracts_marl_aam_corridors_tpu.envs.types import EnvParams

    cfg = vehicle_config("air_taxi")
    params = EnvParams(
        cfg=cfg, num_agents=3, num_landmarks=3, episode_length=10,
        use_safety_filter=True,
    )
    hj = make_synthetic_airtaxi_hj(cfg)
    e = env_mod.CorridorEnv(params, dtype=jnp.float32, hj_data=jax.tree.map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "astype") else x, hj))
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    state, ts = e.vec_reset(keys)
    for _ in range(3):
        state, ts = e.vec_step(state, jnp.zeros((2, 3), jnp.int32))
    assert np.isfinite(np.asarray(ts.reward)).all()
    assert np.isfinite(np.asarray(state.action_diff)).all()


def test_safety_reward_addons_active():
    """Toggles on: add-ons contribute and stay finite (july:1208-1218)."""
    from contracts_marl_aam_corridors_tpu.config.physics import RewardToggles
    from contracts_marl_aam_corridors_tpu.envs import env as env_mod
    from contracts_marl_aam_corridors_tpu.envs.types import EnvParams

    cfg = vehicle_config("air_taxi")
    toggles = RewardToggles(
        safety_violation=True, potential_conflict=True,
        diff_from_filtered_action=True, hj_value=True,
    )
    hj = make_synthetic_airtaxi_hj(cfg)
    base = EnvParams(cfg=cfg, num_agents=3, num_landmarks=3, episode_length=8,
                     use_safety_filter=True)
    withtg = EnvParams(cfg=cfg, num_agents=3, num_landmarks=3, episode_length=8,
                       use_safety_filter=True, reward_toggles=toggles)
    outs = []
    for params in (base, withtg):
        e = env_mod.CorridorEnv(params, dtype=jnp.float64, hj_data=hj)
        state, ts = e.reset(jax.random.PRNGKey(0))
        # force a conflict: stack agents on top of each other
        vals = state.agent_states.at[1, :2].set(state.agent_states[0, :2] + 0.01)
        state = state.replace(agent_states=vals)
        state, ts = e.step(state, jnp.zeros((3,), jnp.int32))
        outs.append(np.asarray(ts.reward))
    assert np.isfinite(outs[1]).all()
    # conflicting agents are penalized more with the toggles on
    assert outs[1][0] < outs[0][0]


def test_orca_projection():
    """ORCA velocity projection: head-on agents diverge, distant agents keep
    their preferred velocity, speeds respect the cap."""
    from contracts_marl_aam_corridors_tpu.safety.rvo import orca_project, rvo_filter

    # head-on pair on the x axis
    pos = jnp.asarray([[0.0, 0.0], [1.0, 0.0]])
    vel = jnp.asarray([[0.5, 0.0], [-0.5, 0.0]])
    pref = vel
    v = orca_project(pos, vel, pref, max_speed=1.0, radius=0.15)
    v = np.asarray(v)
    # lateral components appear (agents sidestep) or closing speed drops
    closing = v[0, 0] - v[1, 0]
    assert closing < 1.0 - 1e-3 or abs(v[0, 1]) + abs(v[1, 1]) > 1e-4
    assert np.all(np.linalg.norm(v, axis=-1) <= 1.0 + 1e-6)

    # far agents: unchanged
    pos = jnp.asarray([[0.0, 0.0], [100.0, 0.0]])
    v = orca_project(pos, vel, pref, max_speed=1.0, radius=0.15)
    np.testing.assert_allclose(np.asarray(v), np.asarray(pref), atol=1e-5)

    # DI filter wrapper
    cfg = vehicle_config("double_integrator")
    states = jnp.asarray([[0.0, 0.0, 0.8, 0.0], [0.6, 0.0, -0.8, 0.0]])
    actions = jnp.asarray([[1.0, 0.0], [-1.0, 0.0]])
    a, filtered, diff, _ = rvo_filter(states, actions, cfg)
    assert bool(filtered[0]) and bool(filtered[1])
    assert np.isfinite(np.asarray(a)).all()


def test_hj_filtered_training_end_to_end():
    """HJ-filtered air-taxi TRAINING path (VERDICT r2: runner carries
    hj_data): collect + one PPO update with the safety filter active,
    synthetic value table (the reference's pickle is absent upstream)."""
    import jax
    import jax.numpy as jnp

    from contracts_marl_aam_corridors_tpu.cli.train import build
    from contracts_marl_aam_corridors_tpu.config.flags import parse_all

    args = parse_all([
        "--scenario_name", "nav_metered_one_goal_graph_rotate_tube_july",
        "--num_agents", "3", "--num_landmarks", "3",
        "--episode_length", "6", "--n_rollout_threads", "4",
        "--use_safety_filter", "True", "--safety_filter_type", "hj",
        "--gnn_impl", "dense",  # fast CPU compile; trunk isn't the subject
    ])
    env_params, policy, trainer, runner = build(args)
    assert runner.hj_data is not None
    ts = trainer.init_state(jax.random.PRNGKey(0))
    carry = runner.init_carry(jax.random.PRNGKey(1))
    ts2, _, ti, _ = jax.jit(runner.train_episode)(ts, carry, jax.random.PRNGKey(2))
    assert float(ti["value_loss"]) == float(ti["value_loss"])  # finite/not-nan
    import numpy as np

    assert np.isfinite(float(ti["policy_loss"]))
