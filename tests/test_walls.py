"""Wall support (BASELINE config 4: 10-agent corridor, walls, safety filter).

The reference cannot actually run graph scenarios with walls (walls lack a
``state.p_pos`` for the distance cache and produce ragged 13- vs 8-dim node
rows), so these are behavior tests of our documented homogenization.
"""
import jax
import jax.numpy as jnp
import numpy as np

from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
from contracts_marl_aam_corridors_tpu.envs import corridor, env as env_mod
from contracts_marl_aam_corridors_tpu.envs.types import EnvParams


def test_wall_collision_geometry():
    assert bool(corridor._wall_collision(jnp.asarray([0.0, 0.0])))
    assert bool(corridor._wall_collision(jnp.asarray([0.9, 0.05])))
    assert not bool(corridor._wall_collision(jnp.asarray([0.0, 0.5])))
    assert not bool(corridor._wall_collision(jnp.asarray([1.5, 0.0])))


def test_ten_agent_walls_safety_env():
    cfg = vehicle_config("double_integrator")
    params = EnvParams(
        cfg=cfg, num_agents=10, num_landmarks=10, num_walls=2,
        episode_length=10, use_safety_filter=True, total_actions=5,
        world_size=4.0,
    )
    assert params.num_entities == 22
    assert params.node_feat_dim == 13
    e = env_mod.CorridorEnv(params, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    state, ts = e.vec_reset(keys)
    assert ts.node_obs.shape == (8, 10, 22, 13)
    assert ts.adj.shape == (8, 22, 22)
    # wall rows carry corner features; agents' wall slots are zero
    wall_rows = np.asarray(ts.node_obs[:, :, 20:, :])
    assert np.abs(wall_rows[..., 8:12]).sum() > 0  # corners populated
    assert np.all(np.asarray(ts.node_obs[:, :, :10, 8:12]) == 0)  # agents padded
    assert np.all(np.asarray(ts.node_obs[:, :, 20:, -1]) == 3.0)  # wall type
    # spawns avoid the wall band
    pos = np.asarray(state.agent_states[..., :2]).reshape(-1, 2)
    on_wall = (np.abs(pos[:, 1]) <= 0.09) & (pos[:, 0] >= -1.09) & (pos[:, 0] <= 1.09)
    assert not on_wall.any()
    for _ in range(3):
        state, ts = e.vec_step(state, jnp.zeros((8, 10), jnp.int32))
    assert np.isfinite(np.asarray(ts.reward)).all()
    assert np.isfinite(np.asarray(state.action_diff)).all()


def test_wall_collision_penalized():
    cfg = vehicle_config("air_taxi")
    params = EnvParams(
        cfg=cfg, num_agents=3, num_landmarks=3, num_walls=1,
        episode_length=10, world_size=4.0,
    )
    e = env_mod.CorridorEnv(params, dtype=jnp.float64)
    state, ts = e.reset(jax.random.PRNGKey(0))
    # teleport agent 0 onto the wall; compare reward with/without
    vals_on = state.agent_states.at[0, :2].set(jnp.asarray([0.0, 0.0]))
    s_on = state.replace(agent_states=vals_on)
    _, ts_on = e.step(s_on, jnp.zeros((3,), jnp.int32))
    vals_off = state.agent_states.at[0, :2].set(jnp.asarray([0.0, 1.0]))
    s_off = state.replace(agent_states=vals_off)
    _, ts_off = e.step(s_off, jnp.zeros((3,), jnp.int32))
    # the on-wall variant carries the -3*collision_rew obstacle term; the
    # other reward terms differ by position, so compare against a generous gap
    assert float(ts_on.reward[0]) < float(ts_off.reward[0])


def test_baseline_config2_shape():
    """BASELINE config 2: nav_metered 5 agents + 3 obstacles, 256 vmapped
    envs (the reference itself crashes with obstacles in graph scenarios —
    july:1627-1648 masks an (N+L)-sized array into an (N+L+O) adjacency)."""
    cfg = vehicle_config("air_taxi")
    params = EnvParams(
        cfg=cfg, num_agents=5, num_landmarks=5, num_obstacles=3,
        episode_length=10, world_size=4.0,
    )
    assert params.num_entities == 13
    e = env_mod.CorridorEnv(params, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    state, ts = e.vec_reset(keys)
    assert ts.node_obs.shape == (256, 5, 13, 8)
    for _ in range(3):
        state, ts = e.vec_step(state, jnp.zeros((256, 5), jnp.int32))
    assert np.isfinite(np.asarray(ts.reward)).all()
    assert np.isfinite(np.asarray(ts.obs)).all()
