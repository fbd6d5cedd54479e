"""PIL renderer tests (replacement for the reference's pyglet viewer)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
from contracts_marl_aam_corridors_tpu.envs import dynamics, env as env_mod
from contracts_marl_aam_corridors_tpu.envs.types import EnvParams
from contracts_marl_aam_corridors_tpu.utils.render import render_frame, save_gif


def test_render_frame_and_gif(tmp_path):
    params = EnvParams(
        cfg=vehicle_config("air_taxi"), num_agents=3, num_landmarks=3, episode_length=5
    )
    e = env_mod.CorridorEnv(params, dtype=jnp.float32)
    state, ts = e.reset(jax.random.PRNGKey(0))
    frames = []
    for _ in range(4):
        st = jax.tree.map(np.asarray, state)
        img = render_frame(
            st.agent_states[:, :2],
            np.asarray(dynamics.heading_of(state.agent_states, params.cfg)),
            st.landmark_pos,
            np.asarray(st.tube.entrance),
            np.asarray(st.tube.exit),
            float(st.tube.half_width),
            world_size=params.world_size,
            status=st.status,
        )
        assert img.size == (512, 512)
        frames.append(img)
        state, ts = e.step(state, jnp.zeros((3,), jnp.int32))
    out = os.path.join(tmp_path, "ep.gif")
    save_gif(frames, out)
    assert os.path.getsize(out) > 1000
