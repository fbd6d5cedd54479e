"""Small utility surfaces: CNNBase (reference cnn.py), tile_images
(reference util.py:55-73), and classic-MPE gym spaces."""
import numpy as np
import jax
import jax.numpy as jnp


def test_cnn_base_shapes_and_scaling():
    from contracts_marl_aam_corridors_tpu.models.config import ModelConfig
    from contracts_marl_aam_corridors_tpu.models.nets import CNNBase

    cfg = ModelConfig(hidden_size=64)
    m = CNNBase(cfg)
    x = jnp.full((2, 8, 8, 3), 255.0)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 64)
    # input scaled /255 -> same output as feeding ones unscaled would give
    out2 = m.apply(params, jnp.ones((2, 8, 8, 3)) * 255.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)
    assert np.isfinite(np.asarray(out)).all()


def test_tile_images():
    from contracts_marl_aam_corridors_tpu.utils.render import tile_images

    imgs = np.arange(5 * 4 * 6 * 3, dtype=np.float32).reshape(5, 4, 6, 3)
    tiled = tile_images(imgs)
    # 5 images -> 3x2 grid of 4x6 tiles
    assert tiled.shape == (12, 12, 3)
    np.testing.assert_array_equal(tiled[:4, :6], imgs[0])
    np.testing.assert_array_equal(tiled[4:8, :6], imgs[2])
    # padding tile is zeros
    np.testing.assert_array_equal(tiled[8:, 6:], np.zeros((4, 6, 3)))


def test_mpe_spaces():
    from contracts_marl_aam_corridors_tpu.envs import mpe_scenarios as ms
    from contracts_marl_aam_corridors_tpu.envs.mpe_classic import MPEParams
    from contracts_marl_aam_corridors_tpu.envs.spaces import mpe_spaces

    sp = mpe_spaces(MPEParams())
    assert sp["action_space"][0].n == 5
    assert sp["observation_space"][0].shape == (MPEParams().obs_dim,)

    ref = mpe_spaces(ms.ReferenceParams())
    assert list(ref["action_space"][0].nvec) == [5, 10]
    sl = mpe_spaces(ms.SpeakerListenerParams())
    assert list(sl["action_space"][0].nvec) == [5, 3]
    crypto = mpe_spaces(ms.CryptoParams())
    assert crypto["action_space"][0].n == 4


def test_gnn_impl_auto_resolution():
    """ModelConfig.gnn_impl='auto' resolves at construction: 'transposed' on
    the CPU backend (this suite), explicit choices pass through, and
    dataclasses.replace re-resolves without mangling explicit values."""
    import dataclasses

    from contracts_marl_aam_corridors_tpu.models.config import (
        ModelConfig,
        resolve_gnn_impl,
    )

    c = ModelConfig()
    assert c.gnn_impl == "transposed"  # cpu backend -> XLA transposed
    assert c.gnn_impl_requested == "auto"
    assert ModelConfig(gnn_impl="dense").gnn_impl == "dense"
    c2 = dataclasses.replace(c, gnn_impl="pallas_fused")
    assert c2.gnn_impl == "pallas_fused"
    assert resolve_gnn_impl("transposed") == "transposed"


def test_gnn_impl_entity_envelope():
    """Auto-selected pallas_fused downgrades to transposed above the
    backward kernel's validated Mosaic envelope (on-chip repro 2026-08-20:
    make_gnn_bwd crashes the TPU compile helper at num_entities >= 8, E=6
    trains 5M-step runs); an EXPLICIT pallas_fused choice is honored."""
    import dataclasses

    from contracts_marl_aam_corridors_tpu.models.config import (
        PALLAS_BWD_MAX_ENTITIES,
        ModelConfig,
        apply_entity_envelope,
    )

    # simulate what auto resolves to on a single-device TPU
    auto = ModelConfig()
    object.__setattr__(auto, "gnn_impl", "pallas_fused")
    assert auto.gnn_impl_requested == "auto"
    assert apply_entity_envelope(auto, PALLAS_BWD_MAX_ENTITIES).gnn_impl == "pallas_fused"
    assert apply_entity_envelope(auto, PALLAS_BWD_MAX_ENTITIES + 1).gnn_impl == "transposed"
    # the downgraded config still records the original request
    assert apply_entity_envelope(auto, 10).gnn_impl_requested == "auto"
    # explicit pin passes through at any entity count
    pinned = ModelConfig(gnn_impl="pallas_fused")
    assert apply_entity_envelope(pinned, 20).gnn_impl == "pallas_fused"
    # GRMAPPOPolicy applies the guard at construction
    from contracts_marl_aam_corridors_tpu.models import GRMAPPOPolicy, PolicyDims

    dims = PolicyDims(obs_dim=13, cent_obs_dim=39, num_entities=10,
                      node_feat_dim=8, num_actions=9)
    pol = GRMAPPOPolicy(auto, dims)
    assert pol.cfg.gnn_impl == "transposed"
