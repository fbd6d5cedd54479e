"""Model hyperparameters, mirroring the reference's network flags.

Defaults match ``onpolicy/config.py`` ``get_config`` (hidden_size 64, layer_N 1,
ReLU, orthogonal init, gain 0.01, recurrent_N 1) and ``graph_config``
(:409-484: 4 entity-type embeddings of size 2, embed hidden 16, gnn hidden 16,
3 averaged heads, 2 extra conv layers, actor aggr 'node', critic aggr
'global'/mean, use_cent_obs False).
"""
from __future__ import annotations

import dataclasses


def resolve_gnn_impl(choice: str) -> str:
    """Resolve the ``"auto"`` GNN trunk implementation choice.

    ``auto`` picks the fastest VALIDATED implementation for the runtime:
    the pallas fused fwd + recompute-backward kernels on a single-device
    TPU (measured 12.4 vs 33.3 ms trunk fwd+bwd at the PPO-update batch,
    full train episode 861 -> 628 ms — BENCH_NOTES r4/r5), else the
    XLA transposed formulation.  Multi-device TPU stays on ``transposed``
    until the custom_vjp custom call has real multi-chip coverage (it has
    pjit partitioner coverage on the interpret path and a 1-device-Mesh
    run on chip — tests/test_parallel.py, BENCH_NOTES r5)."""
    if choice != "auto":
        return choice
    import jax

    if jax.default_backend() != "cpu" and len(jax.devices()) == 1:
        return "pallas_fused"
    return "transposed"


# Mosaic envelope of the fused RECOMPUTE-BACKWARD kernel
# (ops/gnn_pallas.py make_gnn_bwd), measured on-chip 2026-08-20: the
# backward crashes the TPU compile helper (HTTP 500, deterministic 6/6)
# for num_entities >= 8, while E=6 compiles and trains (5M-step runs) and
# the FORWARD kernel compiles at E=6/8/10.  The breaking growth is the
# backward's live (E*C, B) blocks crossing the 128-sublane tile
# (6*16=96 ok, 8*16=128 already fails).  Auto-selection must therefore
# never route training through pallas_fused above this bound.
PALLAS_BWD_MAX_ENTITIES = 6


def apply_entity_envelope(cfg: "ModelConfig", num_entities: int) -> "ModelConfig":
    """Downgrade an AUTO-selected ``pallas_fused`` to ``transposed`` when the
    entity count exceeds the backward kernel's validated Mosaic envelope.
    An EXPLICIT ``--gnn_impl pallas_fused`` is honored unchanged (forward-
    only use, or future kernels with wider coverage)."""
    if (
        cfg.gnn_impl == "pallas_fused"
        and cfg.gnn_impl_requested == "auto"
        and num_entities > PALLAS_BWD_MAX_ENTITIES
    ):
        return dataclasses.replace(cfg, gnn_impl="transposed")
    return cfg


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    hidden_size: int = 64
    layer_N: int = 1
    use_relu: bool = True
    use_feature_normalization: bool = True
    use_orthogonal: bool = True
    gain: float = 0.01
    use_recurrent_policy: bool = True
    recurrent_n: int = 1
    # GNN
    # The reference keeps SEPARATE activation flags for the GNN: the MLP
    # trunk follows use_ReLU (config.py --use_ReLU, False = Tanh) while
    # EmbedConv follows embed_use_ReLU and the TransformerConv stack follows
    # gnn_use_ReLU (gnn_new.py:66,227,270) — both default True and are True
    # in every shipped checkpoint, INCLUDING the Tanh-MLP runs
    # (model_weights/tube/rotate: use_ReLU False, gnn/embed_use_ReLU True).
    # A single shared flag silently tanh-ifies the GNN on import of such
    # checkpoints and breaks their behavior.
    embed_use_relu: bool = True
    gnn_use_relu: bool = True
    num_embeddings: int = 4
    embedding_size: int = 2
    embed_hidden_size: int = 16
    embed_layer_n: int = 1
    gnn_hidden_size: int = 16
    gnn_num_heads: int = 3
    gnn_concat_heads: bool = False
    gnn_layer_n: int = 2
    actor_graph_aggr: str = "node"
    critic_graph_aggr: str = "global"
    global_aggr_type: str = "mean"
    use_cent_obs: bool = False
    max_edge_dist: float = 1.0
    use_popart: bool = False
    # Lane-packed EmbedConv edge-MLP layout: the (E,E,embed_hidden) message
    # tensor becomes (E, E*embed_hidden).  MEASURED 0.96x vs dense on the
    # actor trunk fwd+bwd (76.8K graphs, v5e) — XLA already handles the small
    # minor dims well, so this is NOT an optimization; it is retained as a
    # validated alternative layout (identical parameter tree, fp-tolerance
    # numerics, 3x faster XLA compile) and as the measurement that closes the
    # tile-padding hypothesis (BENCH_NOTES.md).  Default OFF.
    gnn_edge_packed: bool = False
    # GNN trunk implementation for the TRAINING-time evaluate_actions path:
    # 'dense' = the vmapped per-graph flax modules; 'transposed' = the
    # sublane-entity / lane-batch formulation (nets.gnn_transposed_apply) —
    # same math to fp tolerance, measured 5.4x faster fwd+bwd at the PPO
    # update batch (padded (…, E, F) tile traffic eliminated);
    # 'pallas_fused' = VMEM-resident pallas fwd + recompute-backward under
    # custom_vjp (fastest single-chip TPU path); 'auto' (default) resolves
    # per resolve_gnn_impl at construction time.
    gnn_impl: str = "auto"
    # The pre-resolution choice ("auto" vs an explicit impl), preserved so
    # shape-dependent guards (apply_entity_envelope) can distinguish an
    # auto-selected pallas_fused from a user-pinned one.  Set automatically.
    gnn_impl_requested: str = ""
    # Computation dtype for the GNN/MLP trunk ("float32" or "bfloat16").
    # Params stay float32; bf16 halves the HBM traffic of the edge-feature
    # tensors that dominate the training step.  Outputs (and the GRU head)
    # stay float32.  Parity tests require float32.
    compute_dtype: str = "float32"

    def __post_init__(self):
        if not self.gnn_impl_requested:
            object.__setattr__(self, "gnn_impl_requested", self.gnn_impl)
        object.__setattr__(self, "gnn_impl", resolve_gnn_impl(self.gnn_impl))

    @property
    def gnn_out_dim(self) -> int:
        return self.gnn_hidden_size * (self.gnn_num_heads if self.gnn_concat_heads else 1)
