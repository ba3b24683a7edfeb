"""Typed configuration for models, replacing the reference's ~80 argparse flags
and ``eval()``-based class dispatch (reference: core/models/streamflow.py:45-47,
train_mf.py:340-482) with dataclasses + a named registry.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class StreamFlowConfig:
    """Configuration of the StreamFlow model (reference SKFlow_MF8,
    core/models/streamflow.py:30-149, canonical flags per scripts/infer.sh).

    The released configuration is the default: Twins_CSC encoder,
    SKMotionEncoder6, SKUpdateBlock_TAM_v3 decoder with GMA, T=4.
    """

    # Number of frames per clip; the model predicts T-1 flow fields.
    T: int = 4

    # Component selection (registry names, see streamflow_tpu.registry).
    encoder: str = "twins_csc"          # reference --Encoder Twins_CSC
    update_block: str = "sk_tam_v3"     # reference --UpdateBlock SKUpdateBlock_TAM_v3
    motion_encoder: str = "sk6"         # reference --MotionEncoder SKMotionEncoder6_Deep_nopool_res

    # Dimensions (reference core/models/streamflow.py:35-39).
    decoder_dim: int = 256               # hidden+context = decoder_dim
    corr_levels: int = 4
    corr_radius: int = 4
    num_heads: int = 1                   # GMA heads (train_mf.py:375 default)
    use_gma: bool = True

    # Large-kernel conv sizes (train_mf.py:388,396; scripts/infer.sh).
    k_conv: Sequence[int] = (1, 15)
    pc_updater_conv: Sequence[int] = (1, 7)

    # Refinement iterations (train 12 / eval 15 / submit 20).
    iters: int = 12

    # Numerics: bf16 compute inside encoders/update block (TPU analogue of the
    # reference's fp16 autocast, core/models/streamflow.py:106-136). The
    # correlation volume and softmax stay fp32 (reference casts corr .float(),
    # core/corr.py:44).
    mixed_precision: bool = True

    # Kernel implementation selection.
    # "pallas" (default): fused volume-matmul + radius-window lookup per
    # refinement iteration — never materializes the (N, N) volume (O(N*C)
    # memory) and runs ~2.7x faster per iteration than the XLA composite on
    # v5e. "xla" keeps the reference's materialized pyramid; "chunked" is the
    # pure-XLA memory-bounded fallback.
    corr_impl: str = "pallas"
    # "flash" (default): q/k kept, softmax(qk)v fused per iteration with the
    # blocked Pallas kernel — numerically identical to "full" (which
    # materializes the (N, N) map once like the reference's non-flash path,
    # costing ~50ms + 600MB at 440x1024).
    attn_impl: str = "flash"
    # Query-chunk size for memory-bounded global-subsample attention inside the
    # Twins encoder; 0 = no chunking.
    gsa_chunk: int = 0

    dropout: float = 0.0

    # Rematerialize each refinement iteration in the backward pass
    # (jax.checkpoint): trades ~1 extra forward of the update block per
    # iteration for not storing 12-24 iterations of activations — the TPU
    # analogue of the gradient checkpointing the reference only has in its
    # unused UMT encoder (core/encoders/umt.py:333-335).
    remat: bool = False

    @property
    def hidden_dim(self) -> int:
        return self.decoder_dim // 2

    @property
    def context_dim(self) -> int:
        return self.decoder_dim // 2

    @property
    def ratio(self) -> int:
        """Downsampling ratio of the encoder (16 for UMT, 8 otherwise;
        reference core/models/streamflow.py:53)."""
        return 16 if self.encoder == "umt" else 8

    @property
    def corr_planes(self) -> int:
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    """Two-frame RAFT/GMA/SKFlow baselines (reference core/models/raft.py:71-190,
    raftgma.py, sk_decoder.py)."""

    encoder: str = "basic"               # "basic" CNN encoder
    update_block: str = "raft"           # "raft" | "gma" | "sk"
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    num_heads: int = 1
    use_gma: bool = False
    k_conv: Sequence[int] = (1, 15)
    pc_updater_conv: Sequence[int] = (1, 7)
    iters: int = 12
    mixed_precision: bool = True
    corr_impl: str = "xla"
    attn_impl: str = "full"
    dropout: float = 0.0

    @property
    def corr_planes(self) -> int:
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2
