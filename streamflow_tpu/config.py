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
    # Decoder ablations (reference --UpdateBlock): "sk_tam_v3" (canonical,
    # SKUpdateBlock_TAM_v3), "sk_tam_v1" (per-frame flow head,
    # core/update.py:691-735), "sk_tam_v3_noinit" (live-init temporal
    # transformer, core/update.py:787-832).
    update_block: str = "sk_tam_v3"
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
    # Correlation implementation. "auto" resolves (see ``resolve()``) to
    # "pallas" on TPU — the fused volume-matmul + lookup kernel, O(N*C)
    # memory, measured fastest end-to-end on v5e at 440x1024 when paired
    # with dw_impl='xla_cond' (188 vs 216 ms/clip, r3) — and to "xla"
    # (materialized volume + gather-free one-hot lookup) elsewhere.
    # "chunked" (lax.map sweep) also never materializes the (N, N) volume —
    # an O(N^2)-free fallback for Spring 1080p+ where the volume is
    # 4.2GB/pair. Pick with `for_resolution()`.
    corr_impl: str = "auto"
    # Storage dtype of the materialized correlation pyramid (corr_impl='xla'):
    # "auto" = bf16 under mixed precision else fp32; "int8" quantizes each
    # level with a per-batch absmax/127 scale (4x less HBM traffic than fp32
    # on the dominant per-iteration stream; lookup dequantizes after the
    # bilinear contraction). Gate "int8" on the accuracy test in
    # tests/test_ops_parity.py::test_int8_volume_quantization_error.
    corr_store: str = "auto"
    # "full" materializes the (N, N) attention map once (reference non-flash
    # path); "flash" recomputes softmax(qk)v per iteration with the blocked
    # Pallas kernel — numerically identical, O(N) memory. "auto" resolves to
    # "flash" on TPU (170.6 vs 188.1 ms/clip at 440x1024 next to the fused
    # lookup + cond-shielded convs, r3) and "full" elsewhere.
    attn_impl: str = "auto"
    # Depthwise-conv stack inside SK blocks. "auto" resolves (``resolve()``)
    # to "xla_cond" when the fused Pallas lookup shares the refinement loop —
    # XLA's dw conv emitter, each conv shielded inside a lax.cond branch
    # computation from the Mosaic custom-call layout disease (BASELINE.md) —
    # and to plain "xla" otherwise. "pallas" forces the fused chain kernel;
    # "xla_fenced" optimization-barriers XLA convs out of surrounding
    # fusions; "shift" is a k^2-tap elementwise expansion (numerics
    # debugging only — 7.7x slower, ROADMAP.md).
    dw_impl: str = "auto"
    # Query-block rows of the fused corr lookup kernel (corr_impl='pallas');
    # operands are padded to a whole number of blocks at volume-build time.
    lookup_block_q: int = 512
    # Volume planes per loop step inside the fused lookup kernel (a bigger
    # slab halves the dynamic-trip loop overhead; costs VMEM + edge rows).
    # Default 2: unroll 4 and 1 hit a Mosaic codegen fault (TPU worker
    # crash) at specific level-shape sets — e.g. the Spring 1080p pyramid
    # (135,240)+(67,120) — while 2 passes every crashing variant and is
    # perf-neutral and bit-identical at benchmark resolution (r5s3,
    # tools/probe_1080p_fault.py + sweep: 121.3 vs 121.5 ms/clip).
    lookup_unroll: int = 2
    # Storage layout of the prepared fmap2 pyramid levels for the fused
    # lookup kernel: 'w' = (Hl, Wp, C) (C minor — the kernel's volume matmul
    # contracts a transposed RHS); 'c' = (Hl, C, Wp) (C-major — per-row
    # natively-oriented (Q,C)@(C,Wp) matmuls; one extra build-time
    # transpose per level, outside the refinement loop).
    lookup_f2_major: str = "w"
    # Row-loop policy of the fused lookup kernel: 'dynamic' bounds each
    # query block's volume recompute to its coords' y-range (narrow for
    # converged flows — 0.42 ms/iter measured at ±3 px); 'full' statically
    # loops every level row, which Mosaic pipelines (0.875 ms/iter always —
    # wins when flows are wildly scattered, e.g. random-weight benchmarks:
    # in-model dynamic degrades to ~1.85 ms/iter there). r5s2,
    # tools/probe_lookup.py.
    lookup_rows: str = "dynamic"
    # Force the Twins global-subsample attention through the Pallas flash
    # kernel (O(n) memory, exact math) even below the 16k-token auto
    # threshold where it engages regardless.
    gsa_flash: bool = False
    # Locally-grouped (windowed) attention inside the Twins encoder:
    # "pallas" runs the head-major hybrid kernel (window partition +
    # per-head masked-matmul attention in VMEM; qkv/proj Dense stay XLA —
    # ops/pallas/_lga_kernel.py v2; the r3s4 v1 whole-block kernel was
    # rejected by real-toolchain Mosaic on its sub-lane-tile head-split
    # reshape and is gone). "xla" is the reshape/transpose composite.
    # "auto" resolves per measurement (config.resolve()).
    lga_impl: str = "auto"
    # Run each Twins MLP pair (fc1 -> gelu -> fc2) as one Pallas ffn_pair
    # kernel so the 4x-hidden activation never round-trips HBM — independent
    # of lga_impl='pallas' (which also implies it), usable while the fused
    # LGA kernel is gated off the real Mosaic toolchain. None = auto: on for
    # TPU (142.4 vs 143.5/144.3 ms/clip at 436x1024, r4s2), off elsewhere.
    twins_ffn_fused: bool | None = None
    # Gelu evaluation inside the fused Pallas FFN kernels (SK blocks + Twins
    # MLPs): "erf" reproduces XLA's exact 4/6 rational erf; "poly" is a
    # divide-free odd polynomial (max|err| 4.0e-4 — ~20x below bf16
    # activation resolution; the kernels' output delta vs the f32 composite
    # is ~2.5e-2 with EITHER variant, dominated by bf16 operand rounding)
    # that relieves the kernels' VPU bottleneck: 140.8 -> 129.1 ms/clip at
    # 436x1024 (r4s3, BASELINE.md). "auto" = "poly" on TPU, "erf" elsewhere.
    # The custom-vjp backward recomputes with the SAME variant; off-kernel
    # XLA paths (CPU, dw='xla') always use exact erf.
    ffn_gelu: str = "auto"

    dropout: float = 0.0

    # Unroll factor for the refinement lax.scan: unrolled iterations let XLA
    # overlap the lookup matmuls of one iteration with the update convs of
    # the previous (measured: 4 unrolled iterations cost ~1.5ms each vs ~15ms
    # sequential at 440x1024).
    scan_unroll: int = 4

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

    def resolve(self, training: bool = False) -> "StreamFlowConfig":
        """Materialize 'auto' kernel choices for the active jax backend.

        Measured on v5e (440x1024, T=4, 12 iters, r3): fused Pallas lookup +
        cond-shielded XLA dw convs = 188.1 ms/clip, vs 215.8 for the
        materialized-volume XLA path and 195.3 for pallas + unshielded convs.
        Off-TPU (CPU tests, multichip dryrun) everything resolves to the
        portable XLA forms. Parameter layout is identical across all
        resolutions, so checkpoints are backend-portable.

        ``training=True`` (the model passes its ``train`` flag) exists so
        the train-time kernel set can diverge from inference. Measured on
        v5e (r5s2, tools/train_bench.py — 432x960, T=4, 12 iters, B=1,
        bf16+remat, full fwd+bwd+AdamW): ``xla_cond`` 747 ms/step,
        ``xla`` 783, ``banded_mxu`` 20519 (the r3s5 "training candidate"
        hypothesis is refuted — its custom-VJP recompute through the
        k-redundant XLA banded composite, re-run once more per iteration
        by remat, is catastrophic under autodiff). Training therefore
        resolves dw to the same ``xla_cond`` as inference; the cond
        shield survives differentiation and still beats the bare
        emitter."""
        corr, dw, attn, lga = (self.corr_impl, self.dw_impl, self.attn_impl,
                               self.lga_impl)
        tffn, gelu = self.twins_ffn_fused, self.ffn_gelu
        if "auto" in (corr, attn, gelu, lga) or tffn is None:
            import jax

            on_tpu = jax.default_backend() == "tpu"
            if corr == "auto":
                corr = "pallas" if on_tpu else "xla"
            if attn == "auto":
                attn = "flash" if on_tpu else "full"
            if lga == "auto":
                # head-major v2 kernel: 121.5 vs 128.9 ms/clip at 436x1024
                # (r5s2 sweep)
                lga = "pallas" if on_tpu else "xla"
            if tffn is None:
                tffn = on_tpu
            if gelu == "auto":
                gelu = "poly" if on_tpu else "erf"
        if dw == "auto":
            # same resolution for train and eval — measured, see docstring
            dw = "xla_cond" if corr == "pallas" else "xla"
        if (corr, dw, attn, lga, tffn, gelu) == (
                self.corr_impl, self.dw_impl, self.attn_impl, self.lga_impl,
                self.twins_ffn_fused, self.ffn_gelu):
            return self
        return dataclasses.replace(self, corr_impl=corr, dw_impl=dw,
                                   attn_impl=attn, lga_impl=lga,
                                   twins_ffn_fused=tffn, ffn_gelu=gelu)

    def for_resolution(self, height: int, width: int) -> "StreamFlowConfig":
        """Pick memory-appropriate kernel implementations for an input size:
        above ~0.5MP the O(N^2) volume/attention-map paths stop fitting (the
        resolutions the reference needs flash-attn + tiling for)."""
        n_tokens = (height // self.ratio) * (width // self.ratio)
        if n_tokens <= 10_000:
            return self
        return dataclasses.replace(self, corr_impl="pallas",
                                   attn_impl="flash", gsa_flash=True)


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
    dw_impl: str = "auto"
    dropout: float = 0.0

    @property
    def corr_planes(self) -> int:
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2
