"""Headline benchmark: StreamFlow inference throughput on the BASELINE.json
config — Sintel 436x1024 (padded 440x1024), T=4, 12 GRU iterations, bf16,
single chip. Prints one JSON line.

``vs_baseline`` is measured fps divided by the north-star target
(5x the estimated A100 reference throughput; see BASELINE.md — the reference
repo publishes no numbers, and no GPU exists in this environment to measure
it, so the A100 figure is an engineering estimate recorded there).
"""

import json
import time

import numpy as np

# Estimated PyTorch reference on A100: ~15 clips/s (~60 frames/s) at
# 436x1024, T=4, 12 iters with fp16 autocast + flash-attn. See BASELINE.md.
EST_A100_FRAMES_PER_SEC = 60.0
TARGET = 5.0 * EST_A100_FRAMES_PER_SEC


def main():
    import os

    import jax

    # Remote-compile round trips make cold compiles very slow; persist the
    # executables next to the repo so repeat bench runs start warm.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model
    from streamflow_tpu.ops.padding import InputPadder

    B, T, H, W = 1, 4, 436, 1024
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (B, T, H, W, 3)), dtype=jnp.float32)
    padder = InputPadder((H, W, 3), mode="sintel")
    imgs = padder.pad(imgs.reshape(B * T, H, W, 3)).reshape(
        B, T, *padder.padded_shape, 3
    )

    # The TPU sits behind a high-latency tunnel (~25ms RTT), so naive per-call
    # host timing is useless (and the relay dedupes identical payloads). One
    # executable is compiled; each call's input depends on the previous
    # output via a device scalar, so the n_rep calls are forced to execute
    # sequentially on-device; a single scalar fetch closes the pipeline.
    n_rep = 10

    def build(cfg):
        model = create_model("streamflow", cfg=cfg)
        params = jax.jit(lambda k, x: model.init(k, x, test_mode=True))(
            jax.random.PRNGKey(0), imgs
        )

        @jax.jit
        def step_(params, imgs, eps):
            flows = model.apply(params, imgs + eps, test_mode=True)
            return jnp.mean(flows) * 1e-9

        step = lambda e: step_(params, imgs, e)  # args, not HLO constants
        float(step(jnp.float32(0.0)))  # warmup/compile + fetch
        return step

    fallback = False
    try:
        step = build(StreamFlowConfig(T=T, iters=12, mixed_precision=True))
    except Exception as e:  # defensive: the fast path uses Mosaic custom
        # calls; if any fails to compile on this toolchain, still produce a
        # benchmark number on the portable XLA path rather than no artifact
        import sys

        print(f"bench: default config failed ({type(e).__name__}); "
              f"falling back to xla/full/xla", file=sys.stderr)
        fallback = True
        step = build(StreamFlowConfig(T=T, iters=12, mixed_precision=True,
                                      corr_impl="xla", attn_impl="full",
                                      dw_impl="xla"))

    # ---- accuracy guard ------------------------------------------------
    # The perf path must not silently corrupt numerics as knobs land: run
    # the SAME fixed clip through (a) the default kernel set at f32 and
    # (b) the plain-XLA composite at f32, and bound the max endpoint error
    # between the two flow fields. f32-vs-f32 isolates the custom kernels
    # from bf16 iteration chaos (ROADMAP r3s5: any summation-order change
    # at bf16 diverges ~2 px on random weights over 12 iterations); the
    # measured kernel-set delta is ~2e-3 px (BASELINE.md r5), so 0.05 px
    # catches real corruption with 25x margin. MAX_EPE_TOL documented in
    # BASELINE.md.
    MAX_EPE_TOL = 0.05

    def flows_of(cfg):
        model = create_model("streamflow", cfg=cfg)
        params = jax.jit(lambda k, x: model.init(k, x, test_mode=True))(
            jax.random.PRNGKey(0), imgs
        )
        return jax.jit(
            lambda p, x: model.apply(p, x, test_mode=True))(params, imgs)

    max_epe = None
    if not fallback:
        fast = flows_of(StreamFlowConfig(T=T, iters=12,
                                         mixed_precision=False))
        ref = flows_of(StreamFlowConfig(T=T, iters=12, mixed_precision=False,
                                        corr_impl="xla", attn_impl="full",
                                        dw_impl="xla", lga_impl="xla",
                                        twins_ffn_fused=False,
                                        ffn_gelu="erf"))
        epe = jnp.sqrt(jnp.sum((fast - ref) ** 2, axis=-1))
        max_epe = float(jnp.max(epe))
        assert max_epe < MAX_EPE_TOL, (
            f"accuracy guard FAILED: max EPE between the default kernel set "
            f"and the f32 XLA composite is {max_epe:.4f} px "
            f"(tolerance {MAX_EPE_TOL})"
        )
        del fast, ref, epe

    # Measure the RTT+dispatch floor with a trivial executable.
    @jax.jit
    def nop(eps):
        return eps + 1.0

    float(nop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    z = jnp.float32(0.0)
    for _ in range(n_rep):
        z = nop(z)
    float(z)
    floor = time.perf_counter() - t0

    t0 = time.perf_counter()
    eps = jnp.float32(1e-6)
    for _ in range(n_rep):
        eps = step(eps)
    r = float(eps)
    total = time.perf_counter() - t0
    dt = max(total - floor, 1e-9) / n_rep

    frames_per_sec = B * T / dt
    print(json.dumps({
        "metric": "streamflow_sintel_436x1024_T4_12iters_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec / TARGET, 4),
        "ms_per_clip": round(1e3 * dt, 2),
        "rtt_floor_ms": round(1e3 * floor / n_rep, 2),
        "check": r,
        **({"max_epe_vs_f32_composite": round(max_epe, 6)}
           if max_epe is not None else {}),
        **({"fallback_config": "xla/full/xla"} if fallback else {}),
    }))


if __name__ == "__main__":
    main()
