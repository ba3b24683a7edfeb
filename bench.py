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
    import sys

    t_start = time.perf_counter()
    # Wall budget for the whole benchmark (the driver kills ~30 min runs;
    # the axon pool sometimes degrades to ~100 s per compile RPC — r5s2
    # measured a trivial 256x256 matmul at 107 s). When the budget is more
    # than ~40% spent before the accuracy guard's two extra full-model
    # compiles, skip the guard (with a note in the JSON) rather than losing
    # the whole artifact.
    budget = float(os.environ.get("GRAFT_BENCH_BUDGET_S", "1500"))

    def mark(msg):
        print(f"bench[{time.perf_counter() - t_start:6.0f}s]: {msg}",
              file=sys.stderr, flush=True)

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
    mark("compiling default bf16 config")
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
    # (b) the plain-XLA composite at f32, and bound the RELATIVE endpoint
    # error between the two flow fields after ONE refinement iteration.
    #
    # Why relative, and why iters=1 (measured r5s2, tools/probe_guard.py):
    # on RANDOM weights the model's own dynamics diverge (|flow| ~1.4e3 px
    # after 1 iteration, 8e7 after 12) and amplify per-op f32 rounding
    # ~2.7x per iteration — the legitimate kernel-set delta is ~3.2e-2
    # relative at iters=1 and grows to O(1e7) px by iters=12, so an
    # absolute 12-iteration bound cannot distinguish rounding from
    # corruption. At iters=1 a gross kernel bug (wrong window, channel
    # order, miscompile) is an O(1) relative error; legitimate rounding +
    # the poly-gelu approximation stay ~3e-2. Tolerance 0.30 has ~10x
    # margin to both. Documented in BASELINE.md.
    REL_EPE_TOL = 0.30

    def flows_of(cfg):
        model = create_model("streamflow", cfg=cfg)
        params = jax.jit(lambda k, x: model.init(k, x, test_mode=True))(
            jax.random.PRNGKey(0), imgs
        )
        return jax.jit(
            lambda p, x: model.apply(p, x, test_mode=True))(params, imgs)

    max_epe = None
    guard_skipped = None
    if fallback:
        guard_skipped = "fallback config"
    elif time.perf_counter() - t_start > 0.4 * budget:
        # two more full-model compiles won't fit; keep the artifact
        guard_skipped = (
            f"budget ({time.perf_counter() - t_start:.0f}s of {budget:.0f}s "
            f"spent before the guard)")
        mark(f"accuracy guard SKIPPED: {guard_skipped}")
    else:
        mark("accuracy guard: compiling f32 default kernel set (iters=1)")
        fast = flows_of(StreamFlowConfig(T=T, iters=1,
                                         mixed_precision=False))
        mark("accuracy guard: compiling f32 XLA composite (iters=1)")
        ref = flows_of(StreamFlowConfig(T=T, iters=1, mixed_precision=False,
                                        corr_impl="xla", attn_impl="full",
                                        dw_impl="xla", lga_impl="xla",
                                        twins_ffn_fused=False,
                                        ffn_gelu="erf"))
        epe = jnp.sqrt(jnp.sum((fast - ref) ** 2, axis=-1))
        flow_scale = max(1.0, float(jnp.max(jnp.sqrt(jnp.sum(ref ** 2, -1)))))
        max_epe = float(jnp.max(epe)) / flow_scale
        assert np.isfinite(max_epe), "accuracy guard: non-finite flows"
        assert max_epe < REL_EPE_TOL, (
            f"accuracy guard FAILED: relative EPE between the default kernel "
            f"set and the f32 XLA composite at iters=1 is {max_epe:.4f} "
            f"(tolerance {REL_EPE_TOL})"
        )
        del fast, ref, epe

    mark("timing")

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
        **({"rel_epe_vs_f32_composite_1iter": round(max_epe, 6)}
           if max_epe is not None else {}),
        **({"accuracy_guard_skipped": guard_skipped} if guard_skipped else {}),
        **({"fallback_config": "xla/full/xla"} if fallback else {}),
    }))


if __name__ == "__main__":
    main()
