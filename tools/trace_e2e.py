"""Profile the benchmark-config forward and print a per-op-group self-time
summary (the measurement tool behind BASELINE.md's trace budgets).

Usage:
    python tools/trace_e2e.py [spec] [--raw N]

``spec`` is a tools/sweep_e2e.py-style override list (default: resolved
default config). ``--raw N`` prints the top-N individual device ops instead
of only the grouped summary.

Groups are keyed on XLA HLO/Mosaic event-name heuristics: convolutions, the
Mosaic custom-call kernels (lookup/ffn/flash/dw-chain/lga), dots, fusions,
copies/transposes, pads, and everything else.
"""

import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def classify(name: str) -> str:
    n = name.lower()
    if n.startswith(("cond", "conditional")):
        return "cond(shielded dw)"
    if "convolution" in n or n.startswith("conv"):
        return "convolution"
    for kern, label in (
        ("corr_lookup", "kernel:fused_lookup"),
        ("fused_lookup", "kernel:fused_lookup"),
        ("ffn_pair", "kernel:ffn_pair"),
        ("pw_ffn", "kernel:ffn_pair"),
        ("flash", "kernel:flash_attn"),
        ("dw_chain", "kernel:dw_chain"),
        ("lga", "kernel:lga"),
        ("banded", "kernel:dw_banded"),
    ):
        if kern in n:
            return label
    if "custom-call" in n or "custom_call" in n:
        return "custom-call:other"
    if "dot" in n or "matmul" in n or "einsum" in n or "gemm" in n:
        return "dot"
    if "copy" in n or "transpose" in n:
        return "copy/transpose"
    if n.startswith("pad") or ".pad" in n:
        return "pad"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n or "loop_" in n or n.startswith("input_"):
        return "fusion"
    if "dynamic" in n or "slice" in n or "gather" in n or "scatter" in n:
        return "slice/gather"
    return "other"


def main():
    raw_n = 0
    args = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--raw":
            raw_n = int(next(it))
        else:
            args.append(a)
    spec = args[0] if args else "default"

    import dataclasses

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from streamflow_tpu.config import StreamFlowConfig
    from streamflow_tpu.models import create_model
    from streamflow_tpu.ops.padding import InputPadder
    from tools.sweep_e2e import parse_spec

    B, T, H, W = 1, 4, 436, 1024
    over = parse_spec(spec)
    t = over.pop("T", T)
    cfg = dataclasses.replace(
        StreamFlowConfig(T=t, iters=12, mixed_precision=True), **over
    ).resolve()
    print(f"config: corr={cfg.corr_impl} dw={cfg.dw_impl} attn={cfg.attn_impl}"
          f" lga={cfg.lga_impl}", flush=True)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (B, t, H, W, 3)), jnp.float32)
    padder = InputPadder((H, W, 3), mode="sintel")
    imgs = padder.pad(imgs.reshape(B * t, H, W, 3)).reshape(
        B, t, *padder.padded_shape, 3)

    model = create_model("streamflow", cfg=cfg)
    params = jax.jit(lambda k, x: model.init(k, x, test_mode=True))(
        jax.random.PRNGKey(0), imgs)

    @jax.jit
    def step(params, imgs, eps):
        return jnp.mean(model.apply(params, imgs + eps, test_mode=True)) * 1e-9

    float(step(params, imgs, jnp.float32(0.0)))  # compile

    tmp = tempfile.mkdtemp(prefix="sf_trace_")
    with jax.profiler.trace(tmp):
        eps = jnp.float32(1e-6)
        for _ in range(3):
            eps = step(params, imgs, eps)
        float(eps)

    files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace written under {tmp}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    # Leaf op events only: the "XLA Ops" threads of the device process.
    # (The "XLA Modules" / TraceMe threads carry container spans — jit_step,
    # while bodies — that would double-count their children.)
    op_tids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            if "XLA Ops" in ev["args"].get("name", ""):
                op_tids.add((ev["pid"], ev["tid"]))

    # Self time = duration minus nested children (while bodies / cond
    # branches appear as enclosing spans on the same track).
    tracks = defaultdict(list)
    meta = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        name = ev.get("name", "")
        if name.startswith(("Steal", "Infeed", "Outfeed")):
            continue
        args = ev.get("args", {})
        if name not in meta:
            src = args.get("source", "")
            src = re.sub(r".*/(streamflow_tpu|tools)/", r"\1/", src)
            meta[name] = (args.get("hlo_category", ""), src)
        tracks[(ev["pid"], ev["tid"])].append(
            (ev["ts"], ev["ts"] + ev.get("dur", 0), name))

    per_op = defaultdict(float)
    for evs in tracks.values():
        evs.sort(key=lambda e: (e[0], -e[1]))
        stack = []  # [start, end, name, child_time]
        def pop():
            s, e, n, child = stack.pop()
            per_op[n] += (e - s) - child
            if stack:
                stack[-1][3] += e - s
        for ts, te, name in evs:
            while stack and ts >= stack[-1][1]:
                pop()
            stack.append([ts, te, name, 0.0])
        while stack:
            pop()

    groups = defaultdict(float)
    by_site = defaultdict(float)
    for name, us in per_op.items():
        cat, src = meta.get(name, ("", ""))
        groups[cat or classify(name)] += us
        by_site[(cat or classify(name), src)] += us

    total = sum(groups.values())
    print(f"\ndevice self-time over 3 steps: {total / 3e3:.1f} ms/step")
    for g, us in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {g:28s} {us / 3e3:8.2f} ms/step  ({100 * us / total:4.1f}%)")

    print("\ntop sites (category @ source):")
    for (cat, src), us in sorted(by_site.items(), key=lambda kv: -kv[1])[:24]:
        print(f"  {us / 3e3:8.2f} ms/step  {cat:26s} {src[:70]}")

    if raw_n:
        print(f"\ntop {raw_n} ops:")
        for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:raw_n]:
            cat, src = meta.get(name, ("", ""))
            print(f"  {us / 3e3:8.2f} ms/step  [{cat or classify(name)}] "
                  f"{name[:60]} @ {src[:60]}")


if __name__ == "__main__":
    main()
