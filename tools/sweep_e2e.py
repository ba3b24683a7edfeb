"""End-to-end kernel-variant sweep on the benchmark config.

Measures ms/clip for a list of config variants on the live backend, using the
same chained-dependency timing scheme as bench.py (one executable; each call's
input depends on the previous output so the n_rep calls serialize on-device;
RTT floor subtracted).

Usage:
    python tools/sweep_e2e.py default corr=pallas,dw=xla_cond_cfold \
        lga=pallas attn=full

Each positional arg is a comma-separated list of short overrides:
    corr=<corr_impl> dw=<dw_impl> attn=<attn_impl> lga=<lga_impl>
    store=<corr_store> unroll=<scan_unroll> iters=<n> T=<n>
`default` (or an empty spec) is the resolved default config.

Results append to /tmp/sweep_results.txt as well as stdout, so a run that
dies mid-sweep keeps its partial measurements.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_KEYMAP = {
    "corr": "corr_impl",
    "dw": "dw_impl",
    "attn": "attn_impl",
    "lga": "lga_impl",
    "store": "corr_store",
    "unroll": "scan_unroll",
    "iters": "iters",
    "T": "T",
    "tffn": "twins_ffn_fused",
    "bq": "lookup_block_q",
    "lu": "lookup_unroll",
    "lmaj": "lookup_f2_major",
    "lrows": "lookup_rows",
    "gelu": "ffn_gelu",
    "B": "B",  # batch size (clips per step) — not a config field
    "remat": "remat",
    "bidir": "bidir",  # train_bench only: bidirectional supervision
}
_INT_KEYS = {"scan_unroll", "iters", "T", "lookup_block_q", "lookup_unroll",
             "B"}
_BOOL_KEYS = {"twins_ffn_fused", "remat", "bidir"}


def parse_spec(spec: str):
    over = {}
    if spec not in ("default", ""):
        for kv in spec.split(","):
            k, v = kv.split("=")
            k = _KEYMAP.get(k, k)
            if k in _INT_KEYS:
                over[k] = int(v)
            elif k in _BOOL_KEYS:
                over[k] = v not in ("0", "false", "False")
            else:
                over[k] = v
    return over


def main():
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

    T, H, W = 4, 436, 1024
    B_MAX = 8
    rng = np.random.default_rng(0)
    imgs_np = rng.integers(0, 255, (B_MAX, T, H, W, 3))
    padder = InputPadder((H, W, 3), mode="sintel")

    n_rep = int(os.environ.get("SWEEP_NREP", "10"))

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

    out_path = "/tmp/sweep_results.txt"
    specs = sys.argv[1:] or ["default"]
    for spec in specs:
        over = parse_spec(spec)
        t = over.pop("T", T)
        B = over.pop("B", 1)
        cfg = dataclasses.replace(
            StreamFlowConfig(T=t, iters=12, mixed_precision=True), **over
        ).resolve()
        imgs = jnp.asarray(imgs_np[:B, :t], dtype=jnp.float32)
        imgs = padder.pad(imgs.reshape(B * t, H, W, 3)).reshape(
            B, t, *padder.padded_shape, 3
        )
        try:
            model = create_model("streamflow", cfg=cfg)
            params = jax.jit(lambda k, x: model.init(k, x, test_mode=True))(
                jax.random.PRNGKey(0), imgs
            )

            @jax.jit
            def step_(params, imgs, eps):
                flows = model.apply(params, imgs + eps, test_mode=True)
                return jnp.mean(flows) * 1e-9

            step = lambda e: step_(params, imgs, e)
            t0 = time.perf_counter()
            float(step(jnp.float32(0.0)))
            compile_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            eps = jnp.float32(1e-6)
            for _ in range(n_rep):
                eps = step(eps)
            chk = float(eps)
            total = time.perf_counter() - t0
            dt = max(total - floor, 1e-9) / n_rep
            row = {
                "spec": spec,
                "ms_per_clip": round(1e3 * dt, 2),
                "frames_per_sec": round(B * t / dt, 2),
                "compile_s": round(compile_s, 1),
                "check": chk,
                "resolved": {
                    "corr": cfg.corr_impl, "dw": cfg.dw_impl,
                    "attn": cfg.attn_impl, "lga": cfg.lga_impl,
                },
            }
        except Exception as e:  # keep sweeping past a broken variant
            row = {"spec": spec, "error": f"{type(e).__name__}: {e}"[:300]}
        line = json.dumps(row)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
