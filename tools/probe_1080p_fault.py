"""Bisect the 1080x1920 TPU worker crash: run each Pallas kernel standalone
at the exact shapes the flagship hits at 1080p (each probe in its own
subprocess so a worker crash is attributable and survivable).

  python tools/probe_1080p_fault.py          # run all probes
  python tools/probe_1080p_fault.py lga1     # run one probe in-process
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def _setup():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


# ---- LGA (Twins stage 1/2 at 1080p: temporal grid (H/4*T, W/4)) ----------
@probe
def lga1():
    jax = _setup()
    import jax.numpy as jnp
    from streamflow_tpu.ops.pallas._lga_kernel import lga_attention

    k = jax.random.PRNGKey(0)
    qkv = jax.random.normal(k, (1, 1085, 483, 3 * 128), jnp.bfloat16)
    out = lga_attention(qkv, ws=7, nh=4)
    return float(jnp.mean(out.astype(jnp.float32)))


@probe
def lga2():
    jax = _setup()
    import jax.numpy as jnp
    from streamflow_tpu.ops.pallas._lga_kernel import lga_attention

    k = jax.random.PRNGKey(0)
    qkv = jax.random.normal(k, (1, 546, 245, 3 * 256), jnp.bfloat16)
    out = lga_attention(qkv, ws=7, nh=8)
    return float(jnp.mean(out.astype(jnp.float32)))


# ---- fused corr lookup at the 1080p level pyramid ------------------------
@probe
def lookup():
    jax = _setup()
    import jax.numpy as jnp
    from streamflow_tpu.ops.pallas._fused_lookup_kernel import (
        fused_corr_lookup, pool_pyramid)

    k = jax.random.PRNGKey(0)
    f1 = jax.random.normal(k, (3, 135, 240, 256), jnp.bfloat16)
    f2 = jax.random.normal(jax.random.PRNGKey(1), (3, 135, 240, 256),
                           jnp.bfloat16)
    coords = jax.random.uniform(jax.random.PRNGKey(2), (3, 135, 240, 2),
                                jnp.float32) * 200.0
    out = fused_corr_lookup(f1, tuple(pool_pyramid(f2, 4)), coords)
    return float(jnp.mean(out))


# ---- flash attention: GMA (N=32400) and GSA shapes -----------------------
@probe
def flash_gma():
    jax = _setup()
    import jax.numpy as jnp
    from streamflow_tpu.ops.pallas._attention_kernel import flash_attention_tpu

    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (3, 1, 32400, 128), jnp.bfloat16)
    kk = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 32400, 128),
                           jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (3, 1, 32400, 128),
                          jnp.bfloat16)
    out = flash_attention_tpu(q, kk, v)
    return float(jnp.mean(out.astype(jnp.float32)))


@probe
def flash_gsa1():
    # stage-1 GSA: q over the temporal grid (1080*483 tokens... actual:
    # N = ht*w = 1080*480 = 518400; kv sr_ratio 8 -> (135, 60) -> 8100
    jax = _setup()
    import jax.numpy as jnp
    from streamflow_tpu.ops.pallas._attention_kernel import flash_attention_tpu

    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (1, 4, 518400, 32), jnp.bfloat16)
    kk = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8100, 32),
                           jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8100, 32),
                          jnp.bfloat16)
    out = flash_attention_tpu(q, kk, v)
    return float(jnp.mean(out.astype(jnp.float32)))


@probe
def flash_gsa2():
    # stage-2 GSA: N = 540*240 = 129600; kv sr 4 -> (135, 60) -> 8100
    jax = _setup()
    import jax.numpy as jnp
    from streamflow_tpu.ops.pallas._attention_kernel import flash_attention_tpu

    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (1, 8, 129600, 32), jnp.bfloat16)
    kk = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8100, 32),
                           jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8100, 32),
                          jnp.bfloat16)
    out = flash_attention_tpu(q, kk, v)
    return float(jnp.mean(out.astype(jnp.float32)))


@probe
def lookup_model():
    # the in-model call pattern: prepared operands, bf16 out, integer-grid
    # start coords, chained lookups under lax.scan, barriers. Knobs (env):
    # LKP_DT=f32|bf16, LKP_LEN=N, LKP_OFF=float, LKP_H, LKP_W, LKP_SCAN=0|1
    jax = _setup()
    import jax.numpy as jnp
    from streamflow_tpu.ops.pallas.corr import PallasCorr
    from streamflow_tpu.ops.coords import coords_grid

    H = int(os.environ.get("LKP_H", "135"))
    W = int(os.environ.get("LKP_W", "240"))
    dt = jnp.float32 if os.environ.get("LKP_DT") == "f32" else jnp.bfloat16
    length = int(os.environ.get("LKP_LEN", "15"))
    off = float(os.environ.get("LKP_OFF", "0.0"))
    use_scan = os.environ.get("LKP_SCAN", "1") == "1"
    nl = int(os.environ.get("LKP_NL", "4"))
    rows = os.environ.get("LKP_ROWS", "dynamic")
    ur = int(os.environ.get("LKP_U", "4"))

    k = jax.random.PRNGKey(0)
    f1 = jax.random.normal(k, (3, H, W, 256), jnp.bfloat16)
    f2 = jax.random.normal(jax.random.PRNGKey(1), (3, H, W, 256),
                           jnp.bfloat16)

    @jax.jit
    def run(f1, f2):
        pyr = PallasCorr.build(f1, f2, nl, 4, block_q=512, unroll=ur,
                               rows=rows)
        coords = coords_grid(3, H, W) + off

        def body(c, _):
            out = pyr.lookup(c, out_dtype=dt)
            c = c + jnp.mean(out.astype(jnp.float32)) + 0.3
            return c, ()

        if use_scan:
            c, _ = jax.lax.scan(body, coords, None, length=length)
        else:
            c = coords
            for _ in range(length):
                c, _ = body(c, None)
        return jnp.mean(c)

    return float(run(f1, f2))


@probe
def lookup_flash():
    # lookup + GMA-shaped flash attention in the same scan body (the
    # minimal in-model combination hunt)
    jax = _setup()
    import jax.numpy as jnp
    from streamflow_tpu.ops.pallas.corr import PallasCorr
    from streamflow_tpu.ops.pallas._attention_kernel import flash_attention_tpu
    from streamflow_tpu.ops.coords import coords_grid

    H = int(os.environ.get("LKP_H", "135"))
    W = int(os.environ.get("LKP_W", "240"))
    k = jax.random.PRNGKey(0)
    f1 = jax.random.normal(k, (3, H, W, 256), jnp.bfloat16)
    f2 = jax.random.normal(jax.random.PRNGKey(1), (3, H, W, 256),
                           jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(2), (3, 1, H * W, 128),
                          jnp.bfloat16)

    @jax.jit
    def run(f1, f2, q):
        pyr = PallasCorr.build(f1, f2, 4, 4, block_q=512, unroll=2)
        coords = coords_grid(3, H, W)

        def body(c, _):
            out = pyr.lookup(c, out_dtype=jnp.bfloat16)
            a = flash_attention_tpu(q, q, q)
            c = (c + jnp.mean(out.astype(jnp.float32))
                 + jnp.mean(a.astype(jnp.float32)) + 0.3)
            return c, ()

        c, _ = jax.lax.scan(body, coords, None, length=15)
        return jnp.mean(c)

    return float(run(f1, f2, q))


@probe
def lookup_ffn():
    # lookup + an SK/Twins-shaped fused FFN-pair kernel in the same scan
    jax = _setup()
    import jax.numpy as jnp
    from streamflow_tpu.ops.pallas._ffn_kernel import ffn_pair
    from streamflow_tpu.ops.pallas.corr import PallasCorr
    from streamflow_tpu.ops.coords import coords_grid

    H = int(os.environ.get("LKP_H", "135"))
    W = int(os.environ.get("LKP_W", "240"))
    k = jax.random.PRNGKey(0)
    f1 = jax.random.normal(k, (3, H, W, 256), jnp.bfloat16)
    f2 = jax.random.normal(jax.random.PRNGKey(1), (3, H, W, 256),
                           jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(2), (3 * H * W, 384),
                          jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(3), (384, 384), jnp.bfloat16)
    b1 = jnp.zeros((384,), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.PRNGKey(4), (384, 384), jnp.bfloat16)
    b2 = jnp.zeros((384,), jnp.bfloat16)

    bq = int(os.environ.get("LKP_BQ", "512"))
    ur = int(os.environ.get("LKP_U", "2"))
    nl = int(os.environ.get("LKP_NL", "4"))
    gelu = os.environ.get("FFN_GELU", "poly")

    @jax.jit
    def run(f1, f2, x):
        pyr = PallasCorr.build(f1, f2, nl, 4, block_q=bq, unroll=ur)
        coords = coords_grid(3, H, W)

        def body(c, _):
            out = pyr.lookup(c, out_dtype=jnp.bfloat16)
            y = ffn_pair(x, w1, b1, w2, b2, gelu=gelu)
            c = (c + jnp.mean(out.astype(jnp.float32))
                 + jnp.mean(y.astype(jnp.float32)) + 0.3)
            return c, ()

        c, _ = jax.lax.scan(body, coords, None, length=15)
        return jnp.mean(c)

    return float(run(f1, f2, x))


@probe
def ffn_alone():
    # the SK-shaped fused FFN-pair kernel alone, in a scan, at the 1080p
    # row count (n=97200 -> _pick_block 720)
    jax = _setup()
    import jax.numpy as jnp
    from streamflow_tpu.ops.pallas._ffn_kernel import ffn_pair

    H = int(os.environ.get("LKP_H", "135"))
    W = int(os.environ.get("LKP_W", "240"))
    x = jax.random.normal(jax.random.PRNGKey(2), (3 * H * W, 384),
                          jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(3), (384, 384), jnp.bfloat16)
    b1 = jnp.zeros((384,), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.PRNGKey(4), (384, 384), jnp.bfloat16)
    b2 = jnp.zeros((384,), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(c, _):
            y = ffn_pair(x + c, w1, b1, w2, b2, gelu="poly")
            return (c + jnp.mean(y.astype(jnp.float32))
                    .astype(jnp.bfloat16) * 1e-3), ()

        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=15)
        return c

    return float(run(x))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "stress":
        # stress <probe> <n>: run a probe n times in subprocesses, report
        # the pass rate (the fault is a nondeterministic runtime race)
        name, n = sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 5
        ok = 0
        for i in range(n):
            r = subprocess.run([sys.executable, __file__, name],
                               capture_output=True, text=True, timeout=1500)
            ok += r.returncode == 0
            print(f"  {name} run {i}: {'OK' if r.returncode == 0 else 'CRASH'}",
                  flush=True)
        print(f"stress {name}: {ok}/{n} ok")
        return
    if len(sys.argv) > 1:
        name = sys.argv[1]
        v = PROBES[name]()
        print(f"{name}: OK ({v:.5f})", flush=True)
        return
    for name in PROBES:
        r = subprocess.run(
            [sys.executable, __file__, name],
            capture_output=True, text=True, timeout=1500)
        tail = (r.stdout + r.stderr).strip().splitlines()[-1:] or [""]
        status = "OK" if r.returncode == 0 else f"FAIL rc={r.returncode}"
        print(f"{name:12s} {status}  {tail[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
