"""Standalone A/B of the FFN-pair kernel's gelu implementation.

The kernel's elementwise chain (3-4 erf-gelus per row) costs about as many
VPU cycles as its two matmuls cost MXU cycles at C=384 (BASELINE r4s3), so
the erf rational (4/6 minimax + a VPU divide) is a candidate for a cheaper
polynomial. Usage:

    python tools/probe_gelu_ffn.py [erf|poly|tanh] [C] [rows]
"""

import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from streamflow_tpu.ops.pallas import _ffn_kernel as fk

impl = sys.argv[1] if len(sys.argv) > 1 else "erf"
C = int(sys.argv[2]) if len(sys.argv) > 2 else 384
rows = int(sys.argv[3]) if len(sys.argv) > 3 else 21120

# erf(x) ~ x * p(x^2) on [0,3], saturating outside (erf(3)=0.99998);
# least-squares on Chebyshev nodes, abs-error weighted. max|err| 4.0e-4.
_ERF_POLY = (3.64476874220969839e-06, -1.35030047617407806e-04,
             2.10968155734540678e-03, -1.83597971202626026e-02,
             9.98778049755993935e-02, -3.67134565174511318e-01,
             1.12662306241423282e+00)


def _poly_gelu(x):
    xc = jnp.clip(x, -3.0 * math.sqrt(2.0), 3.0 * math.sqrt(2.0))
    t = xc * xc * 0.5
    acc = jnp.full(t.shape, _ERF_POLY[0], jnp.float32)
    for c in _ERF_POLY[1:]:
        acc = acc * t + c
    return x * 0.5 * (1.0 + xc * (1.0 / math.sqrt(2.0)) * acc)


def _tanh_gelu(x):
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


if impl == "poly":
    fk._gelu = _poly_gelu
elif impl == "tanh":
    fk._gelu = _tanh_gelu

rng = np.random.default_rng(0)
dt = jnp.bfloat16
x = jnp.asarray(rng.standard_normal((rows, C)), dt)
y = jnp.asarray(rng.standard_normal((rows, C)), dt)
db = jnp.asarray(rng.standard_normal((C,)), dt)
wp = jnp.asarray(rng.standard_normal((C, C)) / math.sqrt(C), dt)
bp = jnp.zeros((C,), dt)
h = int(1.5 * C)
w1 = jnp.asarray(rng.standard_normal((C, h)) / math.sqrt(C), dt)
b1 = jnp.zeros((h,), dt)
w2 = jnp.asarray(rng.standard_normal((h, C)) / math.sqrt(h), dt)
b2 = jnp.zeros((C,), dt)

f = jax.jit(lambda *a: fk.dwres_pw_ffn_pair(*a, residual=False))
out = f(x, y, db, wp, bp, w1, b1, w2, b2)
jax.block_until_ready(out)

reps = 200
t0 = time.perf_counter()
for _ in range(reps):
    out = f(x, y, db, wp, bp, w1, b1, w2, b2)
jax.block_until_ready(out)
dtime = (time.perf_counter() - t0) / reps * 1e3

ref = fk.ffn_pair_xla(x.astype(jnp.float32), w1.astype(jnp.float32),
                      b1.astype(jnp.float32), w2.astype(jnp.float32),
                      b2.astype(jnp.float32), residual=False,
                      wp=wp.astype(jnp.float32), bp=bp.astype(jnp.float32),
                      yres=y.astype(jnp.float32), db=db.astype(jnp.float32))
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
mxu_ms = 8 * rows * C * C * 2 / 197e12 * 1e3
print(f"impl={impl} C={C} rows={rows}: {dtime:.3f} ms/call "
      f"(mxu floor ~{mxu_ms:.3f}), max|err| vs f32-erf composite {err:.2e}")
