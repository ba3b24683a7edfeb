"""Sequence/spatial parallelism: shard the H axis of one clip over the mesh's
'seq' axis (SURVEY §2.6 TP row — the reference has no equivalent; it tiles
1080p inputs on one GPU instead, evaluate_mf.py:887-916).

TPU-native design: annotate the input/output shardings and let GSPMD
partition the whole forward — spatial convs get halo exchanges, the
correlation/GMA query axis (N = H*W, H sharded) is partitioned so each
device holds its query slab against replicated keys/targets, and the
all-pairs volume's O(N^2) memory splits n_seq ways. Collectives are compiler
-inserted over ICI; nothing is hand-written (scaling-book recipe).

Use for 1080p+ inference where one chip's HBM cannot hold the volume or
attention maps even in their chunked forms.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_seq_sharded_forward(model, mesh: Mesh, iters=None):
    """jitted forward with the image H axis sharded over the 'seq' mesh axis
    (and batch over 'data'). Returns fwd(params, images) -> flows with
    identical numerics to the unsharded model."""
    img_sh = NamedSharding(mesh, P(None, None, "seq", None, None))
    repl = NamedSharding(mesh, P())
    # Output: batch stays sharded over 'data'; only the SPATIAL dims are
    # forced replicated. Re-pinning the upsampled flows to an H- or
    # W-sharded layout trips an XLA SPMD partitioner miscompile around the
    # convex-upsample graph (sharded-spatial output constraints return
    # garbage on the CPU partitioner; spatially-replicated is exact —
    # verified element-wise against the unsharded forward). Memory cost of
    # the workaround: each device in a seq group materializes the full
    # (B/n_data, T-1, H, W, 2) upsampled output — 16 MB/frame-pair fp32 at
    # 1080p, small next to the sharded volume; revisit when the partitioner
    # bug is fixed.
    out_sh = NamedSharding(mesh, P("data"))

    @jax.jit
    def fwd(params, images):
        images = jax.lax.with_sharding_constraint(images, img_sh)
        flows = model.apply(params, images, iters=iters, test_mode=True)
        return jax.lax.with_sharding_constraint(flows, out_sh)

    def run(params, images):
        params = jax.device_put(params, repl)
        images = jax.device_put(images, img_sh)
        return fwd(params, images)

    return run
