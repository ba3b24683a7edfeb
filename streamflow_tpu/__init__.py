"""streamflow_tpu — a TPU-native multi-frame optical-flow framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the StreamFlow
reference (multi-frame RAFT-family optical flow, NeurIPS'24). Everything is
channel-last (NHWC), functionally pure, and designed around XLA's compilation
model: static shapes, `lax.scan` refinement loops, `pjit`/`shard_map` over
device meshes, and Pallas kernels for the memory-bound hot paths (all-pairs
correlation lookup, blocked attention).
"""

from streamflow_tpu.config import StreamFlowConfig, RAFTConfig

__version__ = "0.1.0"

__all__ = ["StreamFlowConfig", "RAFTConfig", "__version__"]
