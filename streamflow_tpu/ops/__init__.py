from streamflow_tpu.ops.coords import (
    coords_grid,
    upflow,
    downflow,
    resize_flow,
)
from streamflow_tpu.ops.sampler import bilinear_sampler
from streamflow_tpu.ops.corr import (
    corr_volume,
    corr_pyramid,
    corr_lookup,
    CorrPyramid,
)
from streamflow_tpu.ops.upsample import convex_upsample
from streamflow_tpu.ops.padding import InputPadder

__all__ = [
    "coords_grid",
    "upflow",
    "downflow",
    "resize_flow",
    "bilinear_sampler",
    "corr_volume",
    "corr_pyramid",
    "corr_lookup",
    "CorrPyramid",
    "convex_upsample",
    "InputPadder",
]
