from streamflow_tpu.convert.torch_import import (
    convert_raft_checkpoint,
    convert_streamflow_checkpoint,
)

__all__ = ["convert_raft_checkpoint", "convert_streamflow_checkpoint"]
