from streamflow_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
)
from streamflow_tpu.parallel.seq import make_seq_sharded_forward
from streamflow_tpu.parallel import multihost

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding",
           "make_seq_sharded_forward", "multihost"]
