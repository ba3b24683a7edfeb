from streamflow_tpu.layers.common import Mlp, LayerNorm, gelu
from streamflow_tpu.layers.sk import SKBlock
from streamflow_tpu.layers.gma import (
    GMAAttention,
    GMAAggregate,
    TemporalAggregate,
    TemporalAttentionMap,
)
from streamflow_tpu.layers.temporal import TransformerBlock, TemporalLayer
from streamflow_tpu.layers.update import (
    SKMotionEncoder6,
    SKUpdateBlockTAMv3,
    SKUpdateBlockAllDecoder,
    BasicMotionEncoder,
    BasicUpdateBlock,
    GMAUpdateBlock,
    SepConvGRU,
    FlowHead,
)
from streamflow_tpu.layers.twins import (
    Twins,
    Twins1DConv,
    Twins3DConv,
    TwinsCSC,
    TwinsTemporalAttention,
)
from streamflow_tpu.layers.basic_encoder import BasicEncoder

__all__ = [
    "Mlp",
    "LayerNorm",
    "gelu",
    "SKBlock",
    "GMAAttention",
    "GMAAggregate",
    "TemporalAggregate",
    "TransformerBlock",
    "TemporalLayer",
    "SKMotionEncoder6",
    "SKUpdateBlockTAMv3",
    "SKUpdateBlockAllDecoder",
    "BasicMotionEncoder",
    "BasicUpdateBlock",
    "GMAUpdateBlock",
    "SepConvGRU",
    "FlowHead",
    "TwinsCSC",
    "Twins",
    "BasicEncoder",
]
