from .norm import Norm
from .blocks import ResidualBlock, BottleneckBlock
from .encoders import BasicEncoder, SmallEncoder, ChannelProject
from .fusion_units import FusionUnit, CA, SA, Concat, Conv1x1
from .cce import BasicParallelFusionLayer
from .update import (
    FlowHead,
    ConvGRU,
    SepConvGRU,
    SmallMotionEncoder,
    BasicMotionEncoder,
    SmallUpdateBlock,
    BasicUpdateBlock,
)

__all__ = [
    "Norm",
    "ResidualBlock",
    "BottleneckBlock",
    "BasicEncoder",
    "SmallEncoder",
    "ChannelProject",
    "FusionUnit",
    "CA",
    "SA",
    "Concat",
    "Conv1x1",
    "BasicParallelFusionLayer",
    "FlowHead",
    "ConvGRU",
    "SepConvGRU",
    "SmallMotionEncoder",
    "BasicMotionEncoder",
    "SmallUpdateBlock",
    "BasicUpdateBlock",
]
