from .config import FFRaftConfig
from .ff_raft import RAFT, FFRaft
from .ff_pwcnet import PWCNet, FFPWCNet
from .ff_flowformer import FlowFormer, FFFlowFormer, FlowFormerConfig
from .mask_modal import init_mask, gaussian_kernel, ellipse_kernel

__all__ = [
    "FFRaftConfig",
    "RAFT",
    "FFRaft",
    "PWCNet",
    "FFPWCNet",
    "FlowFormer",
    "FFFlowFormer",
    "FlowFormerConfig",
    "init_mask",
    "gaussian_kernel",
    "ellipse_kernel",
]
