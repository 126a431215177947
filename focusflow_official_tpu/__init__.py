"""FocusFlow-TPU: a TPU-native (JAX/XLA/Pallas) keypoint-conditioned optical-flow framework.

A from-scratch rebuild of the capabilities of ZhonghuaYi/FocusFlow_official
(IEEE TIV 2023, arXiv:2308.07104) designed for TPU hardware: NHWC layouts,
`lax.scan` iterative refinement, fused XLA/Pallas correlation kernels, `pjit`
data-parallel training over a `jax.sharding.Mesh`, bf16 compute, and Orbax
checkpointing.

Subpackages
-----------
- ``ops``     : numeric primitives (correlation pyramid + lookup, bilinear
                sampling, convex upsampling, padding).
- ``nn``      : flax building blocks (encoders, Condition Control Encoder,
                fusion units, ConvGRU update blocks).
- ``models``  : FF-RAFT / FF-PWCNet / FF-FlowFormer conditioned flow models.
- ``losses``  : sequence-weighted (EPE/CPCL/Mix) and multiscale loss families.
- ``data``    : flow/mask datasets, codecs, mask-aware augmentation.
- ``train``   : pjit'd train loop, mesh utilities, eval protocol, checkpoints.
- ``compat``  : torch checkpoint import for parity testing.
- ``predict`` : three-line inference API (`FlowPredictor`).
"""

__version__ = "0.1.0"
