from .io import (
    read_flo,
    write_flo,
    read_pfm,
    read_flow_kitti,
    write_flow_kitti,
    read_gen,
    read_image,
)
from .augment import FlowAugmentor, SparseFlowAugmentor
from .datasets import (
    FlowDataset,
    MpiSintel,
    FlyingChairs,
    FlyingThings3D,
    KITTI,
    HD1K,
    OminiFlow,
    fetch_dataset,
    WeightedConcat,
)
from .loader import Loader
from .flow_viz import flow_to_image, make_colorwheel

__all__ = [
    "read_flo", "write_flo", "read_pfm", "read_flow_kitti", "write_flow_kitti",
    "read_gen", "read_image",
    "FlowAugmentor", "SparseFlowAugmentor",
    "FlowDataset", "MpiSintel", "FlyingChairs", "FlyingThings3D", "KITTI", "HD1K", "OminiFlow",
    "fetch_dataset", "WeightedConcat", "Loader",
    "flow_to_image", "make_colorwheel",
]
