from .coords import coords_grid, resize_bilinear_align_corners, resize_bilinear, upflow8, forward_interpolate
from .sampler import bilinear_sample
from .pool import avg_pool2x2
from .corr import all_pairs_corr, corr_pyramid, lookup_corr_pyramid, CorrPyramid
from .upsample import convex_upsample, unfold3x3
from .padding import InputPadder
from .local_corr import local_corr

__all__ = [
    "coords_grid",
    "forward_interpolate",
    "resize_bilinear_align_corners",
    "resize_bilinear",
    "upflow8",
    "bilinear_sample",
    "avg_pool2x2",
    "all_pairs_corr",
    "corr_pyramid",
    "lookup_corr_pyramid",
    "CorrPyramid",
    "convex_upsample",
    "unfold3x3",
    "InputPadder",
    "local_corr",
]
