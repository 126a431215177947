"""Pallas TPU kernel for the fused correlation-pyramid window lookup.

Placeholder for round-1 perf pass: the XLA gather formulation in
`ops/corr.py` is the reference implementation; this module will hold the
fused Pallas kernel that gathers all 4 levels' (2r+1)^2 windows per query
block straight from HBM-resident pyramid levels.
"""

from __future__ import annotations


def pallas_lookup_supported() -> bool:
    """Whether the fused Pallas lookup kernel is available on this backend."""
    return False


def lookup_corr_pyramid_pallas(levels, coords, radius):
    raise NotImplementedError("Pallas corr lookup not implemented yet; use impl='xla'.")
