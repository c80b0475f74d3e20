"""Device-side numeric primitives: interpolation, stencils, windowed reducers, reductions."""

from xdem_tpu.ops.interp import interp_rowcol, interp_points, grid_coords
from xdem_tpu.ops.reductions import nanmedian, nmad, nanmean, nanstd

__all__ = [
    "interp_rowcol",
    "interp_points",
    "grid_coords",
    "nanmedian",
    "nmad",
    "nanmean",
    "nanstd",
]
