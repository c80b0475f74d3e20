"""Device-side numeric primitives: interpolation, stencils, windowed reducers, reductions."""

from xdem_tpu.ops.interp import interp_rowcol, interp_points, grid_coords
from xdem_tpu.ops.reductions import nanmedian, nmad, nanmean, nanstd
from xdem_tpu.ops.transfer import device_mask

__all__ = [
    "interp_rowcol",
    "interp_points",
    "grid_coords",
    "device_mask",
    "nanmedian",
    "nmad",
    "nanmean",
    "nanstd",
]
