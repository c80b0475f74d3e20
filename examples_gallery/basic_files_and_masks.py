"""File formats and mask geometry: GeoTIFF/LAS round-trips, polygonize, proximity.

Demonstrates the self-contained I/O layer (no GDAL/rasterio/laspy) and the
raster<->vector geometry utilities the reference reaches through GDAL.
"""
import os
import tempfile

import numpy as np

from xdem_tpu import examples
from xdem_tpu.epc import read_epc, write_epc
from xdem_tpu.raster import Raster

tmp = tempfile.mkdtemp()

dem = examples.get_ref_dem()

# --- GeoTIFF round-trip through the native C++ codec (DEFLATE write; the reader also
# handles LZW, BigTIFF, and GDAL's floating-point predictor)
tif = os.path.join(tmp, "dem.tif")
dem.save(tif)
back = Raster.open(tif)
assert back.shape == dem.shape and back.crs == dem.crs
print(f"GeoTIFF round-trip: {back.shape} px, CRS {back.crs}")

# --- Elevation point cloud: npz -> csv -> back
epc = examples.get_epc(n_points=20_000)
csv = os.path.join(tmp, "points.csv")
write_epc(csv, epc)
epc2 = read_epc(csv, crs=epc.crs)
print(f"EPC text round-trip: {epc2.point_count} points, "
      f"z median {np.median(epc2.z):.1f} m")

# --- Glacier mask -> polygons -> back to a mask (exact round-trip)
mask = np.asarray(examples.get_glacier_mask())
mask_raster = Raster(mask.astype(np.float32), dem.transform, dem.crs)
outlines = mask_raster.polygonize(1)
remask = outlines.create_mask(dem)
assert np.array_equal(np.asarray(remask), mask)
print(f"polygonize: {len(outlines)} glacier polygons, mask round-trip exact")

# --- Distance to the nearest glacier pixel (e.g. for proximity-based analysis masks)
prox = mask_raster.proximity(target_values=[1.0])
near = np.asarray(prox.data) < 500.0  # within 500 m of a glacier
print(f"proximity: {near.mean():.1%} of the scene lies within 500 m of a glacier")
