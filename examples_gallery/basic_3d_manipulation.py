"""3D DEM manipulation: translations and rigid rotations without a fit.

Mirrors the reference's basic gallery page (reference examples/basic/plot_3d_manipulation.py):
when a shift or rotation is known in advance, it can be applied directly —
- a pure translation with `Raster.translate` (geotransform update, no resampling),
- a rotation+translation with `coreg.apply_matrix` from a hand-built 4x4 matrix,
- a combined rotation from Euler angles with `coreg.matrix_from_translations_rotations`.
"""
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from xdem_tpu import coreg, examples

os.makedirs("gallery_outputs", exist_ok=True)

dem = examples.get_ref_dem().icrop((100, 200), (100, 200))

# Pure translation: only the geotransform moves; z is an array constant add.
shift_x, shift_y, shift_z = 3 * dem.res[0], 5 * dem.res[1], 20.0
dem_shifted = dem.translate(shift_x, shift_y) + shift_z
print(f"translated bounds: {tuple(round(b, 1) for b in dem_shifted.bounds)}")

# Rotation + translation from a manually constructed 4x4 rigid matrix:
# 0.6 degrees across-track (X axis), about the raster's centroid.
rotation = np.deg2rad(0.6)
matrix = np.array(
    [
        [1, 0, 0, shift_x],
        [0, np.cos(rotation), -np.sin(rotation), shift_y],
        [0, np.sin(rotation), np.cos(rotation), shift_z],
        [0, 0, 0, 1],
    ]
)
centroid = (
    dem.bounds[0] + (dem.bounds[2] - dem.bounds[0]) / 2,
    dem.bounds[1] + (dem.bounds[3] - dem.bounds[1]) / 2,
    float(np.nanmean(dem.get_nanarray())),
)
rotated = coreg.apply_matrix(dem, matrix=matrix, centroid=centroid)
diff = dem.get_nanarray() - rotated.get_nanarray()
print(
    "dh after 0.6 deg X-rotation + (%.1f, %.1f, %.1f) m translation:"
    % (shift_x, shift_y, shift_z)
    + f" min {np.nanmin(diff):.1f} m, max {np.nanmax(diff):.1f} m"
)
diff_r = dem.copy(new_array=diff)
diff_r.plot(cmap="RdYlBu", cbar_title="Elevation differences (m)")
plt.savefig("gallery_outputs/manipulation_rotation_dh.png", dpi=100)
plt.close()

# Combined rotations are error-prone by hand: build the matrix from Euler angles.
matrix = coreg.matrix_from_translations_rotations(
    t1=shift_x, t2=shift_y, t3=shift_z, alpha1=0.1, alpha2=0.2, alpha3=0.3, use_degrees=True
)
print("combined matrix:\n", np.round(matrix, 5))
rotated2 = coreg.apply_matrix(dem, matrix=matrix, centroid=centroid)
print(f"combined-rotation output has {np.isfinite(rotated2.get_nanarray()).sum()} valid cells")
