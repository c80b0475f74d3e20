"""Rigid coregistration with ICP (and LZD) when rotations are present.

NuthKaab only solves translations; airborne or archival photogrammetric DEMs can carry small
rotations too. This example rotates + shifts a DEM synthetically and recovers the full rigid
transform with ICP (point-to-plane), cross-checking with LZD.
Mirrors the reference gallery's plot_icp_coregistration.py.
"""
import numpy as np

from xdem_tpu import coreg, examples
from xdem_tpu.coreg.base import apply_matrix, matrix_from_translations_rotations

ref = examples.get_ref_dem()

# Build a synthetic rigid transform: 10 m east, -5 m north, 3 m up, 0.02 deg rotations
matrix = matrix_from_translations_rotations(10.0, -5.0, 3.0, 0.02, -0.015, 0.01)
centroid = (ref.bounds.left + (ref.bounds.right - ref.bounds.left) / 2,
            ref.bounds.bottom + (ref.bounds.top - ref.bounds.bottom) / 2,
            float(np.nanmean(ref.get_nanarray())))
tba = apply_matrix(ref, matrix, centroid=centroid)

for method in (coreg.ICP(subsample=30_000), coreg.LZD(subsample=30_000)):
    method.fit(ref, tba, random_state=42)
    tx, ty, tz = method.to_translations()
    rx, ry, rz = method.to_rotations()
    name = type(method).__name__
    print(f"{name}: translations ({tx:+.2f}, {ty:+.2f}, {tz:+.2f}) m "
          f"(truth -10, +5, -3), rotations ({rx:+.4f}, {ry:+.4f}, {rz:+.4f}) deg")
    aligned = method.apply(tba)
    res = np.asarray((ref - aligned).data)
    print(f"  residual dh NMAD: {1.4826 * np.nanmedian(np.abs(res - np.nanmedian(res))):.3f} m")
