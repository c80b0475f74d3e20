"""Vertical referencing and the generic CRS front-end.

Transforms a DEM between the ellipsoid and the EGM96 geoid, and reprojects between CRSs
given by EPSG code, proj-string and WKT — including one with no EPSG code at all.
Mirrors the reference gallery's plot_3d_manipulation.py (pyproj replaced by the built-in
projection engine; see docs/vertical_referencing.md).
"""
import numpy as np

from xdem_tpu import examples
from xdem_tpu.georef import CRS, transform_points

dem = examples.get_ref_dem()

# --- vertical: EGM96 product heights -> ellipsoidal heights (Svalbard: N ~ +32 m)
dem.set_vcrs("EGM96")
dem_ell = dem.to_vcrs("Ellipsoid")
dz = float(np.nanmean(np.asarray(dem_ell.data) - np.asarray(dem.data)))
print(f"EGM96 -> ellipsoid mean shift over the DEM: {dz:+.1f} m")

# --- horizontal: the same CRS three ways (EPSG, proj-string, WKT)
c1 = CRS(32633)
c2 = CRS("+proj=utm +zone=33 +datum=WGS84")
c3 = CRS(c1.to_wkt())
print(f"definition-equal: {c1 == c2 == c3}")

# --- reproject onto a CRS with NO EPSG code (a custom transverse Mercator)
custom = CRS("+proj=tmerc +lat_0=0 +lon_0=16 +k=0.9996 +x_0=500000 +y_0=0 +ellps=GRS80")
reproj = dem.reproject(crs=custom)
print(f"reprojected onto {custom.to_proj4()}")
print(f"  shape {reproj.shape}, valid fraction "
      f"{float(np.isfinite(np.asarray(reproj.data)).mean()):.2f}")

# --- datum shift: the same point in ED50 vs WGS84 UTM (~100-200 m apart in Europe)
x_w, y_w = transform_points(4326, 32631, np.array([5.0]), np.array([52.0]))
x_e, y_e = transform_points(4326, 23031, np.array([5.0]), np.array([52.0]))
print(f"ED50 vs WGS84 UTM 31N offset: {float(np.hypot(x_e - x_w, y_e - y_w)[0]):.1f} m")
