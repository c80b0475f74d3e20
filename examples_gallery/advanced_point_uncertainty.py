"""Uncertainty of a DEM against an elevation POINT CLOUD (ICESat-2-style validation).

The reference's geodataframe branch (dem.py:725-731) computes point dh; here the whole
pipeline is designed for points end-to-end: heteroscedasticity binned against terrain
variables interpolated at the points, variogram sampled from the explicit coordinates.
"""
import numpy as np
import pandas as pd

from xdem_tpu import examples

ref = examples.get_ref_dem()
stable = ~examples.get_glacier_mask()

# An elevation point cloud over the same terrain (here: sampled from the tba DEM;
# in practice: ICESat-2 / GNSS profiles loaded with EPC(path))
epc = examples.get_tba_dem().to_pointcloud(subsample=20000, random_state=42)

# Full H2022 pipeline from points: error map over the DEM grid + correlation of error
sig, rho = ref.estimate_uncertainty(epc, stable_terrain=stable, random_state=42,
                                    subsample=500)
print(f"sigma raster: median {np.nanmedian(np.asarray(sig.data)):.2f} m "
      f"(grid {sig.shape}, from {len(epc)} points)")
print(f"error correlation at 100 m lag: {rho(np.array([100.0]))[0]:.2f}")

# The same with a plain dataframe and a custom elevation column name
df = pd.DataFrame({"x": epc.x, "y": epc.y, "h_li": epc.z})
sig_df, _ = ref.estimate_uncertainty(df, stable_terrain=stable, z_name="h_li",
                                     approach="Basic", list_vario_models=("spherical",),
                                     random_state=42, subsample=500)
print(f"Basic approach from dataframe: constant sigma {float(np.nanmean(np.asarray(sig_df.data))):.2f} m")
