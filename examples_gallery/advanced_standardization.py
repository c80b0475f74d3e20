"""Heteroscedasticity modelling and standardization of elevation differences.

Models the per-pixel error sigma(slope, max_curvature) from stable terrain, standardizes dh
by it, and verifies the z-scores have unit spread — the precondition for the variogram and
error-propagation steps. Mirrors the reference gallery's
plot_heterosc_estimation_modelling.py and plot_standardization.py.
"""
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from xdem_tpu import examples, spatialstats, terrain
from xdem_tpu.raster import Raster

os.makedirs("gallery_outputs", exist_ok=True)
ref = examples.get_ref_dem()
tba = examples.get_tba_dem()
stable = ~examples.get_glacier_mask()

dh = Raster(tba.data - ref.data, ref.transform, ref.crs)
slope, maxc = terrain.get_terrain_attribute(ref, ["slope", "max_curvature"])

sig, df, err_fun = spatialstats.infer_heteroscedasticity_from_stable(
    dvalues=dh, list_var=[slope, maxc], list_var_names=["slope", "max_curvature"],
    stable_mask=stable, subsample=200_000, random_state=42,
)
print("binned spread (NMAD) of dh by slope (1-D bins):")
print(df[df["nd"] == 1].head(10))

# Standardize: z = dh / sigma has spread exactly 1 on stable terrain
z = np.where(stable, np.asarray(dh.data) / np.asarray(sig.data), np.nan)
nmad_z = 1.4826 * np.nanmedian(np.abs(z - np.nanmedian(z)))
print(f"z-score NMAD on stable terrain: {nmad_z:.3f} (standardized -> 1)")

# Error map + binned-curve plot
fig, axes = plt.subplots(1, 2, figsize=(11, 4))
im = axes[0].imshow(np.asarray(sig.data), cmap="Reds")
fig.colorbar(im, ax=axes[0], shrink=0.8, label="sigma_dh (m)")
axes[0].set_title("Modelled heteroscedastic error")
d1 = df[(df["nd"] == 1) & df["slope"].notna()]
mids = np.array([iv.mid for iv in d1["slope"]])
axes[1].plot(mids, d1["nmad"], "o-")
axes[1].set_xlabel("slope (deg)")
axes[1].set_ylabel("NMAD of dh (m)")
axes[1].set_title("Error vs slope")
fig.savefig("gallery_outputs/standardization.png", dpi=120, bbox_inches="tight")
print("wrote gallery_outputs/standardization.png")
