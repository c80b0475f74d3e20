"""One-function inference of the spatial correlation of errors (mirrors the reference's
basic/plot_infer_spatial_correlation.py): sample an empirical variogram of dh on stable
terrain, fit a Gaussian+Spherical sum of models, and return the correlation function
(Rolstad et al. 2009; Hugonnet et al. 2022)."""
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from xdem_tpu import DEM, examples, spatialstats

os.makedirs("gallery_outputs", exist_ok=True)

dh = DEM.open(examples.get_path("longyearbyen_ddem"))
glacier_outlines = examples.get_glacier_outlines()

# Whole pipeline in one function: Dowd variogram on stable terrain + weighted sum-of-models
# fit (Gaussian short-range first, Spherical long-range second)
df_vgm, df_model_params, spatial_corr_function = \
    spatialstats.infer_spatial_correlation_from_stable(
        dvalues=dh, list_models=["Gaussian", "Spherical"],
        unstable_mask=glacier_outlines, random_state=42,
    )

print("Fitted variogram model parameters:")
print(df_model_params.to_string(index=False))

# Correlation at a few distances
for d in (1.0, 100.0, 1000.0, 10000.0):
    print(f"correlation at {d:7.0f} m: {float(spatial_corr_function(d)):.3f}")

fig, ax = plt.subplots(figsize=(8, 5))
lags = np.asarray(df_vgm["lags"], float)
ax.plot(lags, df_vgm["exp"], "o", ms=4, label="empirical (Dowd)")
dense = np.linspace(0, lags.max(), 400)
sill = float(df_vgm["exp"].iloc[-5:].mean())
ax.plot(dense, sill * (1 - np.asarray([spatial_corr_function(x) for x in dense])),
        "-", label="Gaussian+Spherical fit")
ax.set_xlabel("Spatial lag (m)")
ax.set_ylabel("Variance of dh differences (m²)")
ax.set_xscale("symlog", linthresh=10)
ax.legend()
fig.savefig("gallery_outputs/infer_spatial_correlation.png", dpi=110, bbox_inches="tight")
print("wrote gallery_outputs/infer_spatial_correlation.png")
