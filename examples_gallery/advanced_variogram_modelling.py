"""Empirical variogram estimation and sum-of-models fitting.

Samples the spatial correlation of elevation differences on stable terrain, compares
estimators, fits a gaussian+spherical sum, and plots the result. Mirrors the reference
gallery's plot_variogram_estimation_modelling.py and plot_infer_spatial_correlation.py.
"""
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from xdem_tpu import examples, spatialstats
from xdem_tpu.raster import Raster

os.makedirs("gallery_outputs", exist_ok=True)
ref = examples.get_ref_dem()
tba = examples.get_tba_dem()
stable = ~examples.get_glacier_mask()

dh = Raster(tba.data - ref.data, ref.transform, ref.crs)

# Robust (Dowd) vs classical (Matheron) estimators on the same sampling
dfs = {}
for est in ("dowd", "matheron"):
    dfs[est] = spatialstats.sample_empirical_variogram(
        np.where(stable, dh.get_nanarray(), np.nan), gsd=ref.res[0],
        subsample=300, random_state=42, estimator=est,
    )
    print(f"{est}: {len(dfs[est])} lag bins, total pairs {int(dfs[est]['count'].sum()):,}")

# Fit a sum of short-range gaussian + long-range spherical to the robust variogram
func, params = spatialstats.fit_sum_model_variogram(["gaussian", "spherical"], dfs["dowd"])
print("fitted models:")
print(params)

# Effective number of samples for a 1 km^2 glacier-sized area
n_eff = spatialstats.neff_circular_approx_theoretical(1e6, params)
print(f"n_eff over 1 km^2: {n_eff:.1f} (vs {1e6 / ref.res[0]**2:.0f} pixels)")

fig, ax = plt.subplots(figsize=(7, 4))
for est, df in dfs.items():
    ax.plot(df["lags"], df["exp"], "o", ms=4, alpha=0.7, label=f"empirical ({est})")
lags = np.linspace(1, dfs["dowd"]["lags"].max(), 300)
ax.plot(lags, func(lags), "k-", label="gaussian+spherical fit")
ax.set_xscale("log")
ax.set_xlabel("lag (m)")
ax.set_ylabel("variance of dh differences (m$^2$)")
ax.legend()
fig.savefig("gallery_outputs/variogram_modelling.png", dpi=120, bbox_inches="tight")
print("wrote gallery_outputs/variogram_modelling.png")
