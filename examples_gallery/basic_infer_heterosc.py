"""One-function inference of elevation heteroscedasticity (mirrors the reference's
basic/plot_infer_heterosc.py): estimate a per-pixel error map from stable terrain with
slope and maximum curvature as explanatory variables (Hugonnet et al., 2022)."""
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from xdem_tpu import DEM, examples, spatialstats, terrain

os.makedirs("gallery_outputs", exist_ok=True)

# Coregistered dDEM + the reference DEM + moving-terrain (glacier) outlines
dh = DEM.open(examples.get_path("longyearbyen_ddem"))
ref_dem = examples.get_ref_dem()
glacier_outlines = examples.get_glacier_outlines()

# Terrain slope and maximum curvature as error-explaining variables
slope, max_curvature = terrain.get_terrain_attribute(ref_dem, ["slope", "max_curvature"])

# The whole pipeline in one function: bin dh spread on stable terrain, interpolate,
# standardize in two steps, evaluate the error model over the full raster
errors, df_binning, error_function = spatialstats.infer_heteroscedasticity_from_stable(
    dvalues=dh, list_var=[slope, max_curvature], list_var_names=["slope", "maxc"],
    unstable_mask=glacier_outlines,
)

arr = errors.get_nanarray()
plt.figure(figsize=(8, 6))
plt.imshow(arr, cmap="Reds", vmin=np.nanpercentile(arr, 2), vmax=np.nanpercentile(arr, 98))
plt.colorbar(label=r"Elevation error (1$\sigma$, m)")
plt.title("Inferred heteroscedastic elevation error")
plt.axis("off")
plt.savefig("gallery_outputs/infer_heterosc.png", dpi=110, bbox_inches="tight")

# The error function evaluates at arbitrary variable values (reference prints the same grid)
for s, c in [(0.0, 0.0), (40.0, 0.0), (0.0, 5.0), (40.0, 5.0)]:
    print(f"Error at slope {s:.0f} deg, max curvature {c / 100:.2f} m-1: "
          f"{float(error_function((s, c))):.2f} m")
print("wrote gallery_outputs/infer_heterosc.png")
