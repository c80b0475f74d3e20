"""Terrain attributes on the example DEM (mirrors the reference's terrain gallery)."""
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from xdem_tpu import examples

os.makedirs("gallery_outputs", exist_ok=True)
dem = examples.get_ref_dem()

attrs = dem.get_terrain_attribute(["hillshade", "slope", "aspect", "max_curvature",
                                   "terrain_ruggedness_index", "rugosity"])
names = ["hillshade", "slope", "aspect", "max_curvature", "TRI", "rugosity"]
cmaps = ["Greys_r", "Reds", "twilight", "RdGy_r", "Purples", "YlOrRd"]

fig, axes = plt.subplots(2, 3, figsize=(15, 8))
for ax, r, name, cmap in zip(axes.ravel(), attrs, names, cmaps):
    arr = r.get_nanarray()
    vmin, vmax = np.nanpercentile(arr, [2, 98])
    ax.imshow(arr, cmap=cmap, vmin=vmin, vmax=vmax)
    ax.set_title(name)
    ax.axis("off")
fig.savefig("gallery_outputs/terrain_attributes.png", dpi=110, bbox_inches="tight")
print("wrote gallery_outputs/terrain_attributes.png")
