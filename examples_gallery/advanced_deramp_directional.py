"""Bias correction: Deramp (2-D polynomial) and DirectionalBias (along-track undulations).

A synthetic ramp + along-track sinusoid is added to a DEM and removed by the bias-correction
family. Mirrors the reference gallery's plot_deramp.py plus the DirectionalBias guide.
"""
import numpy as np

from xdem_tpu import coreg, examples
from xdem_tpu.raster import Raster

ref = examples.get_ref_dem()
h, w = ref.shape
yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")

# Synthetic biases: a degree-1 ramp (2 m corner-to-corner) + a 3 m-amplitude undulation
ramp = 1.0e-3 * xx + 8.0e-4 * yy
angle = 20.0
track = (xx * np.cos(np.deg2rad(angle)) + yy * np.sin(np.deg2rad(angle))) * ref.res[0]
undul = 1.5 * np.sin(2 * np.pi * track / 4000.0)
tba = Raster(ref.data + np.float32(1) * (ramp + undul).astype(np.float32), ref.transform, ref.crs)

# 1. Deramp removes the polynomial part
deramp = coreg.Deramp(poly_order=1)
step1 = deramp.fit_and_apply(ref, tba, random_state=42)
res1 = np.asarray((step1 - ref).data)
print(f"after Deramp: residual std {np.nanstd(res1):.2f} m (was {np.nanstd(ramp + undul):.2f})")

# 2. DirectionalBias removes the along-track sinusoid
db = coreg.DirectionalBias(angle=angle)
step2 = db.fit_and_apply(ref, step1, random_state=42)
res2 = np.asarray((step2 - ref).data)
print(f"after DirectionalBias(angle={angle}): residual std {np.nanstd(res2):.2f} m")
print("fitted sumsin params:", db.meta["outputs"]["fitorbin"].get("fit_params"))
