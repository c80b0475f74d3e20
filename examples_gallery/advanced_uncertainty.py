"""Heteroscedasticity + spatial correlation + error propagation to areal means."""
import os

import numpy as np

from xdem_tpu import examples, spatialstats

os.makedirs("gallery_outputs", exist_ok=True)
ref = examples.get_ref_dem()
tba = examples.get_tba_dem()
stable = ~examples.get_glacier_mask()

sig, rho = ref.estimate_uncertainty(tba, stable_terrain=stable, random_state=42, subsample=800)
print(f"per-pixel error: median {np.nanmedian(np.asarray(sig.data)):.3f} m")

# Propagate to the mean error over a 1 km^2 disk and a 100 km^2 disk
import pandas as pd

params = pd.DataFrame({"model": ["gaussian", "spherical"], "range": [200.0, 2000.0],
                       "psill": [0.5, 0.5]})
for area in [1e6, 1e8]:
    neff = spatialstats.number_effective_samples(area, params)
    se = float(np.nanmean(np.asarray(sig.data))) / np.sqrt(neff)
    print(f"area {area/1e6:.0f} km^2: n_eff {neff:.1f}, standard error {se:.4f} m")
