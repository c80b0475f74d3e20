"""Validate variogram-based error propagation with the patches method.

Theory (number_effective_samples / spatial_error_propagation) says the standard error of
the mean dh over an area A shrinks as 1/sqrt(n_eff(A)). The patches method measures the
same quantity EMPIRICALLY: tile the stable terrain into independent patches of area A and
take the spread of the patch means. If the variogram model is calibrated, the two curves
agree.
"""
import numpy as np
import pandas as pd

from xdem_tpu import examples, spatialstats

ref = examples.get_ref_dem()
tba = examples.get_tba_dem()
stable = ~examples.get_glacier_mask()
dh = tba - ref
gsd = ref.res[0]

# Model route: variogram of stable dh -> n_eff -> SE(A)
df_vario = spatialstats.sample_empirical_variogram(
    np.where(stable, np.asarray(dh.data), np.nan).astype(np.float64),
    gsd=gsd, subsample=500, random_state=42)
_, params = spatialstats.fit_sum_model_variogram(["gaussian", "spherical"], df_vario)
stable_dh = np.where(stable, np.asarray(dh.data), np.nan)
sigma = 1.4826 * np.nanmedian(np.abs(stable_dh - np.nanmedian(stable_dh)))  # NMAD

# Empirical route: patches over the same areas (reference patches_method contract)
areas = [(10 * gsd) ** 2, (25 * gsd) ** 2, (50 * gsd) ** 2]
df_patches = spatialstats.patches_method(dh, areas=areas, gsd=gsd, stable_mask=stable)

print(f"stable dh NMAD: {sigma:.2f} m")
print(f"{'area km^2':>10} {'SE model':>9} {'SE patches':>10} {'n patches':>9}")
for area, (_, row) in zip(areas, df_patches.iterrows()):
    neff = spatialstats.number_effective_samples(area, params)
    se_model = sigma / np.sqrt(neff)
    print(f"{area / 1e6:10.3f} {se_model:9.3f} {row['nmad']:10.3f} {row['nb_indep_patches']:9.0f}")
