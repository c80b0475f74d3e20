"""Spatial error propagation: from per-pixel errors to the error of an areal mean.

Correlated errors average out much more slowly than sqrt(N): this example compares the four
effective-sample estimators and propagates the error to glacier-area mean dh. Mirrors the
reference gallery's plot_spatial_error_propagation.py.
"""
import numpy as np

from xdem_tpu import examples, spatialstats

ref = examples.get_ref_dem()
tba = examples.get_tba_dem()
stable = ~examples.get_glacier_mask()

sig, rho = ref.estimate_uncertainty(tba, stable_terrain=stable, random_state=42,
                                    subsample=500)

# Variogram parameters re-fit for the closed-form estimators
dh = np.asarray((tba - ref).data)
z = np.where(stable, dh / np.asarray(sig.data), np.nan)
emp = spatialstats.sample_empirical_variogram(z, gsd=ref.res[0], subsample=300,
                                              random_state=42)
_, params = spatialstats.fit_sum_model_variogram(["gaussian", "spherical"], emp)

area = 4e6  # a 2x2 km glacier
n_pix = area / ref.res[0] ** 2
res = {
    "independent sqrt(N)": n_pix,
    "theoretical disk": spatialstats.neff_circular_approx_theoretical(area, params),
    "numerical disk": spatialstats.neff_circular_approx_numerical(area, params),
}
for name, n_eff in res.items():
    print(f"{name:22s} n_eff = {n_eff:10.1f}")

mean_sigma = float(np.nanmean(np.asarray(sig.data)))
for name, n_eff in res.items():
    print(f"SE of mean dh over 4 km^2 [{name}]: {mean_sigma / np.sqrt(n_eff):.4f} m")
print("correlation halves the information: correlated errors do NOT average out as 1/sqrt(N)")
