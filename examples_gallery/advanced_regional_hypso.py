"""Regional hypsometric gap-filling of a heavily voided dDEM.

Pools a NORMALIZED dh-vs-elevation signal over all glaciers, then rescales it per glacier
to fill voids — the method of choice when individual glaciers are poorly observed
(McNabb et al. 2019). Mirrors the reference gallery's plot_norm_regional_hypso.py.
"""
import numpy as np

from xdem_tpu import examples, volume

ref = examples.get_ref_dem()
tba = examples.get_tba_dem()
mask = examples.get_glacier_mask()

dh = np.where(mask, np.asarray((tba - ref).data), np.nan)
ref_arr = ref.get_nanarray()

# Per-glacier index map from the outlines, like the reference's
# glacier_outlines.rasterize(dem) (plot_norm_regional_hypso.py:49)
gid = np.asarray(examples.get_glacier_outlines().rasterize(ref).data).astype(int)

# Punch 60% voids into the glacier dh
rng = np.random.default_rng(42)
voided = dh.copy()
voided[rng.random(dh.shape) < 0.6] = np.nan
print(f"glacier pixels: {int(mask.sum()):,}; valid dh after voiding: "
      f"{int(np.isfinite(voided).sum()):,}")

signal = volume.get_regional_hypsometric_signal(voided, ref_arr, gid)
print("normalized signal (top of glacier -> bottom):")
print(signal["median"].round(3).to_string())

filled = volume.norm_regional_hypsometric_interpolation(voided, ref_arr, gid,
                                                        regional_signal=signal)
filled_arr = np.asarray(filled)
est = np.nanmean(filled_arr[mask])
truth = np.nanmean(dh[mask])
print(f"mean glacier dh: truth {truth:.2f} m, regional-hypso filled {est:.2f} m "
      f"({100 * abs(est - truth) / max(abs(truth), 1e-9):.1f}% off from 40% of the data)")
