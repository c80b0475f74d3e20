"""dDEM differencing, gap filling and hypsometric volume change."""
import os

import numpy as np

from xdem_tpu import examples, volume
from xdem_tpu.ddem import dDEM
from xdem_tpu.raster import Raster

os.makedirs("gallery_outputs", exist_ok=True)
ref = examples.get_ref_dem()
tba = examples.get_tba_dem()
mask = examples.get_glacier_mask()

diff = Raster(ref.data - tba.data, ref.transform, ref.crs)
d = dDEM(diff, start_time="1990-08-01", end_time="2009-08-01")
d.interpolate(method="idw")

bins = volume.hypsometric_binning(np.where(mask, d.get_nanarray(), np.nan), ref.get_nanarray())
filled = volume.interpolate_hypsometric_bins(bins, count_threshold=20)
areas = volume.calculate_hypsometry_area(filled, ref.get_nanarray()[mask], pixel_size=ref.res[0])
dv = (filled["value"] * areas).sum()
print(f"glacier area: {areas.sum()/1e6:.1f} km^2, volume change: {dv/1e9:.4f} km^3 over 19 years")
