"""DEMCollection: a timestamped DEM series with per-interval dDEMs and volume change."""
import datetime

import numpy as np

from xdem_tpu import DEMCollection, examples
from xdem_tpu.dem import DEM

ref = examples.get_ref_dem()
tba = examples.get_tba_dem()
dem_1990 = DEM(tba.data, tba.transform, tba.crs)
dem_2009 = DEM(ref.data, ref.transform, ref.crs)

collection = DEMCollection(
    [dem_1990, dem_2009],
    [datetime.datetime(1990, 8, 1), datetime.datetime(2009, 8, 1)],
    outlines=examples.get_glacier_outlines(),
)
collection.subtract_dems()
ddem = collection.ddems[0]
outlines = examples.get_glacier_outlines()
mask = outlines.create_mask(ref)

dh = np.asarray(ddem.data)
area_km2 = mask.sum() * ref.res[0] * ref.res[1] / 1e6
dv_km3 = np.nansum(np.where(mask, dh, 0.0)) * ref.res[0] * ref.res[1] / 1e9
print(f"interval {collection.timestamps[0].year}-{collection.timestamps[1].year}: "
      f"glacier area {area_km2:.1f} km^2, volume change {dv_km3:.4f} km^3")
dh_series = collection.get_dh_series()
dv_series = collection.get_dv_series()
print(f"dh series entries: {len(dh_series)}; dv over interval: {float(dv_series.iloc[0])/1e9:.4f} km^3")
