"""DEMCollection: a timestamped series of DEMs with dh/dv series extraction.

Reference parity: /root/reference/xdem/demcollection.py (subtract_dems :104,
interpolate_ddems :138, get_ddem_mask :150, get_dh_series :193, get_dv_series :231,
get_cumulative_series :249).
"""

from __future__ import annotations

from typing import Any, Literal, Sequence

import numpy as np
import pandas as pd

from xdem_tpu.ddem import dDEM
from xdem_tpu.dem import DEM
from xdem_tpu.vector import Vector


class DEMCollection:
    """A temporal collection of DEMs sharing a grid, with optional outlines per date."""

    def __init__(
        self,
        dems: Sequence[DEM],
        timestamps: Sequence[Any] | None = None,
        outlines: Vector | dict[Any, Vector] | None = None,
        reference_dem: DEM | int = 0,
    ):
        if timestamps is None:
            raise ValueError("Timestamps must be provided.")
        if len(timestamps) != len(dems):
            raise ValueError("The 'timestamps' len differs from the 'dems' len.")
        order = np.argsort([pd.Timestamp(t).value for t in timestamps])
        self.dems = [dems[i] for i in order]
        self.timestamps = [timestamps[i] for i in order]
        if isinstance(reference_dem, int):
            reference_dem = dems[reference_dem]
        self.reference_dem = reference_dem
        if isinstance(outlines, Vector):
            outlines = {self.timestamps[0]: outlines}
        self.outlines: dict[Any, Vector] = outlines or {}
        self.ddems: list[dDEM] = []
        self.ddems_are_intervalwise = False

    @property
    def reference_index(self) -> int:
        return self.dems.index(self.reference_dem)

    @property
    def reference_timestamp(self) -> Any:
        """Timestamp of the reference DEM (reference demcollection.py:100)."""
        return self.timestamps[self.reference_index]

    def subtract_dems(self, resampling_method: str = "cubic") -> list[dDEM]:
        """dDEMs between the reference DEM and every other DEM (reference demcollection.py:104)."""
        ddems = []
        ref = self.reference_dem
        ref_time = self.timestamps[self.reference_index]
        for dem, ts in zip(self.dems, self.timestamps):
            if dem is ref:
                continue
            reproj = dem.reproject(ref, resampling=resampling_method) if dem.shape != ref.shape else dem
            diff = _subtract_on_grid(ref, reproj)
            start, end = (ts, ref_time) if pd.Timestamp(ts) < pd.Timestamp(ref_time) else (ref_time, ts)
            ddems.append(dDEM(diff, start_time=start, end_time=end))
        self.ddems = ddems
        self.ddems_are_intervalwise = False
        return ddems

    def subtract_dems_intervalwise(self, resampling_method: str = "cubic") -> list[dDEM]:
        """Consecutive-interval dDEMs (later - earlier)."""
        ddems = []
        for i in range(len(self.dems) - 1):
            early, late = self.dems[i], self.dems[i + 1]
            reproj = early.reproject(late, resampling=resampling_method) if early.shape != late.shape else early
            diff = _subtract_on_grid(late, reproj)
            ddems.append(dDEM(diff, start_time=self.timestamps[i], end_time=self.timestamps[i + 1]))
        self.ddems = ddems
        self.ddems_are_intervalwise = True
        return ddems

    def interpolate_ddems(self, method: str = "idw") -> list[np.ndarray]:
        """Gap-fill every dDEM (reference demcollection.py:138)."""
        return [d.interpolate(method=method, reference_elevation=self.reference_dem,
                              mask=self.get_ddem_mask(d) if self.outlines else None)
                for d in self.ddems]

    def get_ddem_mask(self, ddem: dDEM) -> np.ndarray:
        """Rasterized outline mask appropriate for a dDEM's start time (demcollection.py:150)."""
        if not self.outlines:
            return np.ones(ddem.shape, dtype=bool)
        times = sorted(self.outlines.keys(), key=lambda t: pd.Timestamp(t).value)
        best = times[0]
        for t in times:
            if pd.Timestamp(t) <= pd.Timestamp(ddem.start_time):
                best = t
        return self.outlines[best].create_mask(ddem)

    def get_dh_series(self, outlines_filter: Any = None, mask: Any = None, nans_ok: bool = False) -> pd.DataFrame:
        """Weighted mean dh and area within the outlines per interval (demcollection.py:193)."""
        if len(self.ddems) == 0:
            raise ValueError("dDEMs have not yet been calculated")
        rows = []
        for d in self.ddems:
            m = self.get_ddem_mask(d) if mask is None else np.asarray(mask, bool)
            data = d.filled_data if d.filled_data is not None else d.get_nanarray()
            if not nans_ok and d.filled_data is None and np.any(~np.isfinite(data[m])):
                raise ValueError("Unfilled NaNs in dDEM; interpolate first or pass nans_ok=True.")
            vals = data[m]
            mean_dh = float(np.nanmean(vals)) if vals.size else np.nan
            px_area = d.res[0] * d.res[1]
            rows.append({"start_time": d.start_time, "end_time": d.end_time,
                         "dh": mean_dh, "area": float(m.sum() * px_area)})
        df = pd.DataFrame(rows)
        df.index = pd.IntervalIndex.from_arrays(pd.to_datetime(df["start_time"]), pd.to_datetime(df["end_time"]))
        return df[["dh", "area"]]

    def get_dv_series(self, outlines_filter: Any = None, mask: Any = None, nans_ok: bool = False) -> pd.Series:
        """Volume change series: dh * area per interval (demcollection.py:231)."""
        dhs = self.get_dh_series(outlines_filter=outlines_filter, mask=mask, nans_ok=nans_ok)
        return dhs["area"] * dhs["dh"]

    def get_cumulative_series(
        self,
        kind: Literal["dh", "dv"] = "dh",
        outlines_filter: Any = None,
        mask: Any = None,
        nans_ok: bool = False,
    ) -> pd.Series:
        """Cumulative dh or dv series anchored at zero at the first timestamp (demcollection.py:249)."""
        if kind == "dh":
            series = self.get_dh_series(outlines_filter=outlines_filter, mask=mask, nans_ok=nans_ok)["dh"]
        elif kind == "dv":
            series = self.get_dv_series(outlines_filter=outlines_filter, mask=mask, nans_ok=nans_ok)
        else:
            raise ValueError(f"Invalid kind: {kind}")
        cumulative = series.cumsum()
        out = pd.Series(
            data=np.r_[0.0, cumulative.values],
            index=np.r_[[series.index[0].left], [iv.right for iv in series.index]],
        )
        return out


def _subtract_on_grid(a, b):
    """Difference of two grid-compatible rasters as a plain Raster."""
    from xdem_tpu.raster import Raster

    return Raster(a.data - b.data, a.transform, a.crs)
