"""dDEM: a difference-of-DEMs raster carrying its time interval and gap-filling methods.

Reference parity: /root/reference/xdem/ddem.py (dDEM class :81, interpolate :184).
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Literal

import numpy as np

from xdem_tpu.raster import Raster
from xdem_tpu import volume as _volume


class dDEM(Raster):
    """A difference-DEM between two acquisition times."""

    def __init__(self, raster: Raster | Any, start_time: Any = None, end_time: Any = None, error: Any = None,
                 **kwargs: Any):
        if isinstance(raster, Raster):
            super().__init__(raster.data, raster.transform, raster.crs, nodata=raster.nodata,
                             area_or_point=raster.area_or_point)
        else:
            super().__init__(raster, **kwargs)
        self.start_time = start_time
        self.end_time = end_time
        self.error = error
        self._filled_data: np.ndarray | None = None
        self._fill_method = ""

    @property
    def filled_data(self) -> np.ndarray | None:
        """The gap-filled array if interpolate() ran — else the original data when it has no
        gaps, else None (reference ddem.py:118-131)."""
        if self._filled_data is not None:
            return self._filled_data
        arr = self.get_nanarray()
        if np.any(np.isnan(arr)):
            return None
        return np.asarray(arr)

    @filled_data.setter
    def filled_data(self, array: np.ndarray | None) -> None:
        if array is None:
            self._filled_data = None
            return
        array = np.asarray(array)
        if self.data.size != array.size:
            raise ValueError(
                f"Array shape '{array.shape}' differs from the data shape '{self.data.shape}'"
            )
        self._filled_data = array.reshape(self.data.shape)

    @property
    def fill_method(self) -> str:
        """The fill method used for filled_data (reference ddem.py:144)."""
        return self._fill_method

    @property
    def time(self) -> Any:
        """The time interval of the dDEM."""
        if self.start_time is None or self.end_time is None:
            return None
        return self.end_time - self.start_time

    @classmethod
    def from_array(cls, data: Any, transform: Any, crs: Any, start_time: Any = None,
                   end_time: Any = None, nodata: Any = None, error: Any = None) -> "dDEM":
        """Create a dDEM from an array + georeferencing (reference ddem.py:154)."""
        return cls(Raster.from_array(data=data, transform=transform, crs=crs, nodata=nodata),
                   start_time=start_time, end_time=end_time, error=error)

    def interpolate(
        self,
        method: Literal["idw", "local_hypsometric", "regional_hypsometric"] = "idw",
        reference_elevation: Any = None,
        mask: Any = None,
    ) -> np.ndarray | None:
        """Fill nodata gaps; stores and returns `filled_data` (reference ddem.py:184)."""
        arr = self.get_nanarray()
        if method == "idw":
            self.filled_data = _volume.idw_interpolation(arr)
        elif method in ("local_hypsometric", "regional_hypsometric"):
            if reference_elevation is None:
                raise ValueError(f"'reference_elevation' must be given for method '{method}'.")
            # Bring the reference elevation onto THIS dDEM's grid (reference ddem.py:196-210:
            # reproject + shape assert) — intervalwise dDEMs live on each later DEM's grid.
            if isinstance(reference_elevation, Raster):
                from xdem_tpu.demcollection import _same_grid

                if not _same_grid(reference_elevation, self):
                    reference_elevation = reference_elevation.reproject(self)
                ref_arr = reference_elevation.get_nanarray()
            else:
                ref_arr = np.asarray(reference_elevation)
            if ref_arr.shape != self.shape:
                raise ValueError(
                    f"'reference_elevation' shape {ref_arr.shape} differs from the dDEM's "
                    f"{self.shape}; pass a Raster/DEM (auto-reprojected) or a same-grid array."
                )
            if mask is None:
                raise ValueError(f"'mask' must be given for method '{method}'.")
            from xdem_tpu.vector import Vector

            if isinstance(mask, Vector):
                mask_arr = mask.create_mask(self)
            else:
                mask_arr = np.asarray(mask, dtype=bool)
            if method == "local_hypsometric":
                filled = _volume.local_hypsometric_interpolation(arr, ref_arr, mask_arr)
            else:
                from scipy import ndimage

                labels, _ = ndimage.label(mask_arr)
                filled = _volume.norm_regional_hypsometric_interpolation(arr, ref_arr, labels)
            self.filled_data = np.where(np.isfinite(arr), arr, filled.filled(np.nan))
        else:
            raise ValueError(f"Unknown interpolation method: {method}")
        self._fill_method = method
        return self.filled_data
