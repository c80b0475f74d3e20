"""Host-side raster container: the standalone substitute for geoutils.Raster.

Data lives as a float array with NaN nodata (device or host); georeferencing (Affine + CRS) is
static host metadata. All heavy numerics (reprojection, interpolation, terrain, coreg) happen on
device through the functional ops — this class is a thin, jit-friendly shell.

Reference parity: geoutils.Raster as used throughout /root/reference/xdem (reproject/crop/
translate/interp_points/to_pointcloud API surface, pixel-center "Area" interpretation).
"""

from __future__ import annotations

import copy as _copy
from typing import Any, Literal, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from xdem_tpu.georef import CRS, Affine, transform_points, suggest_utm_crs
from xdem_tpu.ops.interp import interp_points as _interp_points_dev

__all__ = ["Raster", "BoundingBox"]


class BoundingBox(tuple):
    """(left, bottom, right, top) with named access."""

    def __new__(cls, left: float, bottom: float, right: float, top: float):
        return super().__new__(cls, (left, bottom, right, top))

    left = property(lambda self: self[0])
    bottom = property(lambda self: self[1])
    right = property(lambda self: self[2])
    top = property(lambda self: self[3])


class Raster:
    """A single-band georeferenced raster with NaN-coded nodata."""

    def __init__(
        self,
        data: Any,
        transform: Affine | Sequence[float],
        crs: CRS | int | str,
        nodata: float | None = None,
        area_or_point: Literal["Area", "Point"] = "Area",
        tags: dict[str, str] | None = None,
    ):
        arr = jnp.asarray(data)
        if arr.ndim != 2:
            raise ValueError(f"Raster data must be 2-D, got shape {arr.shape}.")
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(jnp.float32)
        self.data = arr
        self.transform = transform if isinstance(transform, Affine) else Affine(*transform)
        self.crs = CRS(crs)
        self.nodata = nodata
        self.area_or_point = area_or_point
        self.tags: dict[str, str] = dict(tags or {})

    # ---------------------------------------------------------------- constructors

    @classmethod
    def from_array(
        cls,
        data: Any,
        transform: Affine | Sequence[float],
        crs: CRS | int | str,
        nodata: float | None = None,
        area_or_point: Literal["Area", "Point"] = "Area",
    ) -> "Raster":
        arr = np.asarray(data) if isinstance(data, np.ndarray) else data
        if isinstance(arr, np.ndarray):
            if isinstance(arr, np.ma.MaskedArray):
                arr = arr.filled(np.nan).astype(np.float32)
            arr = np.asarray(arr, dtype=np.float32 if arr.dtype.kind in "iub" else arr.dtype)
            if nodata is not None:
                arr = np.where(arr == nodata, np.nan, arr.astype(np.float64)).astype(
                    np.float32 if arr.dtype == np.float32 else arr.dtype
                )
        return cls(arr, transform, crs, nodata=nodata, area_or_point=area_or_point)

    @classmethod
    def open(cls, path: str) -> "Raster":
        from xdem_tpu import io as _io

        return _io.read_raster(path, raster_cls=cls)

    def save(self, path: str, **kwargs: Any) -> None:
        from xdem_tpu import io as _io

        _io.write_raster(path, self, **kwargs)

    # ---------------------------------------------------------------- properties

    @property
    def shape(self) -> Tuple[int, int]:
        return tuple(self.data.shape)  # type: ignore[return-value]

    @property
    def height(self) -> int:
        return int(self.data.shape[0])

    @property
    def width(self) -> int:
        return int(self.data.shape[1])

    @property
    def res(self) -> Tuple[float, float]:
        return (self.transform.xres, self.transform.yres)

    @property
    def bounds(self) -> BoundingBox:
        h, w = self.shape
        xs, ys = [], []
        for (r, c) in ((0, 0), (0, w), (h, 0), (h, w)):
            x, y = self.transform.xy(r, c, offset="ul")
            xs.append(x)
            ys.append(y)
        return BoundingBox(min(xs), min(ys), max(xs), max(ys))

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def data(self):
        """The elevation array (device-resident jax array, NaN nodata)."""
        return self._data

    @data.setter
    def data(self, value) -> None:
        self._data = value
        self._np_cache = None

    def get_nanarray(self) -> np.ndarray:
        """Host numpy array with NaN nodata (returns a fresh copy; the device->host transfer
        is cached because it costs hundreds of ms through a tunneled accelerator)."""
        if getattr(self, "_np_cache", None) is None:
            self._np_cache = np.asarray(self.data)
        return self._np_cache.copy()

    def get_mask(self) -> np.ndarray:
        """Host boolean mask of invalid (nodata) pixels."""
        if getattr(self, "_np_cache", None) is None:
            self._np_cache = np.asarray(self.data)
        return ~np.isfinite(self._np_cache)

    def copy(self, new_array: Any = None) -> "Raster":
        out = _copy.copy(self)
        out.data = jnp.asarray(new_array) if new_array is not None else self.data
        out.tags = dict(self.tags)
        return out

    def __repr__(self) -> str:
        return (
            f"{type(self).__name__}(shape={self.shape}, res={self.res}, crs={self.crs!r}, "
            f"bounds={tuple(self.bounds)})"
        )

    # ---------------------------------------------------------------- arithmetic

    def _binary_op(self, other: Any, op) -> "Raster":
        if isinstance(other, Raster):
            if other.shape != self.shape or not other.transform.almost_equals(self.transform):
                raise ValueError("Rasters must share shape and transform for arithmetic; reproject first.")
            other = other.data
        return self.copy(new_array=op(self.data, other))

    def __add__(self, other: Any) -> "Raster":
        return self._binary_op(other, lambda a, b: a + b)

    def __radd__(self, other: Any) -> "Raster":
        return self._binary_op(other, lambda a, b: b + a)

    def __sub__(self, other: Any) -> "Raster":
        return self._binary_op(other, lambda a, b: a - b)

    def __rsub__(self, other: Any) -> "Raster":
        return self._binary_op(other, lambda a, b: b - a)

    def __mul__(self, other: Any) -> "Raster":
        return self._binary_op(other, lambda a, b: a * b)

    def __truediv__(self, other: Any) -> "Raster":
        return self._binary_op(other, lambda a, b: a / b)

    def __neg__(self) -> "Raster":
        return self.copy(new_array=-self.data)

    # ---------------------------------------------------------------- geospatial ops

    def get_metric_crs(self) -> CRS:
        """A suitable projected (UTM) CRS for this raster's location."""
        if self.crs.is_projected:
            return self.crs
        b = self.bounds
        return suggest_utm_crs((b.left + b.right) / 2, (b.bottom + b.top) / 2)

    def interp_points(
        self,
        points: Tuple[Any, Any],
        method: Literal["nearest", "linear", "cubic"] = "linear",
    ) -> jnp.ndarray:
        """Interpolate raster values at world (x, y) points."""
        x, y = points
        return _interp_points_dev(self.data, self.transform, jnp.asarray(x), jnp.asarray(y), method=method)

    def xy2ij(self, x: Any, y: Any) -> Tuple[Any, Any]:
        return self.transform.rowcol(x, y)

    def ij2xy(self, i: Any, j: Any) -> Tuple[Any, Any]:
        return self.transform.xy(i, j)

    def coords(self, grid: bool = True):
        """Pixel-center coordinate arrays (x, y), gridded by default."""
        h, w = self.shape
        cols = np.arange(w)
        rows = np.arange(h)
        if grid:
            cgrid, rgrid = np.meshgrid(cols, rows)
            return self.transform.xy(rgrid, cgrid)
        x, _ = self.transform.xy(np.zeros_like(cols), cols)
        _, y = self.transform.xy(rows, np.zeros_like(rows))
        return x, y

    def translate(self, xoff: float, yoff: float, zoff: float = 0.0, inplace: bool = False) -> "Raster":
        """Shift the georeferencing (and optionally elevation) without resampling."""
        new_transform = self.transform.translation(xoff, yoff)
        if inplace:
            self.transform = new_transform
            if zoff:
                self.data = self.data + zoff
            return self
        out = self.copy(new_array=self.data + zoff if zoff else self.data)
        out.transform = new_transform
        return out

    def reproject(
        self,
        ref: "Raster | None" = None,
        crs: CRS | int | str | None = None,
        res: float | Tuple[float, float] | None = None,
        bounds: Tuple[float, float, float, float] | None = None,
        resampling: Literal["nearest", "linear", "bilinear", "cubic"] | None = None,
        silent: bool = True,
    ) -> "Raster":
        """Reproject/regrid onto a reference raster's grid or an explicit crs/res/bounds.

        Implemented as inverse-coordinate gather interpolation on device (the reference
        delegates to rasterio.warp; same pixel-center convention). `resampling=None` uses
        the package default (`xdem_tpu.config["resampling"]`, bilinear out of the box).
        """
        if resampling is None:
            from xdem_tpu.config import config

            resampling = config["resampling"]
        method = {"bilinear": "linear"}.get(resampling, resampling)
        if ref is not None:
            dst_crs, dst_transform, dst_shape = ref.crs, ref.transform, ref.shape
        else:
            dst_crs = CRS(crs) if crs is not None else self.crs
            if res is None:
                res = self.res
            if not isinstance(res, (tuple, list)):
                res = (float(res), float(res))
            if bounds is None:
                if dst_crs == self.crs:
                    bounds = tuple(self.bounds)
                else:
                    b = self.bounds
                    xs = np.array([b.left, b.right, b.left, b.right])
                    ys = np.array([b.bottom, b.bottom, b.top, b.top])
                    tx, ty = transform_points(self.crs, dst_crs, xs, ys)
                    bounds = (float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max()))
            left, bottom, right, top = bounds
            w = max(int(round((right - left) / res[0])), 1)
            h = max(int(round((top - bottom) / res[1])), 1)
            dst_transform = Affine.from_origin(left, top, res[0], res[1])
            dst_shape = (h, w)

        # Destination pixel centers in destination CRS
        h, w = dst_shape
        cols = jnp.arange(w, dtype=jnp.float32) + 0.5
        rows = jnp.arange(h, dtype=jnp.float32) + 0.5
        cgrid, rgrid = jnp.meshgrid(cols, rows)
        a, b_, c, d, e, f = tuple(dst_transform)
        dx = a * cgrid + b_ * rgrid + c
        dy = d * cgrid + e * rgrid + f
        # Into source CRS
        sx, sy = transform_points(dst_crs, self.crs, dx, dy, xp=jnp)
        vals = _interp_points_dev(self.data, self.transform, sx, sy, method=method)
        out = self.copy(new_array=vals)
        out.transform = dst_transform if isinstance(dst_transform, Affine) else Affine(*dst_transform)
        out.crs = dst_crs
        return out

    def crop(self, bbox: "Raster | Tuple[float, float, float, float]", mode: str = "match_pixel") -> "Raster":
        """Crop to a bounding box (or another raster's bounds), snapping to the pixel grid."""
        if isinstance(bbox, Raster):
            bbox = tuple(bbox.bounds)
        left, bottom, right, top = bbox
        row0, col0 = self.transform.rowcol(left, top)
        row1, col1 = self.transform.rowcol(right, bottom)
        r0 = int(np.clip(np.round(row0 + 0.5), 0, self.height))
        c0 = int(np.clip(np.round(col0 + 0.5), 0, self.width))
        r1 = int(np.clip(np.round(row1 + 0.5), 0, self.height))
        c1 = int(np.clip(np.round(col1 + 0.5), 0, self.width))
        if r1 <= r0 or c1 <= c0:
            raise ValueError("Crop bounds do not intersect the raster.")
        new_data = self.data[r0:r1, c0:c1]
        ul_x, ul_y = self.transform.xy(r0, c0, offset="ul")
        out = self.copy(new_array=new_data)
        out.transform = Affine(self.transform.a, self.transform.b, ul_x, self.transform.d, self.transform.e, ul_y)
        return out

    def icrop(self, rows: Tuple[int, int], cols: Tuple[int, int]) -> "Raster":
        """Crop by integer pixel bounds [r0, r1), [c0, c1)."""
        r0, r1 = rows
        c0, c1 = cols
        new_data = self.data[r0:r1, c0:c1]
        ul_x, ul_y = self.transform.xy(r0, c0, offset="ul")
        out = self.copy(new_array=new_data)
        out.transform = Affine(self.transform.a, self.transform.b, ul_x, self.transform.d, self.transform.e, ul_y)
        return out

    def to_pointcloud(self, data_column_name: str = "z", subsample: int | float = 1, random_state: int | None = None):
        """Valid pixels as a point cloud (x, y, z)."""
        from xdem_tpu.pointcloud import PointCloud

        arr = np.asarray(self.data)
        valid = np.isfinite(arr)
        rr, cc = np.nonzero(valid)
        x, y = self.transform.xy(rr, cc)
        z = arr[valid]
        if subsample != 1:
            n = len(z)
            count = int(subsample * n) if isinstance(subsample, float) and subsample <= 1 else int(subsample)
            count = min(count, n)
            rng = np.random.default_rng(random_state)
            idx = rng.choice(n, count, replace=False)
            x, y, z = x[idx], y[idx], z[idx]
        return PointCloud(x=x, y=y, z=z, crs=self.crs, data_column=data_column_name)

    def get_stats(self, stats: Sequence[str] | None = None) -> dict[str, float]:
        """Common raster statistics over valid pixels."""
        arr = np.asarray(self.data)
        valid = arr[np.isfinite(arr)]
        med = float(np.median(valid)) if valid.size else float("nan")
        out = {
            "mean": float(np.mean(valid)) if valid.size else float("nan"),
            "median": med,
            "max": float(np.max(valid)) if valid.size else float("nan"),
            "min": float(np.min(valid)) if valid.size else float("nan"),
            "sum": float(np.sum(valid)) if valid.size else float("nan"),
            "std": float(np.std(valid)) if valid.size else float("nan"),
            "nmad": float(1.4826 * np.median(np.abs(valid - med))) if valid.size else float("nan"),
            "rmse": float(np.sqrt(np.mean(valid**2))) if valid.size else float("nan"),
            "valid_count": int(valid.size),
            "total_count": int(arr.size),
            "percentage_valid_points": float(100 * valid.size / arr.size) if arr.size else float("nan"),
        }
        if stats is not None:
            return {k: out[k] for k in stats}
        return out
