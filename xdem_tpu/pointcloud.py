"""Host-side point cloud container — standalone substitute for geoutils.PointCloud."""

from __future__ import annotations

import copy as _copy
from typing import Any, Dict, Tuple

import numpy as np

from xdem_tpu.georef import CRS, transform_points


class PointCloud:
    """A set of (x, y, <data_column>) points with a CRS and optional auxiliary columns."""

    def __init__(
        self,
        x: Any,
        y: Any,
        z: Any,
        crs: CRS | int | str,
        data_column: str = "z",
        aux_columns: Dict[str, np.ndarray] | None = None,
    ):
        self.x = np.asarray(x, dtype=np.float64)
        self.y = np.asarray(y, dtype=np.float64)
        self.z = np.asarray(z, dtype=np.float64)
        if not (self.x.shape == self.y.shape == self.z.shape):
            raise ValueError("x, y, z must have the same shape.")
        self.crs = CRS(crs)
        self.data_column = data_column
        self.aux_columns = dict(aux_columns or {})

    def __len__(self) -> int:
        return int(self.x.size)

    @property
    def nb_points(self) -> int:
        return len(self)

    @property
    def ds(self) -> np.ndarray:
        """(N, 3) array of coordinates + data."""
        return np.column_stack([self.x, self.y, self.z])

    @property
    def bounds(self) -> Tuple[float, float, float, float]:
        return (float(self.x.min()), float(self.y.min()), float(self.x.max()), float(self.y.max()))

    def copy(self) -> "PointCloud":
        out = _copy.copy(self)
        out.x, out.y, out.z = self.x.copy(), self.y.copy(), self.z.copy()
        out.aux_columns = {k: v.copy() for k, v in self.aux_columns.items()}
        return out

    def subset(self, index: np.ndarray) -> "PointCloud":
        out = _copy.copy(self)
        out.x, out.y, out.z = self.x[index], self.y[index], self.z[index]
        out.aux_columns = {k: v[index] for k, v in self.aux_columns.items()}
        return out

    def subsample(self, subsample: int | float, random_state: int | None = None) -> "PointCloud":
        n = len(self)
        count = int(subsample * n) if isinstance(subsample, float) and subsample <= 1 else int(subsample)
        count = min(count, n)
        rng = np.random.default_rng(random_state)
        return self.subset(rng.choice(n, count, replace=False))

    def to_crs(self, crs: CRS | int | str) -> "PointCloud":
        crs = CRS(crs)
        nx, ny = transform_points(self.crs, crs, self.x, self.y)
        out = self.copy()
        out.x, out.y = np.asarray(nx), np.asarray(ny)
        out.crs = crs
        return out

    def translate(self, xoff: float = 0.0, yoff: float = 0.0, zoff: float = 0.0) -> "PointCloud":
        out = self.copy()
        out.x = out.x + xoff
        out.y = out.y + yoff
        out.z = out.z + zoff
        return out

    def grid(self, ref=None, transform=None, shape=None, crs=None, resampling: str = "linear"):
        """Grid the point cloud onto a raster grid.

        resampling="linear" (default) interpolates on the Delaunay triangulation of the
        points, NaN outside the convex hull — matching the reference's geoutils
        `_grid_pointcloud`. resampling="mean" uses two-pass binned averaging (mean per cell,
        then 3x3-neighborhood gap fill), much faster for dense clouds.
        """
        from xdem_tpu.raster import Raster

        if ref is not None:
            transform, shape, crs = ref.transform, ref.shape, ref.crs

        if resampling == "linear":
            from scipy.interpolate import LinearNDInterpolator
            from scipy.spatial import QhullError

            h, w = shape
            ok = np.isfinite(self.z)
            try:
                interp = LinearNDInterpolator(np.column_stack([self.x[ok], self.y[ok]]),
                                              self.z[ok], fill_value=np.nan)
            except (QhullError, ValueError):
                # Fewer than 3 non-collinear points: no triangulation exists; fall back to
                # the binned-mean gridding rather than crashing on degenerate clouds.
                return self.grid(transform=transform, shape=shape, crs=crs, resampling="mean")
            rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            gx, gy = transform.xy(rr.ravel(), cc.ravel())
            grid = interp(np.column_stack([gx, gy])).reshape(h, w).astype(np.float32)
            return Raster(grid, transform, crs if crs is not None else self.crs)
        if resampling != "mean":
            raise ValueError(f"resampling must be 'linear' or 'mean', got {resampling!r}.")
        h, w = shape
        rows, cols = transform.rowcol(self.x, self.y)
        ri = np.round(rows).astype(int)
        ci = np.round(cols).astype(int)
        ok = (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w) & np.isfinite(self.z)
        flat = ri[ok] * w + ci[ok]
        sums = np.bincount(flat, weights=self.z[ok], minlength=h * w)
        counts = np.bincount(flat, minlength=h * w)
        with np.errstate(invalid="ignore"):
            grid = (sums / counts).reshape(h, w)
        grid = grid.astype(np.float32)

        # Second pass: fill cells that received no points from the 3x3 neighborhood mean of
        # populated cells, so isolated gaps inside a dense cloud don't punch NaN holes.
        empty = ~np.isfinite(grid)
        if empty.any() and not empty.all():
            vals = np.where(empty, 0.0, grid)
            valid = (~empty).astype(np.float32)
            pv = np.pad(vals, 1)
            pc = np.pad(valid, 1)
            nsum = sum(pv[i : i + h, j : j + w] for i in range(3) for j in range(3))
            ncnt = sum(pc[i : i + h, j : j + w] for i in range(3) for j in range(3))
            with np.errstate(invalid="ignore"):
                neigh = nsum / ncnt
            grid = np.where(empty & (ncnt > 0), neigh, grid).astype(np.float32)
        return Raster(grid, transform, crs if crs is not None else self.crs)
