"""Load the reference implementation's numeric core standalone for parity testing.

The reference (/root/reference, read-only) cannot run end-to-end here (geoutils/rasterio/
skgstat absent), but its numeric modules — terrain/surfit.py, terrain/window.py,
terrain/freq.py, fit.py, spatialstats.py — import fine once the thin geo-I/O layer is
stubbed. This gives the closest offline substitute for the GDAL/RichDEM golden-file oracle
(SURVEY.md §4.1): any convention drift between xdem_tpu and the reference formulas fails the
parity tests even if the hand-written test oracles share the drift.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference/xdem"


def _nmad(data, nfact=1.4826):
    data = np.asarray(data)
    return nfact * np.nanmedian(np.abs(data - np.nanmedian(data)))


def _subsample_array(array, subsample, return_indices=False, random_state=None):
    """Minimal stand-in for geoutils.stats.sampling.subsample_array (valid-value subsample)."""
    array = np.asarray(array)
    valid = np.isfinite(array)
    idx_valid = np.argwhere(valid.ravel()).ravel()
    n_valid = idx_valid.size
    if subsample <= 1:
        n = int(n_valid * subsample)
    else:
        n = min(int(subsample), n_valid)
    rng = np.random.default_rng(random_state)
    chosen = idx_valid if n >= n_valid else rng.choice(idx_valid, n, replace=False)
    if return_indices:
        return np.unravel_index(chosen, array.shape)
    return array.ravel()[chosen]


def _install_stubs() -> None:
    if "geoutils" in sys.modules and hasattr(sys.modules["geoutils"], "_xdem_tpu_stub"):
        return

    class _Raster:  # only used in isinstance checks on paths the tests avoid
        pass

    class _Vector:
        pass

    gu = types.ModuleType("geoutils")
    gu._xdem_tpu_stub = True
    gu_stats = types.ModuleType("geoutils.stats")
    gu_stats.nmad = _nmad
    gu_sampling = types.ModuleType("geoutils.stats.sampling")
    gu_sampling.subsample_array = _subsample_array
    gu_stats.sampling = gu_sampling
    gu_raster = types.ModuleType("geoutils.raster")
    gu_raster.Raster = _Raster
    gu_raster.RasterType = _Raster
    gu_raster_array = types.ModuleType("geoutils.raster.array")

    def get_array_and_mask(arr, check_shape=True, copy=True):
        arr = np.asarray(arr, dtype=np.float64 if arr.dtype.kind == "f" else None)
        invalid = ~np.isfinite(arr)
        out = arr.astype(np.float32) if arr.dtype.kind != "f" else (arr.copy() if copy else arr)
        out[invalid] = np.nan
        return out, invalid

    gu_raster_array.get_array_and_mask = get_array_and_mask

    def get_mask_from_array(arr):
        arr = np.asarray(arr)
        return ~np.isfinite(arr) if arr.dtype.kind == "f" else np.zeros(arr.shape, bool)

    def get_valid_extent(arr):
        valid = np.isfinite(np.asarray(arr, dtype=float))
        rows = np.flatnonzero(valid.any(axis=1))
        cols = np.flatnonzero(valid.any(axis=0))
        return rows[0], rows[-1] + 1, cols[0], cols[-1] + 1

    gu_raster_array.get_mask_from_array = get_mask_from_array
    gu_raster_array.get_valid_extent = get_valid_extent
    gu_raster.array = gu_raster_array
    gu_raster.get_array_and_mask = get_array_and_mask

    class _AnyStub(types.ModuleType):
        """A module whose attributes materialize as placeholder classes on access.

        Enough for `from mod import Name` used only in type annotations or untested paths.
        """

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            val = type(name, (), {})
            setattr(self, name, val)
            return val

    rio = _AnyStub("rasterio")
    rio_fill = types.ModuleType("rasterio.fill")

    def fillnodata(*args, **kwargs):  # only the reference's idw path needs this
        raise NotImplementedError("rasterio is not available in this environment.")

    rio_fill.fillnodata = fillnodata
    rio.fill = rio_fill
    rio_warp = _AnyStub("rasterio.warp")
    rio.warp = rio_warp
    rio_transform = _AnyStub("rasterio.transform")
    rio.transform = rio_transform

    affine_mod = _AnyStub("affine")

    gu_typing = types.ModuleType("geoutils._typing")
    gu_typing.Number = float
    gu_typing.NDArrayf = np.ndarray
    gu_typing.NDArrayb = np.ndarray
    gu_typing.MArrayf = np.ndarray
    gu.stats_typing = gu_typing

    gu_profiler = types.ModuleType("geoutils.profiler")

    def _profile(*_a, **_k):
        def deco(fn):
            return fn

        return deco

    gu_profiler.profile = _profile
    gu.profiler = gu_profiler
    gu_interface = types.ModuleType("geoutils.interface")
    gu_gridding = _AnyStub("geoutils.interface.gridding")
    gu_interp = _AnyStub("geoutils.interface.interpolate")
    gu_interface.gridding = gu_gridding
    gu_interface.interpolate = gu_interp
    gu_pointcloud = types.ModuleType("geoutils.pointcloud")
    gu_pointcloud_pc = _AnyStub("geoutils.pointcloud.pointcloud")
    gu_pointcloud.pointcloud = gu_pointcloud_pc
    gu_raster_geotrans_priv = _AnyStub("geoutils.raster._geotransformations")
    gu_raster_georef = _AnyStub("geoutils.raster.georeferencing")
    gu_raster_geotrans = _AnyStub("geoutils.raster.geotransformations")
    gu_raster_raster = _AnyStub("geoutils.raster.raster")
    gu_raster_distcomp = _AnyStub("geoutils.raster.distributed_computing")
    gu_vector = types.ModuleType("geoutils.vector")
    gu_vector_vector = types.ModuleType("geoutils.vector.vector")
    gu_vector_vector.Vector = _Vector
    gu_vector_vector.VectorType = _Vector
    gu_vector.vector = gu_vector_vector
    gu.Raster = _Raster
    gu.Vector = _Vector
    gu.stats = gu_stats
    gu.raster = gu_raster
    gu.vector = gu_vector

    gpd = types.ModuleType("geopandas")
    gpd.GeoDataFrame = type("GeoDataFrame", (), {})

    for name, mod in {
        "geoutils": gu,
        "geoutils.stats": gu_stats,
        "geoutils.stats.sampling": gu_sampling,
        "geoutils.raster": gu_raster,
        "geoutils.raster.array": gu_raster_array,
        "geoutils.vector": gu_vector,
        "geoutils.vector.vector": gu_vector_vector,
        "geopandas": gpd,
        "rasterio": rio,
        "rasterio.fill": rio_fill,
        "rasterio.warp": rio_warp,
        "rasterio.transform": rio_transform,
        "affine": affine_mod,
        "geoutils._typing": gu_typing,
        "geoutils.profiler": gu_profiler,
        "geoutils.interface": gu_interface,
        "geoutils.interface.gridding": gu_gridding,
        "geoutils.interface.interpolate": gu_interp,
        "geoutils.pointcloud": gu_pointcloud,
        "geoutils.pointcloud.pointcloud": gu_pointcloud_pc,
        "geoutils.raster._geotransformations": gu_raster_geotrans_priv,
        "geoutils.raster.georeferencing": gu_raster_georef,
        "geoutils.raster.geotransformations": gu_raster_geotrans,
        "geoutils.raster.raster": gu_raster_raster,
        "geoutils.raster.distributed_computing": gu_raster_distcomp,
    }.items():
        sys.modules.setdefault(name, mod)
    gu.raster.raster = sys.modules["geoutils.raster.raster"]
    gu.interface = sys.modules["geoutils.interface"]
    gu.pointcloud = sys.modules["geoutils.pointcloud"]


def _load(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_modules() -> dict[str, types.ModuleType]:
    """Load the reference numeric modules with geo deps stubbed; returns them by short name."""
    _install_stubs()
    if "xdem" not in sys.modules:
        pkg = types.ModuleType("xdem")
        pkg.__path__ = [REF]
        sys.modules["xdem"] = pkg
    _load("xdem._typing", f"{REF}/_typing.py")
    _load("xdem._misc", f"{REF}/_misc.py")
    spatialstats = _load("xdem.spatialstats", f"{REF}/spatialstats.py")
    if "xdem.terrain" not in sys.modules:
        tpkg = types.ModuleType("xdem.terrain")
        tpkg.__path__ = [f"{REF}/terrain"]
        sys.modules["xdem.terrain"] = tpkg
    surfit = _load("xdem.terrain.surfit", f"{REF}/terrain/surfit.py")
    window = _load("xdem.terrain.window", f"{REF}/terrain/window.py")
    freq = _load("xdem.terrain.freq", f"{REF}/terrain/freq.py")
    fit = _load("xdem.fit", f"{REF}/fit.py")
    volume = _load("xdem.volume", f"{REF}/volume.py")
    if "xdem.coreg" not in sys.modules:
        cpkg = types.ModuleType("xdem.coreg")
        cpkg.__path__ = [f"{REF}/coreg"]
        sys.modules["xdem.coreg"] = cpkg
    coreg_base = _load("xdem.coreg.base", f"{REF}/coreg/base.py")
    terrain_disp = _load("xdem.terrain.terrain", f"{REF}/terrain/terrain.py")
    return {
        "surfit": surfit,
        "window": window,
        "freq": freq,
        "fit": fit,
        "spatialstats": spatialstats,
        "volume": volume,
        "coreg_base": coreg_base,
        "terrain": terrain_disp,
    }


def install_functional_raster_stub() -> None:
    """Replace the placeholder gu.Raster with a functional mini-raster good enough to RUN
    the reference's raster apply_matrix path (_iterate_affine_regrid_small_rotations):
    from_array, to_pointcloud, coords, res, from_pointcloud_regular."""
    import sys

    gu = sys.modules["geoutils"]

    class _Col:
        def __init__(self, arr):
            self.values = np.asarray(arr)

        def __array__(self, dtype=None):
            return np.asarray(self.values, dtype=dtype)

    class _Geometry:
        def __init__(self, x, y):
            self.x = _Col(x)
            self.y = _Col(y)

    class _EPC:
        def __init__(self, x, y, z):
            self.geometry = _Geometry(x, y)
            self.z = _Col(z)

    class _PC:
        def __init__(self, ds):
            self.ds = ds

    class _MiniRaster:
        def __init__(self, arr, transform, nodata=None):
            self._arr = np.asarray(arr, dtype=np.float64)
            self.transform = transform
            self.nodata = nodata
            self.data = np.ma.masked_invalid(self._arr)

        @classmethod
        def from_array(cls, data, transform, crs=None, nodata=None):
            return cls(data, transform, nodata=nodata)

        @property
        def res(self):
            return (abs(self.transform.a), abs(self.transform.e))

        def _centers(self):
            h, w = self._arr.shape
            t = self.transform
            x = t.c + (np.arange(w) + 0.5) * t.a
            y = t.f + (np.arange(h) + 0.5) * t.e  # descending for north-up transforms
            return x, y

        def coords(self, grid=False):
            # geoutils convention: 1-D x ascending and y ascending (bottom-up); the
            # reference then flips y to pair descending coordinates with row order.
            x, y = self._centers()
            return (x, y[::-1])

        def to_pointcloud(self, data_column_name="z", skip_nodata=False):
            x, y = self._centers()
            xx, yy = np.meshgrid(x, y)
            return _PC(_EPC(xx.ravel(), yy.ravel(), self._arr.ravel()))

        def from_pointcloud_regular(self, epc, transform=None, shape=None,
                                    data_column_name="z", nodata=None):
            z = np.asarray(getattr(epc, "z"), dtype=np.float64).reshape(shape)
            if nodata is not None:
                z = np.where(z == nodata, np.nan, z)
            return _MiniRaster(z, transform or self.transform, nodata=nodata)

    gu.Raster = _MiniRaster
    sys.modules["geoutils.raster"].Raster = _MiniRaster
