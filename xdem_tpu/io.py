"""Raster I/O through the native GeoTIFF codec (xdem_tpu/native/geotiff.cpp).

The reference reads/writes rasters via rasterio/GDAL (geoutils.Raster). This environment has
neither, so xdem_tpu ships its own C++ codec (classic TIFF, striped/tiled, none/DEFLATE/
PackBits compression, u8-f64 samples; writes single-band float32 DEFLATE with GeoTIFF keys),
compiled on demand with the system toolchain and loaded through ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

from xdem_tpu.georef import Affine

_LIB = None

_SRC = Path(__file__).parent / "native" / "geotiff.cpp"


class _GtInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("bands", ctypes.c_uint32),
        ("transform", ctypes.c_double * 6),
        ("epsg", ctypes.c_int32),
        ("nodata", ctypes.c_double),
        ("has_nodata", ctypes.c_int32),
    ]


def _build_library() -> Path:
    """Compile the codec to a shared library (cached next to the source)."""
    out = _SRC.parent / "libxdemtiff.so"
    if out.exists() and out.stat().st_mtime >= _SRC.stat().st_mtime:
        return out
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(out), "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as err:
        raise RuntimeError(f"Failed to build the native GeoTIFF codec:\n{err.stderr}") from err
    return out


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(_build_library()))
        lib.gt_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_GtInfo)]
        lib.gt_info.restype = ctypes.c_int
        lib.gt_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
        lib.gt_read.restype = ctypes.c_int
        lib.gt_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.c_int32,
        ]
        lib.gt_write.restype = ctypes.c_int
        lib.gt_last_error.restype = ctypes.c_char_p
        _LIB = lib
    return _LIB


def _err() -> str:
    return _lib().gt_last_error().decode()


def read_raster(path: str, raster_cls=None):
    """Read a GeoTIFF into a Raster (band 1, nodata converted to NaN)."""
    if raster_cls is None:
        from xdem_tpu.raster import Raster as raster_cls  # type: ignore[no-redef]

    lib = _lib()
    info = _GtInfo()
    if lib.gt_info(path.encode(), ctypes.byref(info)) != 0:
        raise OSError(f"Cannot read GeoTIFF '{path}': {_err()}")
    data = np.empty((info.height, info.width), dtype=np.float32)
    if lib.gt_read(path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float))) != 0:
        raise OSError(f"Cannot decode GeoTIFF '{path}': {_err()}")
    nodata = None
    if info.has_nodata:
        nodata = float(info.nodata)
        with np.errstate(invalid="ignore"):
            data = np.where(data == np.float32(nodata), np.nan, data)
    transform = Affine(*info.transform)
    crs = int(info.epsg) if info.epsg else 4326
    out = raster_cls(data, transform=transform, crs=crs, nodata=nodata)
    return out


def write_raster(path: str, raster, nodata: float | None = None) -> None:
    """Write a Raster as a single-band float32 DEFLATE GeoTIFF."""
    lib = _lib()
    data = np.ascontiguousarray(raster.get_nanarray(), dtype=np.float32)
    use_nodata = nodata if nodata is not None else (raster.nodata if raster.nodata is not None else -9999.0)
    data = np.where(np.isfinite(data), data, np.float32(use_nodata))
    transform = (ctypes.c_double * 6)(*[float(v) for v in tuple(raster.transform)])
    epsg = int(raster.crs.epsg) if raster.crs is not None else 0
    rc = lib.gt_write(
        path.encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[0],
        data.shape[1],
        transform,
        epsg,
        float(use_nodata),
        1,
    )
    if rc != 0:
        raise OSError(f"Cannot write GeoTIFF '{path}': {_err()}")
