"""The EPC elevation object: PointCloud subclass with vertical CRS handling.

Reference parity: /root/reference/xdem/epc/epc.py (EPC class with vcrs machinery and
coregister_3d :280).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from xdem_tpu.georef import CRS
from xdem_tpu.pointcloud import PointCloud
from xdem_tpu.vcrs import _transform_zz, _vcrs_from_user_input


class EPC(PointCloud):
    """An elevation point cloud with vertical CRS handling.

    Like the reference (epc/epc.py:48), the first positional argument may be a point-cloud
    file path (LAS/npz/csv — see :func:`read_epc`), a DataFrame with ``x``/``y`` columns and
    the elevation in ``data_column``, or an existing PointCloud to wrap; bare coordinate
    arrays are also accepted as ``x=``/``y=``/``z=`` keywords.
    """

    def __init__(self, *args: Any, data_column: str | None = None, vcrs: Any = None,
                 **kwargs: Any):
        # Positional dispatch by type: coordinate arrays EPC(x, y, z, crs=...) keep the
        # PointCloud order; a single path/DataFrame/PointCloud first argument follows the
        # reference's EPC(filename_or_dataset, data_column) form (epc/epc.py:70-76).
        if args and isinstance(args[0], (np.ndarray, list, tuple)):
            super().__init__(*args, **({"data_column": data_column} if data_column else {}),
                             **kwargs)
            self._vcrs = None
            if vcrs is not None:
                self.set_vcrs(vcrs)
            return
        filename_or_dataset = kwargs.pop("filename_or_dataset", None)
        if args:
            filename_or_dataset = args[0]
            if len(args) > 1:
                if data_column is not None:
                    raise TypeError("data_column given both positionally and as a keyword.")
                data_column = args[1]
            if len(args) > 2:
                raise TypeError("Too many positional arguments for a file/dataset input.")
        if filename_or_dataset is not None:
            import os
            import pathlib

            src = filename_or_dataset
            if isinstance(src, (str, pathlib.Path)):
                if not os.path.isfile(str(src)):
                    raise FileNotFoundError(f"{src} does not exist")
                src = read_epc(str(src), crs=kwargs.pop("crs", None))
            if isinstance(src, PointCloud):
                wrap_crs = kwargs.pop("crs", None)
                if wrap_crs is not None and CRS(wrap_crs) != src.crs:
                    raise ValueError(
                        "Wrapping does not reproject: the PointCloud is already in "
                        f"{src.crs}; call .to_crs({wrap_crs}) first."
                    )
                col = data_column or src.data_column
                super().__init__(x=src.x, y=src.y, z=src.z, crs=src.crs, data_column=col,
                                 aux_columns=getattr(src, "aux_columns", None), **kwargs)
                # Wrapping an EPC carries its vertical CRS unless explicitly overridden
                if vcrs is None:
                    vcrs = getattr(src, "_vcrs", None)
            elif hasattr(src, "columns"):  # pandas DataFrame with x/y + elevation columns
                col = data_column or "z"
                if not {"x", "y", col}.issubset(set(src.columns)):
                    raise ValueError(
                        f"DataFrame input needs 'x', 'y' and '{col}' columns "
                        f"(got {list(src.columns)}); pass data_column= for the elevation."
                    )
                crs = kwargs.pop("crs", None)
                if crs is None:
                    raise ValueError("DataFrame input carries no CRS; pass crs=...")
                super().__init__(x=src["x"].to_numpy(), y=src["y"].to_numpy(),
                                 z=src[col].to_numpy(), crs=crs, data_column=col, **kwargs)
            else:
                raise TypeError(
                    "First argument must be a file path, DataFrame or PointCloud "
                    f"(got {type(src).__name__}); or pass x=/y=/z= arrays."
                )
        else:
            if data_column is not None:
                kwargs.setdefault("data_column", data_column)
            super().__init__(**kwargs)
        self._vcrs = None
        if vcrs is not None:
            self.set_vcrs(vcrs)

    @property
    def vcrs(self) -> Any:
        return self._vcrs

    @property
    def vcrs_name(self) -> str | None:
        return None if self._vcrs is None else str(self._vcrs)

    @property
    def vcrs_grid(self) -> str | None:
        """Grid name of the vertical CRS (reference epc.py:135)."""
        from xdem_tpu.vcrs import grid_name_for

        return grid_name_for(self._vcrs)

    @property
    def ccrs(self):
        """Compound (horizontal + vertical) CRS description string (reference epc.py:158)."""
        if self._vcrs is None:
            return None
        return f"{self.crs!r} + {self._vcrs}"

    def set_vcrs(self, new_vcrs: Any) -> None:
        self._vcrs = _vcrs_from_user_input(new_vcrs)

    def to_vcrs(self, vcrs: Any, force_source_vcrs: Any = None, *,
                inplace: bool = False) -> "EPC | None":
        """Transform point elevations to another vertical CRS; ``inplace=True`` mutates this
        EPC and returns None (reference epc/epc.py to_vcrs)."""
        src = self._vcrs if force_source_vcrs is None else _vcrs_from_user_input(force_source_vcrs)
        if src is None:
            raise ValueError("The EPC has no vertical CRS defined; set one with set_vcrs().")
        dst = _vcrs_from_user_input(vcrs)
        if src == dst:
            import warnings

            warnings.warn(
                "Source and destination vertical CRS are the same, skipping vertical transformation.",
                category=UserWarning,
            )
            return None
        zz = _transform_zz(src, dst, self.crs, self.x, self.y, np.asarray(self.z))
        if inplace:
            self.z = zz
            self._vcrs = dst
            return None
        out = self.copy()
        out.z = zz
        out._vcrs = dst
        return out

    def coregister_3d(
        self,
        reference_elev: Any,
        coreg_method: Any = None,
        inlier_mask: Any = None,
        bias_vars: Any = None,
        **kwargs: Any,
    ) -> Any:
        """Coregister THIS EPC to a reference elevation dataset (reference epc.py:280:
        ``self`` is the to-be-aligned data; the argument is the reference)."""
        if coreg_method is None:
            from xdem_tpu.coreg import NuthKaab

            coreg_method = NuthKaab()
        return coreg_method.fit_and_apply(reference_elev, self.copy(), inlier_mask=inlier_mask,
                                          bias_vars=bias_vars, **kwargs)


def read_epc(path: str, crs: Any = None) -> EPC:
    """Read an EPC from disk; the format is picked by extension.

    - ``.npz``: arrays x, y, z, crs (as written by examples.get_path / :func:`write_epc`)
    - ``.las``: ASPRS LAS 1.0-1.4, any point format (xyz + scales/offsets from the header;
      EPSG recovered from the GeoKeyDirectory VLR when present, else pass ``crs=``)
    - ``.csv`` / ``.txt`` / ``.xyz``: whitespace- or comma-delimited x y z columns, optional
      header line; pass ``crs=`` (no text convention carries one)

    The reference delegates point I/O to geopandas/laspy (geoutils.PointCloud); this reader
    is self-contained.
    """
    lower = path.lower()
    if lower.endswith(".npz"):
        data = np.load(path)
        return EPC(x=data["x"], y=data["y"], z=data["z"],
                   crs=int(data["crs"]) if crs is None else crs)
    if lower.endswith(".laz"):
        raise OSError("Compressed LAZ is not supported; decompress to .las first.")
    if lower.endswith(".las"):
        x, y, z, file_epsg = _read_las(path)
        crs = crs if crs is not None else file_epsg
        if crs is None:
            raise ValueError(
                f"'{path}' carries no GeoKey CRS; pass read_epc(path, crs=...) explicitly."
            )
        return EPC(x=x, y=y, z=z, crs=crs)
    if lower.endswith((".csv", ".txt", ".xyz")):
        if crs is None:
            raise ValueError("Text point files carry no CRS; pass read_epc(path, crs=...).")
        with open(path) as f:
            first = f.readline()
        delim = "," if "," in first else None
        tokens = first.replace(",", " ").split()
        try:  # a header line is one whose first token is not a number (incl. 1.5e+00/nan)
            float(tokens[0])
            has_header = False
        except (ValueError, IndexError):
            has_header = bool(tokens)  # an empty first line is data-less, not a header
        arr = np.loadtxt(path, delimiter=delim, skiprows=1 if has_header else 0, ndmin=2)
        if arr.shape[1] < 3:
            raise ValueError(f"'{path}': expected at least 3 columns (x y z), got {arr.shape[1]}.")
        return EPC(x=arr[:, 0], y=arr[:, 1], z=arr[:, 2], crs=crs)
    raise ValueError(f"Unsupported point-cloud format: '{path}' (use .npz, .las, .csv/.txt/.xyz).")


def write_epc(path: str, epc: PointCloud) -> None:
    """Write an EPC to .las (ASPRS LAS 1.2, point format 0, EPSG in a GeoKey VLR),
    .npz, or delimited text (.csv/.txt/.xyz; header x,y,z)."""
    lower = path.lower()
    if lower.endswith(".npz"):
        if not epc.crs.epsg:
            raise ValueError(
                "The npz layout stores the CRS as an EPSG code, but this point cloud's CRS "
                f"({epc.crs}) has none. Reproject to an EPSG-coded CRS first, or write text."
            )
        np.savez(path, x=epc.x, y=epc.y, z=epc.z, crs=np.int64(epc.crs.epsg))
    elif lower.endswith(".las"):
        _write_las(path, epc)
    elif lower.endswith((".csv", ".txt", ".xyz")):
        delim = "," if lower.endswith(".csv") else " "
        np.savetxt(path, np.column_stack([epc.x, epc.y, epc.z]),
                   delimiter=delim, header=delim.join(("x", "y", "z")), comments="")
    else:
        raise ValueError(f"Unsupported output format: '{path}' (use .las, .npz or .csv/.txt/.xyz).")


def _write_las(path: str, epc: PointCloud) -> None:
    """Minimal ASPRS LAS 1.2 writer: point data record format 0 (20 bytes: scaled-int32 xyz
    + zeroed attributes), mm coordinate scale, and the projected/geographic EPSG recorded in
    a LASF_Projection GeoKeyDirectory VLR (record 34735) so :func:`read_epc` — and any
    standard LAS reader — recovers the CRS. The reference delegates LAS I/O to laspy through
    geoutils; this writer is self-contained."""
    import struct

    if not epc.crs.epsg:
        raise ValueError(
            "LAS stores the CRS as an EPSG GeoKey, but this point cloud's CRS "
            f"({epc.crs}) has none. Reproject to an EPSG-coded CRS first."
        )
    x, y, z = epc.x, epc.y, epc.z
    n = int(x.size)
    ox = float(np.min(x)) if n else 0.0
    oy = float(np.min(y)) if n else 0.0
    oz = float(np.min(z)) if n else 0.0
    # GeoKeyDirectory: version header + GTModelType (1=projected, 2=geographic) + the CS key
    is_geographic = epc.crs.is_geographic if hasattr(epc.crs, "is_geographic") else False
    # mm precision for projected coordinates; 1e-7 deg (~1 cm) for geographic horizontal.
    # z stays metric mm in both cases (int32 * 1e-7 would cap the z extent at ~214 m).
    # Each axis coarsens by decades until its span fits int32 (e.g. ±180 deg of longitude
    # needs 1e-6): precision degrades gracefully instead of overflowing.
    def _fit_scale(base: float, span: float) -> float:
        s = base
        while span / s > 0.9 * 2**31:
            s *= 10.0
        return s

    base = 1e-7 if is_geographic else 1e-3
    scale_x = _fit_scale(base, (float(np.max(x)) - ox) if n else 0.0)
    scale_y = _fit_scale(base, (float(np.max(y)) - oy) if n else 0.0)
    zscale = _fit_scale(1e-3, (float(np.max(z)) - oz) if n else 0.0)
    cs_key = 2048 if is_geographic else 3072
    keys = [(1, 1, 0, 2), (1024, 0, 1, 2 if is_geographic else 1), (cs_key, 0, 1, int(epc.crs.epsg))]
    keys[0] = (1, 1, 0, len(keys) - 1)
    geokeys = b"".join(struct.pack("<4H", *k) for k in keys)
    vlr = struct.pack("<H16sHH32s", 0, b"LASF_Projection", 34735, len(geokeys),
                      b"GeoKeyDirectory") + geokeys

    header_size = 227
    point_offset = header_size + len(vlr)
    header = struct.pack(
        "<4sHHIHH8sBB32s32sHHHII", b"LASF", 0, 0, 0, 0, 0, b"", 1, 2,
        b"xdem_tpu", b"xdem_tpu write_epc", 1, 2026, header_size, point_offset, 1,
    )
    header += struct.pack("<BHI", 0, 20, n)  # point format 0, 20-byte records, count
    header += struct.pack("<5I", n, 0, 0, 0, 0)  # points by return
    header += struct.pack("<6d", scale_x, scale_y, zscale, ox, oy, oz)
    header += struct.pack("<6d",
                          float(np.max(x)) if n else 0.0, ox,
                          float(np.max(y)) if n else 0.0, oy,
                          float(np.max(z)) if n else 0.0, oz)
    assert len(header) == header_size, len(header)

    records = np.zeros((n, 20), dtype=np.uint8)
    xyz_i = np.column_stack([
        np.round((x - ox) / scale_x), np.round((y - oy) / scale_y), np.round((z - oz) / zscale)
    ]).astype("<i4")
    records[:, :12] = xyz_i.view(np.uint8).reshape(n, 12)
    with open(path, "wb") as f:
        f.write(header)
        f.write(vlr)
        f.write(records.tobytes())


def _read_las(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray, int | None]:
    """Minimal self-contained ASPRS LAS reader: xyz for any point format (the first 12 bytes
    of every record are scaled-int32 x, y, z in all formats 0-10), plus best-effort EPSG from
    the LASF_Projection GeoKeyDirectory VLR (record 34735)."""
    import struct

    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != b"LASF":
        raise OSError(f"'{path}' is not a LAS file (bad signature).")
    ver_major, ver_minor = buf[24], buf[25]
    header_size = struct.unpack_from("<H", buf, 94)[0]
    point_offset = struct.unpack_from("<I", buf, 96)[0]
    n_vlrs = struct.unpack_from("<I", buf, 100)[0]
    point_len = struct.unpack_from("<H", buf, 105)[0]
    n_points = struct.unpack_from("<I", buf, 107)[0]
    if ver_major == 1 and ver_minor >= 4 and header_size >= 255:
        n64 = struct.unpack_from("<Q", buf, 247)[0]
        if n64:  # LAS 1.4 moves the authoritative count; legacy field may be zeroed
            n_points = n64
    sx, sy, sz, ox, oy, oz = struct.unpack_from("<6d", buf, 131)

    # Walk VLRs for the GeoKeyDirectory to recover a projected/geographic EPSG
    epsg = None
    pos = header_size
    for _ in range(n_vlrs):
        if pos + 54 > len(buf):
            break
        record_id, rec_len = struct.unpack_from("<HH", buf, pos + 18)
        if record_id == 34735 and rec_len >= 8 and pos + 54 + rec_len <= len(buf):
            keys = np.frombuffer(buf, "<u2", count=rec_len // 2, offset=pos + 54)
            # Clip the claimed key count to what the record actually holds (corrupt VLRs
            # must degrade to "no CRS found", not crash)
            n_keys = min(int(keys[3]), (len(keys) - 4) // 4)
            for k in range(n_keys):
                key_id, loc, _cnt, val = keys[4 + 4 * k: 8 + 4 * k]
                if key_id in (3072, 2048) and loc == 0:  # Projected / Geographic CS EPSG
                    if int(val) == 32767:  # GeoTIFF "user-defined": not a real EPSG code
                        continue
                    epsg = int(val)
                    if key_id == 3072:
                        break
        pos += 54 + rec_len

    end = point_offset + n_points * point_len
    if point_len < 12 or end > len(buf):
        raise OSError(f"'{path}': truncated LAS point data.")
    records = np.frombuffer(buf, np.uint8, count=n_points * point_len, offset=point_offset)
    xyz_i = records.reshape(n_points, point_len)[:, :12].copy().view("<i4")
    return (xyz_i[:, 0] * sx + ox, xyz_i[:, 1] * sy + oy, xyz_i[:, 2] * sz + oz, epsg)
