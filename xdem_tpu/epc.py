"""The EPC elevation object: PointCloud subclass with vertical CRS handling.

Reference parity: /root/reference/xdem/epc/epc.py (EPC class with vcrs machinery and
coregister_3d :280).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from xdem_tpu.pointcloud import PointCloud
from xdem_tpu.vcrs import _transform_zz, _vcrs_from_user_input


class EPC(PointCloud):
    """An elevation point cloud with vertical CRS handling."""

    def __init__(self, *args: Any, vcrs: Any = None, **kwargs: Any):
        super().__init__(*args, **kwargs)
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
    """Write an EPC to .npz or delimited text (.csv/.txt/.xyz; header x,y,z)."""
    lower = path.lower()
    if lower.endswith(".npz"):
        if not epc.crs.epsg:
            raise ValueError(
                "The npz layout stores the CRS as an EPSG code, but this point cloud's CRS "
                f"({epc.crs}) has none. Reproject to an EPSG-coded CRS first, or write text."
            )
        np.savez(path, x=epc.x, y=epc.y, z=epc.z, crs=np.int64(epc.crs.epsg))
    elif lower.endswith((".csv", ".txt", ".xyz")):
        delim = "," if lower.endswith(".csv") else " "
        np.savetxt(path, np.column_stack([epc.x, epc.y, epc.z]),
                   delimiter=delim, header=delim.join(("x", "y", "z")), comments="")
    else:
        raise ValueError(f"Unsupported output format: '{path}' (use .npz or .csv/.txt/.xyz).")


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
