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

    def to_vcrs(self, vcrs: Any, force_source_vcrs: Any = None) -> "EPC":
        src = self._vcrs if force_source_vcrs is None else _vcrs_from_user_input(force_source_vcrs)
        if src is None:
            raise ValueError("The EPC has no vertical CRS defined; set one with set_vcrs().")
        dst = _vcrs_from_user_input(vcrs)
        out = self.copy()
        out.z = _transform_zz(src, dst, self.crs, self.x, self.y, np.asarray(self.z))
        out._vcrs = dst
        return out

    def coregister_3d(
        self,
        src_elev: Any,
        coreg_method: Any = None,
        inlier_mask: Any = None,
        bias_vars: Any = None,
        **kwargs: Any,
    ) -> Any:
        """Coregister another elevation dataset to this EPC (reference epc.py:280)."""
        if coreg_method is None:
            from xdem_tpu.coreg import NuthKaab

            coreg_method = NuthKaab()
        return coreg_method.fit_and_apply(self, src_elev, inlier_mask=inlier_mask, bias_vars=bias_vars, **kwargs)


def read_epc(path: str) -> EPC:
    """Read an EPC from an .npz file (x, y, z, crs) as written by examples.get_path."""
    data = np.load(path)
    return EPC(x=data["x"], y=data["y"], z=data["z"], crs=int(data["crs"]))
