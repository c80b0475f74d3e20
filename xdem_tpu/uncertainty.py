"""Uncertainty estimation pipeline: heteroscedasticity + spatial correlation of dh errors.

Backend for DEM.estimate_uncertainty (reference /root/reference/xdem/dem.py:667-780):
  * H2022 (default): heteroscedasticity modelled from terrain variables by N-D binning +
    multi-range variogram of the standardized dh (Hugonnet et al., 2022).
  * R2009: constant error (NMAD of stable dh) + multi-range variogram (Rolstad et al., 2009).
  * Basic: NMAD + single-range variogram.
Defaults: vars ("slope", "max_curvature"), models ("gaussian", "spherical"), sqrt(2) division
for a same-precision pair (reference dem.py:735-736).
"""

from __future__ import annotations

from typing import Any, Callable, Literal, Sequence

import numpy as np

from xdem_tpu import spatialstats, terrain
from xdem_tpu.raster import Raster


def estimate_uncertainty(
    dem: Raster,
    other_elev: Raster,
    stable_terrain: Any = None,
    approach: Literal["H2022", "R2009", "Basic"] = "H2022",
    precision_of_other: Literal["finer", "same"] = "finer",
    list_vars: Sequence[str] = ("slope", "max_curvature"),
    list_vario_models: Sequence[str] = ("gaussian", "spherical"),
    subsample: int = 1000,
    random_state: int | None = None,
    mesh: Any = None,
) -> tuple[Raster, Callable[[np.ndarray], np.ndarray]]:
    """Estimate (sigma(x, y) raster, rho(lag) function) of the elevation differences.

    :param dem: The DEM whose uncertainty is estimated.
    :param other_elev: An independent elevation dataset overlapping the DEM.
    :param stable_terrain: Stable-terrain mask (boolean array, Raster mask or Vector).
    :param approach: "H2022", "R2009" or "Basic".
    :param precision_of_other: "finer" attributes all error to this DEM; "same" divides the
        pair error by sqrt(2).
    :param mesh: A jax.sharding.Mesh to run the pipeline multi-chip: terrain attributes via
        halo-sharded stencils, the error-raster evaluation row-sharded, and the variogram
        runs sharded with psum'd bin reductions (mesh-invariant-exact; SURVEY 2.7 P4).
    """
    # Difference on the common grid
    other = other_elev.reproject(dem) if (
        isinstance(other_elev, Raster)
        and (other_elev.shape != dem.shape or not other_elev.transform.almost_equals(dem.transform))
    ) else other_elev
    dh = Raster((other.data - dem.data), dem.transform, dem.crs)

    if approach == "H2022":
        attrs = terrain.get_terrain_attribute(dem, list(list_vars), mesh=mesh)
        if not isinstance(attrs, list):
            attrs = [attrs]
        # Bin the spread on at most 5e6 stable samples (identical statistics, tractable at
        # 1e8-pixel rasters); the error raster is still evaluated over the full extent.
        sig_dh, _err_fun, _df = spatialstats.infer_heteroscedasticity_from_stable(
            dvalues=dh,
            list_var=attrs,
            list_var_names=list(list_vars),
            stable_mask=stable_terrain,
            subsample=5_000_000,
            random_state=random_state,
            mesh=mesh,
        )
        emp, params, rho = spatialstats.infer_spatial_correlation_from_stable(
            dvalues=dh,
            list_models=list(list_vario_models),
            stable_mask=stable_terrain,
            errors=sig_dh,
            subsample=subsample,
            random_state=random_state,
            mesh=mesh,
        )
    elif approach == "R2009":
        arr, _ = spatialstats._preprocess_values_with_mask_to_array(dh, include_mask=stable_terrain)
        sigma = spatialstats._stat_nmad(arr)
        sig_dh = Raster(np.full(dem.shape, sigma, dtype=np.float32), dem.transform, dem.crs)
        emp, params, rho = spatialstats.infer_spatial_correlation_from_stable(
            dvalues=dh,
            list_models=list(list_vario_models),
            stable_mask=stable_terrain,
            subsample=subsample,
            random_state=random_state,
            mesh=mesh,
        )
    elif approach == "Basic":
        arr, _ = spatialstats._preprocess_values_with_mask_to_array(dh, include_mask=stable_terrain)
        sigma = spatialstats._stat_nmad(arr)
        sig_dh = Raster(np.full(dem.shape, sigma, dtype=np.float32), dem.transform, dem.crs)
        emp, params, rho = spatialstats.infer_spatial_correlation_from_stable(
            dvalues=dh,
            list_models=[list(list_vario_models)[-1]],
            stable_mask=stable_terrain,
            subsample=subsample,
            random_state=random_state,
            mesh=mesh,
        )
    else:
        raise ValueError(f"Unknown uncertainty approach: {approach} (use 'H2022', 'R2009' or 'Basic').")

    # For a same-precision pair, each DEM contributes half the error variance
    if precision_of_other == "same":
        sig_dh = Raster(sig_dh.data / np.float32(np.sqrt(2)), sig_dh.transform, sig_dh.crs)

    return sig_dh, rho
