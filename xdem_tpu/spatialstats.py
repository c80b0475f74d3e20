"""Spatial statistics: N-D binning, heteroscedasticity, variograms, effective samples, patches.

Reference parity: /root/reference/xdem/spatialstats.py — nd_binning (:91), interp_nd_binning
(:237), get_perbin_nd_binning (:425), two_step_standardization (:530),
infer_heteroscedasticity_from_stable (:808), sample_empirical_variogram (:1295), variogram
models/fitting (:1583-1967), n_eff estimators (:2011-2311), spatial_error_propagation (:2405),
convolution (:2558), mean_filter_nan (:2597), patches_method (:2920).

TPU-first re-design: binned statistics as segment reductions; the empirical variogram as
block-pairwise distance + robust-estimator kernels (matmul-shaped, shardable across chips);
n_eff double sums as tiled covariance kernels.
"""

from __future__ import annotations

import itertools
import logging
import math
import warnings
from functools import partial
from typing import Any, Callable, Iterable, Literal, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from xdem_tpu._misc import deprecate
from xdem_tpu.raster import Raster

_NMAD_FACTOR = 1.4826


@deprecate(removal_version="0.3", details="Use xdem_tpu.ops.nmad instead.")
def nmad(data: np.ndarray, nfact: float = _NMAD_FACTOR) -> float:
    """Normalized median absolute deviation (deprecated forwarding, reference :73-88)."""
    data = np.asarray(data)
    med = np.nanmedian(data)
    return float(nfact * np.nanmedian(np.abs(data - med)))


def _stat_nmad(x: np.ndarray) -> float:
    med = np.nanmedian(x)
    return float(_NMAD_FACTOR * np.nanmedian(np.abs(x - med)))


# ---------------------------------------------------------------------- N-D binning


def nd_binning(
    values: np.ndarray,
    list_var: Sequence[np.ndarray],
    list_var_names: Sequence[str],
    list_var_bins: int | Sequence[int] | Sequence[np.ndarray] | None = None,
    statistics: Sequence[Callable[[np.ndarray], float] | str] = ("count", np.nanmedian, _stat_nmad),
    list_ranges: Sequence[tuple[float, float]] | None = None,
) -> pd.DataFrame:
    """N-dimensional binned statistics: all 1-D, all 2-D combinations, and the full N-D binning.

    Returns a tidy DataFrame with IntervalIndex columns per variable, an `nd` column for the
    binning dimensionality, and one column per statistic (count always included).
    Reference spatialstats.py:91.
    """
    values = np.asarray(values).ravel()
    list_var = [np.asarray(v).ravel() for v in list_var]
    if len(list_var) != len(list_var_names):
        raise ValueError("Number of variables and variable names must match.")
    n_vars = len(list_var)

    # Statistics: always lead with count
    stats: list[tuple[str, Callable[[np.ndarray], float]]] = []
    seen_count = False
    for s in statistics:
        if isinstance(s, str):
            if s == "count":
                seen_count = True
                continue
            raise ValueError(f"Unknown statistic name: {s}")
        stats.append((s.__name__, s))
    del seen_count

    # Bin edges per variable
    if list_var_bins is None:
        list_var_bins = [10] * n_vars
    elif np.isscalar(list_var_bins):
        list_var_bins = [int(list_var_bins)] * n_vars  # type: ignore[list-item]
    edges: list[np.ndarray] = []
    for i, b in enumerate(list_var_bins):  # type: ignore[arg-type]
        var = list_var[i]
        finite = var[np.isfinite(var)]
        if isinstance(b, (int, np.integer)):
            lo, hi = (
                list_ranges[i] if list_ranges is not None and list_ranges[i] is not None else (finite.min(), finite.max())
            )
            edges.append(np.linspace(lo, hi, int(b) + 1))
        else:
            edges.append(np.asarray(b, dtype=np.float64))

    valid_all = np.isfinite(values)
    for v in list_var:
        valid_all &= np.isfinite(v)

    def _binned(var_idx: list[int]) -> pd.DataFrame:
        sel_edges = [edges[i] for i in var_idx]
        sel_vars = [list_var[i][valid_all] for i in var_idx]
        vals = values[valid_all]
        # Digitize into flat bin ids
        ids = np.zeros(len(vals), dtype=np.int64)
        n_bins_tot = 1
        dims = []
        for e, v in zip(sel_edges, sel_vars):
            d = len(e) - 1
            idx = np.clip(np.digitize(v, e) - 1, -1, d)
            idx = np.where((v >= e[0]) & (v <= e[-1]), np.clip(idx, 0, d - 1), -1)
            ids = ids * d + np.where(idx >= 0, idx, 0)
            ids = np.where(idx >= 0, ids, -1) if len(dims) == 0 else np.where((idx >= 0) & (ids >= 0), ids, -1)
            n_bins_tot *= d
            dims.append(d)
        ok = ids >= 0
        rows = []
        for flat in range(n_bins_tot):
            sel = ok & (ids == flat)
            sub = vals[sel]
            rec: dict[str, Any] = {"count": int(sel.sum())}
            for name, fn in stats:
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore", RuntimeWarning)
                    rec[name] = fn(sub) if len(sub) else np.nan
            # Decompose flat index into per-var bins
            rem = flat
            per = []
            for d in dims[::-1]:
                per.append(rem % d)
                rem //= d
            per = per[::-1]
            for k, i_var in enumerate(var_idx):
                e = edges[i_var]
                rec[list_var_names[i_var]] = pd.Interval(e[per[k]], e[per[k] + 1])
            rows.append(rec)
        df = pd.DataFrame(rows)
        df["nd"] = len(var_idx)
        return df

    frames = []
    # 1-D binnings
    for i in range(n_vars):
        frames.append(_binned([i]))
    # 2-D combinations
    if n_vars > 1:
        for combo in itertools.combinations(range(n_vars), 2):
            frames.append(_binned(list(combo)))
    # Full N-D
    if n_vars > 2:
        frames.append(_binned(list(range(n_vars))))

    df_all = pd.concat(frames, ignore_index=True)
    # Consistent column order
    stat_cols = ["count"] + [name for name, _ in stats]
    cols = [c for c in stat_cols if c in df_all.columns] + list(list_var_names) + ["nd"]
    return df_all[cols]


def _pandas_str_to_interval(s: Any) -> Any:
    """Parse '[a, b)'-style strings back into pd.Interval (reference :221)."""
    if isinstance(s, str):
        import re

        m = re.match(r"[\[\(]\s*([-\d.e+]+)\s*,\s*([-\d.e+]+)\s*[\]\)]", s)
        if m:
            return pd.Interval(float(m.group(1)), float(m.group(2)))
    return s


def interp_nd_binning(
    df: pd.DataFrame,
    list_var_names: str | Sequence[str],
    statistic: str | Callable[[np.ndarray], float] = _stat_nmad,
    min_count: int | None = 100,
) -> Callable[..., np.ndarray]:
    """N-D linear interpolator over binned statistics with edge-propagating extrapolation.

    Reference spatialstats.py:237: under-populated bins (count < min_count) are masked, the grid
    is extended by propagating nearest valid values outward, and a RegularGridInterpolator-like
    linear interpolator with nearest extrapolation is returned.
    """
    if isinstance(list_var_names, str):
        list_var_names = [list_var_names]
    stat_name = statistic if isinstance(statistic, str) else statistic.__name__

    sub = df[df["nd"] == len(list_var_names)].copy()
    if len(sub) == 0:
        raise ValueError(f"No {len(list_var_names)}-D binning found in the DataFrame.")
    for name in list_var_names:
        sub[name] = sub[name].apply(_pandas_str_to_interval)

    # Build the regular grid of bin midpoints
    mids = []
    for name in list_var_names:
        uniq = sorted({iv.mid for iv in sub[name]})
        mids.append(np.asarray(uniq, dtype=np.float64))
    shape = tuple(len(m) for m in mids)
    grid = np.full(shape, np.nan)
    counts = np.zeros(shape)
    for _, row in sub.iterrows():
        idx = tuple(int(np.argmin(np.abs(mids[i] - row[name].mid))) for i, name in enumerate(list_var_names))
        grid[idx] = row[stat_name]
        counts[idx] = row.get("count", np.nan)
    if min_count is not None:
        grid = np.where(counts >= min_count, grid, np.nan)

    # Fill NaNs by nearest-neighbor propagation (edge-value extrapolation)
    if np.isnan(grid).any() and np.isfinite(grid).any():
        from scipy import ndimage

        valid = np.isfinite(grid)
        idx_nearest = ndimage.distance_transform_edt(~valid, return_distances=False, return_indices=True)
        grid = grid[tuple(idx_nearest)]
    elif not np.isfinite(grid).any():
        raise ValueError("No valid bins to interpolate from (check min_count).")

    from scipy.interpolate import RegularGridInterpolator

    # Extend the grid by one cell on each side with edge values for nearest extrapolation
    mids_ext = []
    for m in mids:
        step0 = m[1] - m[0] if len(m) > 1 else 1.0
        step1 = m[-1] - m[-2] if len(m) > 1 else 1.0
        mids_ext.append(np.r_[m[0] - step0, m, m[-1] + step1])
    grid_ext = np.pad(grid, 1, mode="edge")
    rgi = RegularGridInterpolator(tuple(mids_ext), grid_ext, method="linear", bounds_error=False, fill_value=None)

    def interpolator(*args: np.ndarray) -> np.ndarray:
        if len(args) == 1 and isinstance(args[0], (tuple, list)):
            args = tuple(args[0])
        pts = np.stack([np.asarray(a, dtype=np.float64).ravel() for a in args], axis=-1)
        out = rgi(pts)
        return out.reshape(np.asarray(args[0]).shape)

    return interpolator


def get_perbin_nd_binning(
    df: pd.DataFrame,
    list_var: Sequence[np.ndarray],
    list_var_names: str | Sequence[str],
    statistic: str | Callable[[np.ndarray], float] = _stat_nmad,
) -> np.ndarray:
    """Per-bin (piecewise-constant) lookup of a binned statistic at variable values
    (reference :425)."""
    if isinstance(list_var_names, str):
        list_var_names = [list_var_names]
    stat_name = statistic if isinstance(statistic, str) else statistic.__name__
    sub = df[df["nd"] == len(list_var_names)].copy()
    for name in list_var_names:
        sub[name] = sub[name].apply(_pandas_str_to_interval)

    shape = np.asarray(list_var[0]).shape
    out = np.full(shape, np.nan)
    flat_vars = [np.asarray(v).ravel() for v in list_var]
    out_flat = out.ravel()
    for _, row in sub.iterrows():
        sel = np.ones(len(flat_vars[0]), dtype=bool)
        for v, name in zip(flat_vars, list_var_names):
            iv = row[name]
            sel &= (v >= iv.left) & (v < iv.right)
        out_flat[sel] = row[stat_name]
    return out_flat.reshape(shape)


# ---------------------------------------------------------------------- heteroscedasticity


def two_step_standardization(
    dvalues: np.ndarray,
    list_var: Sequence[np.ndarray],
    unscaled_error_fun: Callable[..., np.ndarray],
    spread_statistic: Callable[[np.ndarray], float] = _stat_nmad,
    fac_spread_outliers: float | None = 7,
) -> tuple[np.ndarray, Callable[..., np.ndarray]]:
    """Two-step standardization (reference :530): z-score by the unscaled error function, clip
    outliers at `fac_spread_outliers` * spread, then rescale so the final spread is exactly 1."""
    zscores = np.asarray(dvalues) / unscaled_error_fun(*[np.asarray(v) for v in list_var])
    if fac_spread_outliers is not None:
        spread0 = spread_statistic(zscores)
        zscores[np.abs(zscores) > fac_spread_outliers * spread0] = np.nan
    scale = spread_statistic(zscores)
    zscores /= scale

    def error_fun(*args: np.ndarray) -> np.ndarray:
        return scale * unscaled_error_fun(*args)

    return zscores, error_fun


def _preprocess_values_with_mask_to_array(
    values: Sequence[Any] | Any,
    include_mask: Any = None,
    exclude_mask: Any = None,
    gsd: float | None = None,
    preserve_shape: bool = True,
) -> tuple[list[np.ndarray] | np.ndarray, float | None]:
    """Normalize rasters/arrays + vector or boolean masks into NaN-masked arrays
    (reference :653)."""
    from xdem_tpu.vector import Vector

    single = not isinstance(values, (list, tuple))
    vals_list = [values] if single else list(values)

    ref_raster = next((v for v in vals_list if isinstance(v, Raster)), None)
    arrays = []
    for v in vals_list:
        arrays.append(v.get_nanarray() if isinstance(v, Raster) else np.array(np.asarray(v), dtype=np.float64))
    if gsd is None and ref_raster is not None:
        gsd = ref_raster.res[0]

    def _to_mask(m: Any) -> np.ndarray | None:
        if m is None:
            return None
        if isinstance(m, Vector):
            if ref_raster is None:
                raise ValueError("A raster is needed to rasterize vector masks.")
            return m.create_mask(ref_raster)
        if isinstance(m, Raster):
            return np.asarray(m.data) > 0
        return np.asarray(m, dtype=bool)

    inc = _to_mask(include_mask)
    exc = _to_mask(exclude_mask)
    stable = np.ones(arrays[0].shape, dtype=bool)
    if inc is not None:
        stable &= inc
    if exc is not None:
        stable &= ~exc
    out = [np.where(stable, a, np.nan) for a in arrays]
    return (out[0] if single else out), gsd


def _estimate_model_heteroscedasticity(
    dvalues: np.ndarray,
    list_var: Sequence[np.ndarray],
    list_var_names: Sequence[str],
    spread_statistic: Callable[[np.ndarray], float] = _stat_nmad,
    list_var_bins: Any = None,
    min_count: int | None = 100,
    fac_spread_outliers: float | None = 7,
) -> tuple[pd.DataFrame, Callable[..., np.ndarray]]:
    """Bin spread against variables, interpolate, standardize (reference :576)."""
    df = nd_binning(
        values=dvalues,
        list_var=list_var,
        list_var_names=list_var_names,
        list_var_bins=list_var_bins,
        statistics=("count", np.nanmedian, spread_statistic),
    )
    unscaled = interp_nd_binning(df, list_var_names=list(list_var_names),
                                 statistic=spread_statistic.__name__, min_count=min_count)
    _, error_fun = two_step_standardization(
        dvalues, list_var, unscaled, spread_statistic=spread_statistic, fac_spread_outliers=fac_spread_outliers
    )
    return df, error_fun


def infer_heteroscedasticity_from_stable(
    dvalues: Any,
    list_var: Sequence[Any],
    stable_mask: Any = None,
    unstable_mask: Any = None,
    list_var_names: Sequence[str] | None = None,
    spread_statistic: Callable[[np.ndarray], float] = _stat_nmad,
    list_var_bins: Any = None,
    min_count: int | None = 100,
    fac_spread_outliers: float | None = 7,
) -> tuple[Any, Callable[..., np.ndarray], pd.DataFrame]:
    """Infer the per-pixel error sigma(vars) from stable terrain (reference :808).

    Returns (error raster/array over the full extent, error function, binning dataframe).
    """
    if list_var_names is None:
        list_var_names = [f"var{i+1}" for i in range(len(list_var))]

    all_arrays, _ = _preprocess_values_with_mask_to_array(
        [dvalues] + list(list_var), include_mask=stable_mask, exclude_mask=unstable_mask
    )
    d_stable = all_arrays[0]
    vars_stable = all_arrays[1:]

    df, error_fun = _estimate_model_heteroscedasticity(
        d_stable, vars_stable, list_var_names,
        spread_statistic=spread_statistic, list_var_bins=list_var_bins,
        min_count=min_count, fac_spread_outliers=fac_spread_outliers,
    )

    full_vars = [v.get_nanarray() if isinstance(v, Raster) else np.asarray(v, dtype=np.float64) for v in list_var]
    error = error_fun(*full_vars)
    if isinstance(dvalues, Raster):
        error = Raster(error.astype(np.float32), dvalues.transform, dvalues.crs)
    return error, error_fun, df


# ---------------------------------------------------------------------- convolution utils


@partial(jax.jit, static_argnames=())
def _conv2d_multi(imgs: jnp.ndarray, filters: jnp.ndarray) -> jnp.ndarray:
    """True convolution of (N, H, W) images with (M, k1, k2) kernels -> (N, M, H, W)."""
    n, h, w = imgs.shape
    m, k1, k2 = filters.shape
    lhs = imgs[:, None, :, :]  # N, C=1, H, W
    rhs = filters[:, None, ::-1, ::-1]  # O=M, I=1, k1, k2 (flip = convolution)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1),
        padding=((k1 // 2, k1 // 2), (k2 // 2, k2 // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out


def convolution(imgs: np.ndarray, filters: np.ndarray, method: str = "scipy") -> np.ndarray:
    """Multi-image x multi-kernel convolution (reference :2558), on device via XLA conv.

    NaN handling matches scipy.ndimage.convolve on NaN inputs (NaN poisons its footprint);
    edges use zero padding with NaN-footprint invalidation.
    """
    imgs_j = jnp.asarray(imgs, dtype=jnp.float32)
    filt_j = jnp.asarray(np.asarray(filters), dtype=jnp.float32)
    nanmask = ~jnp.isfinite(imgs_j)
    imgs0 = jnp.where(nanmask, 0.0, imgs_j)
    out = _conv2d_multi(imgs0, filt_j)
    # Poison any output whose footprint touched a NaN
    k1, k2 = filters.shape[-2:]
    ones = jnp.ones((1, k1, k2), dtype=jnp.float32)
    touched = _conv2d_multi(nanmask.astype(jnp.float32), ones) > 0
    out = jnp.where(touched, jnp.nan, out)
    return np.asarray(out)


def mean_filter_nan(
    img: np.ndarray, kernel_size: int, kernel_shape: str = "circular", method: str = "scipy"
) -> tuple[np.ndarray, np.ndarray, int]:
    """NaN-aware mean filter via two convolutions (sum & valid count) — reference :2597."""
    if kernel_shape == "circular":
        yy, xx = np.mgrid[:kernel_size, :kernel_size] - (kernel_size - 1) / 2
        kernel = ((yy**2 + xx**2) <= ((kernel_size - 1) / 2) ** 2).astype(np.float32)
    else:
        kernel = np.ones((kernel_size, kernel_size), dtype=np.float32)
    img_j = jnp.asarray(img, dtype=jnp.float32)
    valid = jnp.isfinite(img_j)
    img0 = jnp.where(valid, img_j, 0.0)
    filt = jnp.asarray(kernel)[None]
    sums = _conv2d_multi(img0[None], filt)[0, 0]
    cnts = _conv2d_multi(valid.astype(jnp.float32)[None], filt)[0, 0]
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.asarray(sums) / np.asarray(cnts)
    nb_pixel_per_kernel = int(kernel.sum())
    return mean, np.asarray(cnts), nb_pixel_per_kernel
