"""Volume change: hypsometric binning, interpolation, area/volume, and gap-filling.

Reference parity: /root/reference/xdem/volume.py — hypsometric_binning (:43),
interpolate_hypsometric_bins (:131), fit_hypsometric_bins_poly (:183),
calculate_hypsometry_area (:239), idw_interpolation (:302), hypsometric_interpolation (:353),
local_hypsometric_interpolation (:407), get_regional_hypsometric_signal (:568),
norm_regional_hypsometric_interpolation (:668).
"""

from __future__ import annotations

from typing import Any, Callable, Literal, Sequence

import warnings

import numpy as np
import pandas as pd

from xdem_tpu.raster import Raster


def _nmad(x: np.ndarray) -> float:
    med = np.nanmedian(x)
    return float(1.4826 * np.nanmedian(np.abs(x - med)))


def hypsometric_binning(
    ddem: np.ndarray,
    ref_dem: np.ndarray,
    bins: float | np.ndarray = 50.0,
    kind: Literal["fixed", "count", "quantile", "custom"] = "fixed",
    aggregation_function: Callable[[np.ndarray], float] = np.median,
) -> pd.DataFrame:
    """Bin dh by reference elevation; returns a DataFrame indexed by elevation intervals.

    :param ddem: Elevation differences (same shape as ref_dem), NaN = nodata.
    :param ref_dem: Reference elevations.
    :param bins: Bin size (fixed), number of bins (count), count per bin (quantile), or edges.
    :param kind: Binning strategy.
    :param aggregation_function: Statistic per bin (default median).

    >>> import numpy as np
    >>> ref = np.repeat(np.arange(4.0), 4).reshape(4, 4) * 100
    >>> dh = np.ones((4, 4)) * np.arange(4)[:, None]
    >>> df = hypsometric_binning(dh, ref, bins=100.0)
    >>> list(df["value"])
    [0.0, 1.0, 2.0, 3.0]
    """
    ddem = np.asarray(ddem, dtype=np.float64).ravel()
    ref = np.asarray(ref_dem, dtype=np.float64).ravel()
    # Bin edges are derived from ALL valid reference pixels (reference volume.py:70-74):
    # ddem nodata only excludes pairs from the aggregation, not from the elevation range.
    ref_ok = np.isfinite(ref)
    ref = ref[ref_ok]
    ddem = ddem[ref_ok]

    if isinstance(bins, np.ndarray) or kind == "custom":
        zbins = np.asarray(bins, dtype=np.float64)
    elif kind == "fixed":
        zbins = np.arange(ref.min(), ref.max() + bins + 1e-6, step=bins)
    elif kind == "count":
        zbins = np.linspace(ref.min(), ref.max() + 1e-6 / bins, num=int(bins) + 1)
    elif kind == "quantile":
        # `bins` equal-count bins via percentiles (reference :83-88)
        zbins = np.percentile(ref, np.linspace(0, 100, int(bins) + 1))
        zbins[-1] += 1e-6
    else:
        raise ValueError(f"Invalid bin kind: {kind}")

    indices = np.digitize(ref, zbins, right=False)
    values = np.full(len(zbins) - 1, np.nan)
    counts = np.zeros(len(zbins) - 1, dtype=int)
    for i in range(1, len(zbins)):
        vals_in = ddem[indices == i]
        vals_in = vals_in[np.isfinite(vals_in)]
        counts[i - 1] = vals_in.size
        if vals_in.size > 0:
            # NOTE: the reference assigns bin i's statistic to row i-1 (volume.py:116-117),
            # rotating every value down one interval (the lowest bin wraps into the last
            # row). We align values with their intervals instead of replicating the bug.
            values[i - 1] = aggregation_function(vals_in)

    return pd.DataFrame(
        {"value": values, "count": counts},
        index=pd.IntervalIndex.from_breaks(zbins),
    )


def interpolate_hypsometric_bins(
    hypsometric_bins: pd.DataFrame,
    value_column: str = "value",
    method: str = "polynomial",
    order: int = 3,
    count_threshold: int | None = None,
) -> pd.DataFrame:
    """Interpolate NaN (or under-populated) bins from their neighbors (reference volume.py:131)."""
    bins = hypsometric_bins.copy()
    bins.index = bins.index.mid
    if count_threshold is not None:
        assert "count" in hypsometric_bins.columns
        under = bins["count"] < count_threshold
        bins.loc[under, value_column] = np.nan
    nvalids = int(np.count_nonzero(np.isfinite(bins[value_column])))
    if nvalids <= order + 1:
        warnings.warn("Not enough valid bins for interpolation -> returning copy", UserWarning)
        return hypsometric_bins.copy()
    bins[value_column] = bins[value_column].interpolate(method=method, order=order, limit_direction="both")
    if count_threshold is not None:
        # Excluded-but-measured bins keep their original values (reference :174-175)
        bins.loc[under, value_column] = hypsometric_bins.loc[under.values, value_column].values
    bins.index = hypsometric_bins.index
    return bins


def fit_hypsometric_bins_poly(
    hypsometric_bins: pd.DataFrame,
    value_column: str = "value",
    degree: int = 3,
    iterations: int = 1,
    count_threshold: int | None = None,
) -> pd.DataFrame:
    """Iterative 3-sigma-clipped polynomial fit over bin midpoints (reference volume.py:183)."""
    bins = hypsometric_bins.copy()
    mids = hypsometric_bins.index.mid.values.astype(np.float64)
    vals = bins[value_column].values.astype(np.float64)
    if count_threshold is not None:
        vals = np.where(bins["count"].values < count_threshold, np.nan, vals)

    keep = np.isfinite(vals)
    coefs = None
    for _ in range(iterations):
        if keep.sum() < degree + 1:
            break
        coefs = np.polyfit(mids[keep], vals[keep], deg=degree)
        resid = vals - np.polyval(coefs, mids)
        sigma = np.nanstd(resid[keep])
        new_keep = keep & (np.abs(resid) < 3 * sigma)
        if new_keep.sum() == keep.sum():
            keep = new_keep
            break
        keep = new_keep
    if coefs is None:
        raise ValueError("Not enough valid bins for polynomial fit.")
    out = hypsometric_bins.copy()
    out[value_column] = np.polyval(coefs, mids)
    return out


def calculate_hypsometry_area(
    ddem_bins: pd.Series | pd.DataFrame,
    ref_dem: np.ndarray,
    pixel_size: float | tuple[float, float],
    timeframe: Literal["reference", "nonreference", "mean"] = "reference",
) -> pd.Series:
    """Representative area per elevation bin at a given timeframe (reference volume.py:239)."""
    if timeframe not in ("reference", "nonreference", "mean"):
        raise ValueError(
            f"Argument 'timeframe={timeframe}' is invalid. Choices: ['reference', 'nonreference', 'mean']."
        )
    if isinstance(ddem_bins, pd.DataFrame):
        ddem_series = ddem_bins["value"]
    else:
        ddem_series = ddem_bins

    ref = np.asarray(ref_dem, dtype=np.float64)
    assert not np.any(np.isnan(ref)), "The given reference DEM has NaNs. No NaNs are allowed to calculate area!"

    if timeframe in ("nonreference", "mean"):
        assert not np.any(np.isnan(ddem_series.values)), \
            "The dDEM bins cannot contain NaNs. Remove or fill them first."
        # dh is defined as ref - other, so the other timeframe's elevations are ref - dh;
        # linear extrapolation beyond the outermost bin midpoints (reference :278-297)
        from scipy.interpolate import interp1d

        dh_of_z = interp1d(ddem_series.index.mid.values, ddem_series.values,
                           kind="linear", fill_value="extrapolate")
        if timeframe == "nonreference":
            ref = ref - dh_of_z(ref)
        else:
            ref = ref - dh_of_z(ref) / 2

    edges = np.r_[[iv.left for iv in ddem_series.index], ddem_series.index[-1].right]
    counts, _ = np.histogram(ref, bins=edges)
    px_area = pixel_size**2 if not isinstance(pixel_size, (tuple, list)) else pixel_size[0] * pixel_size[1]
    return pd.Series(counts * px_area, index=ddem_series.index)


def idw_interpolation(array: np.ndarray, max_search_distance: int = 10, extrapolate: bool = False) -> np.ndarray:
    """Distance-weighted gap filling (substitute for rasterio.fill.fillnodata; volume.py:302).

    Iterative 3x3 NaN-aware mean dilation up to max_search_distance rings, optionally trimming
    extrapolated values outside the convex data region (approximated by a validity dilation).
    """
    from scipy import ndimage

    arr = np.asarray(array, dtype=np.float64).copy()
    if arr.ndim != 2:
        arr = arr.squeeze()
    valid0 = np.isfinite(arr)
    filled = arr.copy()
    for _ in range(int(max_search_distance)):
        invalid = ~np.isfinite(filled)
        if not invalid.any():
            break
        vals = np.where(np.isfinite(filled), filled, 0.0)
        cnts = np.isfinite(filled).astype(np.float64)
        ksum = ndimage.uniform_filter(vals, size=3) * 9
        kcnt = ndimage.uniform_filter(cnts, size=3) * 9
        with np.errstate(invalid="ignore", divide="ignore"):
            est = ksum / kcnt
        filled = np.where(invalid & (kcnt > 0), est, filled)
    if not extrapolate:
        # Trim values extrapolated OUTSIDE the data hull; interior holes stay filled
        struct = np.ones((3, 3))
        inside = ndimage.binary_fill_holes(ndimage.binary_dilation(valid0, structure=struct, iterations=1))
        filled[~inside] = np.nan
    return filled.astype(array.dtype if hasattr(array, "dtype") else np.float32)


def hypsometric_interpolation(
    voided_ddem: np.ndarray,
    ref_dem: np.ndarray,
    mask: np.ndarray,
) -> np.ma.MaskedArray:
    """Fill gaps within `mask` using the hypsometric signal of dh vs elevation (volume.py:353)."""
    ddem = np.where(np.asarray(mask, bool), np.asarray(voided_ddem, np.float64), np.nan)
    bins = hypsometric_binning(ddem, np.asarray(ref_dem, np.float64))
    interp_bins = interpolate_hypsometric_bins(bins, count_threshold=1)
    mids = interp_bins.index.mid.values
    signal = np.interp(np.asarray(ref_dem, np.float64), mids, interp_bins["value"].values)
    out = np.where(np.isfinite(ddem), ddem, signal)
    out = np.where(np.asarray(mask, bool) & np.isfinite(np.asarray(ref_dem)), out, np.nan)
    return np.ma.masked_invalid(out)


def local_hypsometric_interpolation(
    voided_ddem: np.ndarray,
    ref_dem: np.ndarray,
    mask: np.ndarray,
    min_coverage: float = 0.2,
) -> np.ma.MaskedArray:
    """Feature-wise hypsometric filling: one signal per connected mask feature (volume.py:407)."""
    from scipy import ndimage

    mask = np.asarray(mask, bool)
    labels, n = ndimage.label(mask)
    out = np.where(mask, np.asarray(voided_ddem, np.float64), np.nan)
    for i in range(1, n + 1):
        feat = labels == i
        dh_feat = np.where(feat, np.asarray(voided_ddem, np.float64), np.nan)
        coverage = np.isfinite(dh_feat[feat]).mean() if feat.sum() else 0.0
        if coverage < min_coverage:
            continue
        with warnings.catch_warnings():
            # Small features can have too few populated bins to interpolate; the bins are
            # then returned as-is (same warn-and-copy behavior as the reference) and only
            # the populated part of the signal fills this feature.
            warnings.simplefilter("ignore", UserWarning)
            filled = hypsometric_interpolation(dh_feat, ref_dem, feat)
        out = np.where(feat, filled.filled(np.nan), out)
    return np.ma.masked_invalid(out)


def get_regional_hypsometric_signal(
    ddem: np.ndarray,
    ref_dem: np.ndarray,
    glacier_index_map: np.ndarray | None = None,
    n_bins: int = 20,
    min_coverage: float = 0.05,
) -> pd.DataFrame:
    """Normalized regional hypsometric signal: dh/dh_max vs normalized elevation (volume.py:568)."""
    ddem = np.asarray(ddem, np.float64)
    ref = np.asarray(ref_dem, np.float64)
    if glacier_index_map is None:
        glacier_index_map = np.ones(ref.shape, dtype=int)
    glacier_index_map = np.asarray(glacier_index_map)

    norm_z_all = []
    norm_dh_all = []
    for gid in np.unique(glacier_index_map):
        if gid == 0:
            continue
        sel = (glacier_index_map == gid) & np.isfinite(ref)
        if sel.sum() < 10:
            continue
        z = ref[sel]
        dh = ddem[sel]
        if np.isfinite(dh).mean() < min_coverage:
            continue
        zmin, zmax = z.min(), z.max()
        if zmax == zmin:
            continue
        norm_z = 1 - (z - zmin) / (zmax - zmin)
        med = np.nanmedian(dh)
        scale = np.nanmax(np.abs(dh)) if np.isfinite(dh).any() else np.nan
        del med
        if not np.isfinite(scale) or scale == 0:
            continue
        norm_z_all.append(norm_z[np.isfinite(dh)])
        norm_dh_all.append(dh[np.isfinite(dh)] / scale)

    if not norm_z_all:
        raise ValueError("No valid glaciers for regional hypsometric signal.")
    norm_z = np.concatenate(norm_z_all)
    norm_dh = np.concatenate(norm_dh_all)

    edges = np.linspace(0, 1, n_bins + 1)
    idx = np.clip(np.digitize(norm_z, edges) - 1, 0, n_bins - 1)
    med = np.full(n_bins, np.nan)
    std = np.full(n_bins, np.nan)
    cnt = np.zeros(n_bins, dtype=int)
    sigma_filt = np.isfinite(norm_dh)
    for i in range(n_bins):
        sel = (idx == i) & sigma_filt
        cnt[i] = sel.sum()
        if cnt[i]:
            med[i] = np.median(norm_dh[sel])
            std[i] = np.std(norm_dh[sel])
    return pd.DataFrame(
        {"w_mean": med, "median": med, "std": std, "sigma-1-lower": med - std, "sigma-1-upper": med + std, "count": cnt},
        index=pd.IntervalIndex.from_breaks(edges),
    )


def norm_regional_hypsometric_interpolation(
    voided_ddem: np.ndarray,
    ref_dem: np.ndarray,
    glacier_index_map: np.ndarray | None = None,
    min_coverage: float = 0.1,
    regional_signal: pd.DataFrame | None = None,
) -> np.ma.MaskedArray:
    """Fill gaps per glacier by scaling the regional normalized signal (volume.py:668)."""
    ddem = np.asarray(voided_ddem, np.float64)
    ref = np.asarray(ref_dem, np.float64)
    if glacier_index_map is None:
        glacier_index_map = np.ones(ref.shape, dtype=int)
    glacier_index_map = np.asarray(glacier_index_map)

    if regional_signal is None:
        regional_signal = get_regional_hypsometric_signal(ddem, ref, glacier_index_map)
    mids = regional_signal.index.mid.values
    signal_vals = regional_signal["median"].values

    out = ddem.copy()
    for gid in np.unique(glacier_index_map):
        if gid == 0:
            continue
        sel = (glacier_index_map == gid) & np.isfinite(ref)
        if sel.sum() < 10:
            continue
        z = ref[sel]
        dh = ddem[sel]
        finite = np.isfinite(dh)
        if finite.mean() < min_coverage or finite.sum() < 5:
            continue
        zmin, zmax = z.min(), z.max()
        if zmax == zmin:
            continue
        norm_z = 1 - (z - zmin) / (zmax - zmin)
        signal_here = np.interp(norm_z, mids, signal_vals)
        # Scale factor from overlapping valid pixels (least squares through origin)
        denom = np.sum(signal_here[finite] ** 2)
        scale = np.sum(dh[finite] * signal_here[finite]) / denom if denom > 0 else 0.0
        filled = signal_here * scale
        vals = out[sel]
        vals[~finite] = filled[~finite]
        out[sel] = vals
    out = np.where(glacier_index_map > 0, out, np.nan)
    return np.ma.masked_invalid(out)
