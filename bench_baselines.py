"""Measure the reference implementation's numeric cores at the bench configurations.

SURVEY §6 mandates measured reference numbers per north-star config; the reference cannot
run end-to-end here (geoutils/rasterio/skgstat absent), but its numeric cores load
standalone via tests/reference_loader.py. This script times each loadable core at a
tractable shape, extrapolates the documented cost model to the bench shape, and writes
`baseline_measured.json` — which bench.py reads to populate `vs_baseline` on every row.

Run manually (it costs minutes of host CPU):  python bench_baselines.py
The JSON is committed: bench.py itself only READS it, so the driver's end-of-round bench
run stays fast and the baselines stay reproducible (host + date recorded per entry).

Extrapolation honesty: every entry records `method` (what was run), `measured_seconds` and
`measured_config` (what was actually timed), and `extrapolation` (the scaling law applied).
Rows whose reference path genuinely cannot run offline record `null` seconds with a
`reason` (e.g. the empirical variogram needs skgstat).
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time
from datetime import date

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RES = 20.0


def _timed(fn, *args, n=2, **kw):
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*args, **kw)
        best = min(best, time.perf_counter() - t0)
    return best


def _synth(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    fy = np.fft.fftfreq(n)[:, None]
    fx = np.fft.rfftfreq(n)[None, :]
    f = np.hypot(fx, fy)
    f[0, 0] = 1.0
    amp = f**-2.7
    amp[0, 0] = 0
    z = np.fft.irfft2(amp * np.exp(1j * rng.uniform(0, 2 * np.pi, amp.shape)), s=(n, n))
    return ((z - z.min()) / (z.max() - z.min()) * 1000.0).astype(np.float64)


def main() -> None:
    from tests.reference_loader import load_reference_modules

    mods = load_reference_modules()
    out: dict[str, dict] = {
        "_meta": {
            "host": platform.node(),
            "cpus": os.cpu_count(),
            "date": str(date.today()),
            "note": "reference numeric cores loaded standalone (tests/reference_loader.py); "
                    "scipy is single-threaded for these paths, so 1-core hosts are "
                    "representative",
        }
    }

    # ---- 1. Full terrain suite at 4096^2: 9 Florinsky surface-fit attrs + 4 windowed
    # (w=3) + fractal roughness (w=13). Each stage is O(cells): measure small, scale.
    sf_attrs = ["slope", "aspect", "hillshade", "profile_curvature", "tangential_curvature",
                "planform_curvature", "flowline_curvature", "maximum_curvature",
                "minimum_curvature"]
    n_sf = 512
    dem = _synth(n_sf)
    t_sf = _timed(lambda: mods["surfit"]._get_surface_attributes(dem, RES, sf_attrs,
                                                                 surface_fit="Florinsky"))
    win_attrs = ["topographic_position_index", "terrain_ruggedness_index", "roughness",
                 "rugosity"]
    n_w = 512
    dem_w = _synth(n_w)
    t_win = _timed(lambda: mods["window"]._get_windowed_indexes(
        dem_w, 3, list(win_attrs), resolution=RES, out_dtype=np.float64), n=2)
    n_fr = 256  # the per-pixel 13^3 box count is the slow stage
    dem_fr = _synth(n_fr)
    t_fr = _timed(lambda: mods["window"]._get_windowed_indexes(
        dem_fr, 13, ["fractal_roughness"], resolution=RES, out_dtype=np.float64), n=1)
    n_bench = 4096
    suite_s = (t_sf * (n_bench / n_sf) ** 2 + t_win * (n_bench / n_w) ** 2
               + t_fr * (n_bench / n_fr) ** 2)
    out["terrain_full_suite_4096x4096_Mcells_per_s"] = {
        "ref_seconds": round(suite_s, 2),
        "ref_value": round(n_bench * n_bench / suite_s / 1e6, 3),
        "unit": "Mcells/s",
        "method": "surfit Florinsky x9 + windowed x4 (w=3) + fractal (w=13), scipy engines",
        "measured_config": f"surfit {n_sf}^2 {t_sf:.2f}s; windowed {n_w}^2 {t_win:.2f}s; "
                           f"fractal {n_fr}^2 {t_fr:.2f}s",
        "extrapolation": "O(cells) per stage",
    }
    print(out["terrain_full_suite_4096x4096_Mcells_per_s"])

    out["fractal_roughness_4096x4096_seconds"] = {
        "ref_seconds": round(t_fr * (n_bench / n_fr) ** 2, 2),
        "method": "window._get_windowed_indexes(['fractal_roughness'], window_size=13)",
        "measured_config": f"{n_fr}^2 in {t_fr:.2f}s",
        "extrapolation": "O(cells)",
    }
    print(out["fractal_roughness_4096x4096_seconds"])

    # ---- 2. NuthKaab fit at 985x1332, 5e5 subsample: aux vars + per-iteration step
    # (the reference fit loop IS subsample prep + N iteration steps; reference
    # affine.py:477-536). Measured at the exact bench config; iterations = 6 (what the
    # bench fit converges in).
    import importlib.util

    if "xdem.coreg.affine" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "xdem.coreg.affine", "/root/reference/xdem/coreg/affine.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["xdem.coreg.affine"] = mod
        spec.loader.exec_module(mod)
    raff = sys.modules["xdem.coreg.affine"]

    import scipy.optimize
    from scipy.interpolate import RegularGridInterpolator

    h, w = 985, 1332
    ref_r = _synth(1024)[:h, :w] if max(h, w) <= 1024 else None
    # 985x1332 needs a 2048 synth crop
    ref_r = _synth(2048, seed=1)[:h, :w]
    gy, gx = np.gradient(ref_r)
    tba_r = ref_r - 0.46 * gx + 0.23 * gy + 0.4

    t_aux = _timed(lambda: raff._nuth_kaab_aux_vars(ref_r, tba_r))
    slope_tan, aspect = raff._nuth_kaab_aux_vars(ref_r, tba_r)
    rng = np.random.default_rng(0)
    n_pts = 500_000
    rr = rng.integers(3, h - 3, n_pts)
    cc = rng.integers(3, w - 3, n_pts)
    pts_z = ref_r[rr, cc]
    st_sub = np.asarray(slope_tan)[rr, cc]
    asp_sub = np.asarray(aspect)[rr, cc]
    rgi = RegularGridInterpolator((np.arange(h), np.arange(w)), tba_r, method="linear",
                                  bounds_error=False, fill_value=np.nan)

    def dh_interpolator(east, north):
        return pts_z - rgi(np.column_stack([rr - north / RES, cc + east / RES]))

    params = dict(fit_or_bin="bin_and_fit", fit_optimizer=scipy.optimize.curve_fit,
                  bin_sizes=72, bin_statistic=np.nanmedian)
    t_step = _timed(lambda: raff._nuth_kaab_iteration_step(
        (0.1, 0.1, 0.0), dh_interpolator, st_sub, asp_sub, (RES, RES), params))
    n_iters = 6  # what the bench-config fit converges in (both implementations)
    nk_s = t_aux + n_iters * t_step
    out["nuth_kaab_fit_985x1332_seconds"] = {
        "ref_seconds": round(nk_s, 2),
        "method": "reference _nuth_kaab_aux_vars + N x _nuth_kaab_iteration_step "
                  "(its fit loop's exact per-iteration body) at the bench config",
        "measured_config": f"aux {t_aux:.2f}s + {n_iters} iterations x {t_step:.2f}s, "
                           f"5e5 points on {h}x{w}",
        "extrapolation": "iteration count only (measured at full size)",
    }
    print(out["nuth_kaab_fit_985x1332_seconds"])

    # ---- 3. BlockwiseNuthKaab (15 x 256^2 tiles, 4000 pts each): per-tile cost = aux vars
    # on the tile + ~6 iteration steps at 4000 pts.
    bs = 256
    tile = ref_r[:bs, :bs].copy()
    tile_tba = tba_r[:bs, :bs].copy()
    t_aux_t = _timed(lambda: raff._nuth_kaab_aux_vars(tile, tile_tba))
    st_t, asp_t = raff._nuth_kaab_aux_vars(tile, tile_tba)
    rr_t = rng.integers(3, bs - 3, 4000)
    cc_t = rng.integers(3, bs - 3, 4000)
    pts_t = tile[rr_t, cc_t]
    rgi_t = RegularGridInterpolator((np.arange(bs), np.arange(bs)), tile_tba,
                                    method="linear", bounds_error=False, fill_value=np.nan)
    st_sub_t = np.asarray(st_t)[rr_t, cc_t]
    asp_sub_t = np.asarray(asp_t)[rr_t, cc_t]

    def dh_t(east, north):
        return pts_t - rgi_t(np.column_stack([rr_t - north / RES, cc_t + east / RES]))

    t_step_t = _timed(lambda: raff._nuth_kaab_iteration_step(
        (0.1, 0.1, 0.0), dh_t, st_sub_t, asp_sub_t, (RES, RES), params))
    bw_s = 15 * (t_aux_t + 6 * t_step_t)
    out["blockwise_nuth_kaab_fit_985x1332_seconds"] = {
        "ref_seconds": round(bw_s, 3),
        "method": "15 tiles x (aux vars + 6 iteration steps at 4000 pts), the reference's "
                  "per-tile serial fit loop (blockwise.py:139-154 runs tiles through full "
                  "NuthKaab fits)",
        "measured_config": f"one {bs}^2 tile: aux {t_aux_t:.3f}s, step {t_step_t:.3f}s",
        "extrapolation": "x15 tiles (reference cluster=None runs them serially)",
    }
    print(out["blockwise_nuth_kaab_fit_985x1332_seconds"])

    # ---- 4. ICP (5e4 subsample, 20 iterations): the reference loop is per-iteration
    # scipy KDTree query + pandas Picky dedup + Low LSQ (affine.py:977-1081). Algorithmic
    # twin measured directly (the reference entry needs geoutils rasters to run).
    from scipy.spatial import KDTree
    import pandas as pd

    n_icp = 50_000
    ref_pts = rng.normal(size=(n_icp, 3))
    tba_pts = ref_pts + rng.normal(scale=0.01, size=(n_icp, 3))
    norms = rng.normal(size=(n_icp, 3))
    norms /= np.linalg.norm(norms, axis=1, keepdims=True)

    t_build = _timed(lambda: KDTree(ref_pts))
    tree = KDTree(ref_pts)

    def one_icp_iter():
        dists, ind = tree.query(tba_pts, k=1)
        df = pd.DataFrame({"ind": ind, "dists": dists})
        ind_tba = df.groupby("ind")["dists"].idxmin().values
        ind_ref = ind[ind_tba]
        sr = ref_pts[ind_ref]
        stb = tba_pts[ind_tba]
        nrm = norms[ind_ref]
        B = np.sum((sr - stb) * nrm, axis=1)
        A = np.hstack((np.cross(stb, nrm), nrm))
        np.linalg.lstsq(A, B, rcond=None)

    t_iter = _timed(one_icp_iter)
    icp_iters = 10  # typical convergence (max 20, tol-stop ~8-12 on the bench pair)
    icp_s = t_build + icp_iters * t_iter
    out["icp_dem_vs_1e6pt_epc_seconds"] = {
        "ref_seconds": round(icp_s, 2),
        "method": "algorithmic twin of the reference host loop: KDTree build + N x (query "
                  "+ pandas Picky idxmin + Low LSQ) at 5e4 points",
        "measured_config": f"build {t_build:.2f}s + {icp_iters} x {t_iter:.2f}s",
        "extrapolation": "iteration count only",
    }
    print(out["icp_dem_vs_1e6pt_epc_seconds"])

    # ---- 5. Hypsometric binning at 4096^2: reference volume.hypsometric_binning is a
    # pandas IntervalIndex groupby over all cells. O(cells) at fixed bin count.
    n_h = 1024
    ddem_h = _synth(n_h, seed=6) * 0.01 - 5.0
    ref_h = _synth(n_h, seed=5)
    t_hyp = _timed(lambda: mods["volume"].hypsometric_binning(ddem_h.copy(), ref_h.copy(),
                                                              bins=50.0), n=2)
    out["hypsometric_binning_4096x4096_seconds"] = {
        "ref_seconds": round(t_hyp * (4096 / n_h) ** 2, 2),
        "method": "volume.hypsometric_binning (pandas cut + groupby median)",
        "measured_config": f"{n_h}^2 in {t_hyp:.2f}s, bins=50.0 (same bin width)",
        "extrapolation": "O(cells) at fixed bin count",
    }
    print(out["hypsometric_binning_4096x4096_seconds"])

    # ---- 6. Uncertainty pipeline: the reference's heteroscedasticity stages load
    # (nd_binning / interp_nd_binning, scipy binned_statistic_dd); its empirical variogram
    # REQUIRES skgstat (MetricSpace/Variogram), which is unavailable offline — recorded as
    # a partial LOWER BOUND over the loadable stages.
    rss = mods["spatialstats"]
    n_sub = 500_000
    vals = rng.normal(size=n_sub)
    var1 = rng.uniform(0, 40, n_sub)
    var2 = rng.uniform(0, 10, n_sub)
    t_bin = _timed(lambda: rss.nd_binning(
        vals, [var1, var2], list_var_names=["slope", "maxc"],
        statistics=["count", np.nanmedian, mods["fit"].__dict__.get("nmad", np.nanstd)]),
        n=2)
    # error-map evaluation at 985x1332: interp_nd_binning returns a RegularGridInterpolator
    df_b = rss.nd_binning(vals, [var1, var2], list_var_names=["slope", "maxc"],
                          statistics=["count", np.nanmedian])
    fn_err = rss.interp_nd_binning(df_b, list_var_names=["slope", "maxc"],
                                   statistic="nanmedian", min_count=0)
    gs = np.random.default_rng(1).uniform(0, 40, (985, 1332))
    gm = np.random.default_rng(2).uniform(0, 10, (985, 1332))
    t_eval = _timed(lambda: fn_err((gs, gm)), n=2)
    out["uncertainty_pipeline_985x1332_seconds"] = {
        "ref_seconds": round(t_bin + t_eval, 2),
        "partial": True,
        "method": "LOWER BOUND: reference nd_binning (5e5 pts, 2 vars, 3 stats) + "
                  "interp_nd_binning error-map evaluation at 985x1332 only",
        "reason_partial": "the reference's empirical variogram requires skgstat "
                          "(MetricSpace/Variogram), unavailable offline; terrain-attribute "
                          "and variogram-fit stages also excluded",
        "measured_config": f"nd_binning {t_bin:.2f}s + error eval {t_eval:.2f}s",
        "extrapolation": "none (measured at bench config)",
    }
    print(out["uncertainty_pipeline_985x1332_seconds"])

    out["uncertainty_pipeline_10000x10000_seconds"] = {
        "ref_seconds": round(t_bin + t_eval * (10000 * 10000) / (985 * 1332), 2),
        "partial": True,
        "method": "LOWER BOUND: same stages as the 985x1332 row with the error-map "
                  "evaluation scaled O(cells) to 1e8 px",
        "reason_partial": "see uncertainty_pipeline_985x1332_seconds",
        "extrapolation": "error-map stage O(cells)",
    }
    print(out["uncertainty_pipeline_10000x10000_seconds"])

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "baseline_measured.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote baseline_measured.json")


if __name__ == "__main__":
    main()
