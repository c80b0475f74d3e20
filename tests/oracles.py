"""Independent numpy/scipy oracle implementations for validating the JAX kernels.

These are deliberately written with a different algorithmic structure (scipy.ndimage convolve /
generic_filter in float64) than the device kernels, playing the role the GDAL/RichDEM golden
rasters play in the reference's test suite.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

# Stencils (same published tables as the package; the *computation path* differs)
ZT = {
    "zt_d": np.array([[0, 1, 0], [0, -2, 0], [0, 1, 0]], float),
    "zt_e": np.array([[0, 0, 0], [1, -2, 1], [0, 0, 0]], float),
    "zt_f": np.array([[-1, 0, 1], [0, 0, 0], [1, 0, -1]], float),
    "zt_g": np.array([[0, 1, 0], [0, 0, 0], [0, -1, 0]], float),
    "zt_h": np.array([[0, 0, 0], [-1, 0, 1], [0, 0, 0]], float),
}
HORN = {
    "h1": np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], float),
    "h2": np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], float),
}
FL = {
    "fl_r": np.array([[2, -1, -2, -1, 2]] * 5, float),
    "fl_t": np.array([[2] * 5, [-1] * 5, [-2] * 5, [-1] * 5, [2] * 5], float),
    "fl_s": np.array(
        [[-4, -2, 0, 2, 4], [-2, -1, 0, 1, 2], [0, 0, 0, 0, 0], [2, 1, 0, -1, -2], [4, 2, 0, -2, -4]], float
    ),
    "fl_p": np.array(
        [[31, -44, 0, 44, -31], [-5, -62, 0, 62, 5], [-17, -68, 0, 68, 17], [-5, -62, 0, 62, 5],
         [31, -44, 0, 44, -31]], float
    ),
    "fl_q": np.array(
        [[-31, 5, 17, 5, -31], [44, 62, 68, 62, 44], [0, 0, 0, 0, 0], [-44, -62, -68, -62, -44],
         [31, -5, -17, -5, 31]], float
    ),
}

DIV = {
    "zt_d": lambda r: r**2,
    "zt_e": lambda r: r**2,
    "zt_f": lambda r: 4 * r**2,
    "zt_g": lambda r: 2 * r,
    "zt_h": lambda r: 2 * r,
    "h1": lambda r: 8 * r,
    "h2": lambda r: 8 * r,
    "fl_r": lambda r: 35 * r**2,
    "fl_t": lambda r: 35 * r**2,
    "fl_s": lambda r: 100 * r**2,
    "fl_p": lambda r: 420 * r,
    "fl_q": lambda r: 420 * r,
}


def _conv(dem: np.ndarray, kern: np.ndarray) -> np.ndarray:
    """NaN-pad true convolution (valid interior), f64."""
    k = kern.shape[0]
    pad = k // 2
    demp = np.pad(dem.astype(np.float64), pad, constant_values=np.nan)
    out = ndimage.convolve(np.nan_to_num(demp), kern, mode="constant", cval=0.0)
    # Poison footprint of NaNs
    bad = ~np.isfinite(demp)
    poisoned = ndimage.binary_dilation(bad, structure=np.ones((k, k), bool))
    out[poisoned] = np.nan
    return out[pad:-pad, pad:-pad]


def derivatives(dem: np.ndarray, res: float, fit: str) -> dict[str, np.ndarray]:
    fit = fit.lower()
    if fit == "horn":
        names = {"z_x": "h2", "z_y": "h1"}
        table = HORN
    elif fit == "zevenbergthorne":
        names = {"z_x": "zt_h", "z_y": "zt_g", "z_xx": "zt_e", "z_yy": "zt_d", "z_xy": "zt_f"}
        table = ZT
    else:
        names = {"z_x": "fl_p", "z_y": "fl_q", "z_xx": "fl_r", "z_yy": "fl_t", "z_xy": "fl_s"}
        table = FL
    return {role: _conv(dem, table[name]) / DIV[name](res) for role, name in names.items()}


def oracle_surface(dem: np.ndarray, res: float, attr: str, fit: str = "Florinsky",
                   curv_method: str = "geometric", degrees: bool = True,
                   azimuth: float = 315.0, altitude: float = 45.0) -> np.ndarray:
    D = derivatives(dem, res, fit)
    z_x, z_y = D["z_x"], D["z_y"]
    g2 = z_x**2 + z_y**2
    with np.errstate(invalid="ignore", divide="ignore"):
        if attr == "slope":
            out = np.arctan(np.sqrt(g2))
            return np.rad2deg(out) if degrees else out
        if attr == "aspect":
            out = (-np.arctan2(-z_x, z_y)) % (2 * np.pi)
            return np.rad2deg(out) if degrees else out
        if attr == "hillshade":
            slope = np.arctan(np.sqrt(g2))
            aspect = (-np.arctan2(-z_x, z_y)) % (2 * np.pi)
            az = np.deg2rad(360 - azimuth)
            alt = np.deg2rad(altitude)
            hs = 1.5 + 254 * (np.sin(alt) * np.cos(slope) + np.cos(alt) * np.sin(slope) * np.sin(az - aspect))
            return np.clip(hs, 0, 255)
        z_xx, z_yy, z_xy = D["z_xx"], D["z_yy"], D["z_xy"]
        flat = g2 == 0
        if attr == "curvature":
            return -2 * (z_xx + z_yy) * 100
        if attr == "profile_curvature":
            num = -(z_xx * z_x**2 + 2 * z_xy * z_x * z_y + z_yy * z_y**2)
            den = g2 * np.sqrt((1 + g2) ** 3) if curv_method == "geometric" else g2
            return np.where(flat, 0, num / den) * 100
        if attr == "tangential_curvature":
            num = -(z_xx * z_y**2 - 2 * z_xy * z_x * z_y + z_yy * z_x**2)
            den = g2 * np.sqrt(1 + g2) if curv_method == "geometric" else g2
            return np.where(flat, 0, num / den) * 100
        if attr == "planform_curvature":
            num = -(z_xx * z_y**2 - 2 * z_xy * z_x * z_y + z_yy * z_x**2)
            return np.where(g2 < 10e-15, 0, num / np.sqrt(g2**3)) * 100
        if attr == "flowline_curvature":
            num = z_x * z_y * (z_xx - z_yy) - z_xy * (z_x**2 - z_y**2)
            if curv_method == "geometric":
                den = np.sqrt(g2**3) * np.sqrt(1 + g2)
                return np.where(g2 < 10e-15, 0, num / den) * 100
            den = np.sqrt(g2**3)
            return np.where(flat, 0, num / den) * 100
        if attr in ("max_curvature", "min_curvature"):
            if curv_method == "geometric":
                denm = 2 * ((1 + g2) ** 3) ** 0.5
                mean = -((1 + z_y**2) * z_xx - 2 * z_xy * z_x * z_y + (1 + z_x**2) * z_yy) / denm
                unsph = np.sqrt(
                    np.maximum(
                        (((1 + z_y**2) * z_xx - 2 * z_y * z_x * z_xy + (1 + z_x**2) * z_yy) / denm) ** 2
                        - (z_xx * z_yy - z_xy**2) / (1 + g2) ** 2,
                        0,
                    )
                )
                val = mean + unsph if attr == "max_curvature" else mean - unsph
            else:
                h = (z_xx + z_yy) / 2
                k = np.sqrt(((z_xx - z_yy) / 2) ** 2 + z_xy**2)
                val = -(h - k) if attr == "max_curvature" else -(h + k)
            return np.where(flat, 0, val) * 100
    raise ValueError(attr)


def oracle_windowed(dem: np.ndarray, attr: str, window: int = 3, res: float = 1.0,
                    tri_method: str = "Riley") -> np.ndarray:
    """generic_filter oracle for windowed indexes (NaN cval)."""

    def tpi(a):
        mid = a[len(a) // 2]
        return mid - (np.sum(a) - mid) / (len(a) - 1)

    def tri_riley(a):
        mid = a[len(a) // 2]
        return np.sqrt(np.sum((a - mid) ** 2))

    def tri_wilson(a):
        mid = a[len(a) // 2]
        return np.sum(np.abs(a - mid)) / (len(a) - 1)

    def rough(a):
        return np.max(a) - np.min(a) if np.all(np.isfinite(a)) else np.nan

    fn = {
        "topographic_position_index": tpi,
        "terrain_ruggedness_index": tri_riley if tri_method == "Riley" else tri_wilson,
        "roughness": rough,
    }[attr]
    return ndimage.generic_filter(dem.astype(np.float64), fn, size=window, mode="constant", cval=np.nan)


def oracle_rugosity(dem: np.ndarray, res: float) -> np.ndarray:
    """Direct per-pixel Jenness rugosity (f64)."""
    h, w = dem.shape
    out = np.full((h, w), np.nan)
    demp = np.pad(dem.astype(np.float64), 1, constant_values=np.nan)
    L = res
    for r in range(h):
        for c in range(w):
            Z = demp[r : r + 3, c : c + 3].ravel()
            dzs = np.zeros(16)
            dls = np.zeros(16)
            cnt = 0
            for j in range(-1, 2):
                for k in range(-1, 2):
                    if j == 0 and k == 0:
                        continue
                    idx = (j + 1) * 3 + (k + 1)
                    dzs[cnt] = Z[4] - Z[idx]
                    dls[cnt] = np.hypot(j, k) * L
                    cnt += 1
            dzs[8] = Z[0] - Z[1]
            dzs[9] = Z[1] - Z[2]
            dzs[10] = Z[6] - Z[7]
            dzs[11] = Z[7] - Z[8]
            dzs[12] = Z[0] - Z[3]
            dzs[13] = Z[3] - Z[6]
            dzs[14] = Z[2] - Z[5]
            dzs[15] = Z[5] - Z[8]
            dls[8:] = L
            hsl = np.sqrt(dzs**2 + dls**2) / 2
            tris = [(3, 0, 12), (0, 1, 8), (1, 2, 9), (2, 4, 14), (4, 7, 15), (7, 6, 11), (6, 5, 10), (5, 3, 13)]
            A = 0.0
            for (ia, ib, ic) in tris:
                s = (hsl[ia] + hsl[ib] + hsl[ic]) / 2
                A += np.sqrt(max(s * (s - hsl[ia]) * (s - hsl[ib]) * (s - hsl[ic]), 0))
            out[r, c] = A / L**2
    return out


def oracle_fractal(dem: np.ndarray, window: int = 13) -> np.ndarray:
    """Direct per-pixel box-counting fractal roughness (f64)."""
    h, w = dem.shape
    hw = window // 2
    demp = np.pad(dem.astype(np.float64), hw, constant_values=np.nan)
    qs = np.array([q for q in range(1, hw + 1) if hw % q == 0])
    log_q = np.log(qs)
    n = len(qs)
    mx = log_q.mean()
    ss_xx = np.sum(log_q**2) - n * mx**2
    out = np.full((h, w), np.nan)
    for r in range(h):
        for c in range(w):
            win = demp[r : r + window, c : c + window]
            V = np.clip(win - win[hw, hw], 0, window)
            ns = []
            for q in qs:
                nq = (window - 1) // q
                tot = 0.0
                for j in range(nq):
                    for k in range(nq):
                        tot += np.max(V[j * q : (j + 1) * q, k * q : (k + 1) * q])
                ns.append(tot / q)
            with np.errstate(divide="ignore", invalid="ignore"):
                y = np.log(ns)
                my = y.mean()
                ss_xy = np.sum(y * log_q) - n * my * mx
                out[r, c] = -(ss_xy / ss_xx)
    return out
