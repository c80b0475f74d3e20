"""Built-in coarse geoid undulation model (EGM96 / EGM2008 long-wavelength field).

PROJ and its geoid grids are unavailable in this environment, but geoid-referenced products
(SRTM, AW3D30, COPDEM...) should still work out of the box (reference vcrs.py:48-200 downloads
PROJ grids for this). We bake the *long-wavelength* anomalous potential instead: the published
spherical-harmonic coefficients of EGM96 through degree/order 4 plus the degree-5/6 zonals,
relative to the WGS84 normal field, evaluated with Bruns' formula in the spherical
approximation:

    N(phi, lam) = N0 + a * sum_{n=2} sum_{m=0..n} Pbar_nm(sin phi) *
                  (dC_nm cos(m lam) + dS_nm sin(m lam))

This reproduces the global geoid's broad structure (Indian Ocean low, West Pacific high,
North Atlantic high) deterministically with zero data dependencies. Truncation error vs the
full models is substantial — RMS ~10 m, locally up to ~40 m — so a warning is logged when the
builtin is used; register a precise grid with `vcrs.register_geoid_grid` for survey-grade work.
At this truncation EGM96 and EGM2008 are indistinguishable (<1 m), so both names share the
field.
"""

from __future__ import annotations

import numpy as np

# WGS84 semi-major axis
_A = 6378137.0

# EGM96 zero-degree term (offset between the EGM96 ideal geoid and the WGS84 ellipsoid)
_N0 = -0.53

# Fully-normalized EGM96 coefficients (C_nm, S_nm), degrees 2-4 complete + zonals 5, 6.
_CNM = {
    (2, 0): -484.165371736e-6,
    (2, 1): -0.000186987636e-6,
    (2, 2): 2.43914352398e-6,
    (3, 0): 0.957254173792e-6,
    (3, 1): 2.02998882184e-6,
    (3, 2): 0.904627768605e-6,
    (3, 3): 0.721072657057e-6,
    (4, 0): 0.539873863789e-6,
    (4, 1): -0.536321616971e-6,
    (4, 2): 0.350694105785e-6,
    (4, 3): 0.990771803829e-6,
    (4, 4): -0.188560802735e-6,
    (5, 0): 0.068532347563e-6,
    (6, 0): -0.149957994714e-6,
}
_SNM = {
    (2, 1): 0.001195280120e-6,
    (2, 2): -1.40016683654e-6,
    (3, 1): 0.248513158716e-6,
    (3, 2): -0.619025944205e-6,
    (3, 3): 1.41435626958e-6,
    (4, 1): -0.473440265853e-6,
    (4, 2): 0.662671572540e-6,
    (4, 3): -0.200928369177e-6,
    (4, 4): 0.308853169333e-6,
}

# WGS84 normal-field even zonals (fully normalized): the anomalous potential uses
# dC_n0 = C_n0(EGM) - C_n0(ellipsoid) for n = 2, 4, 6.
_CNM_ELLIPSOID = {
    (2, 0): -484.166774985e-6,
    (4, 0): 0.790303733511e-6,
    (6, 0): -1.687251e-9,
}

_N_MAX = 6


def _legendre_norm(nmax: int, t: np.ndarray) -> dict[tuple[int, int], np.ndarray]:
    """Fully-normalized associated Legendre functions Pbar_nm(t) by standard recursion."""
    u = np.sqrt(np.maximum(1.0 - t * t, 0.0))
    P: dict[tuple[int, int], np.ndarray] = {}
    P[(0, 0)] = np.ones_like(t)
    P[(1, 0)] = np.sqrt(3.0) * t
    P[(1, 1)] = np.sqrt(3.0) * u
    for n in range(2, nmax + 1):
        # Sectorial
        P[(n, n)] = u * np.sqrt((2.0 * n + 1.0) / (2.0 * n)) * P[(n - 1, n - 1)]
        for m in range(0, n):
            a = np.sqrt((2.0 * n - 1.0) * (2.0 * n + 1.0) / ((n - m) * (n + m)))
            b = np.sqrt(
                (2.0 * n + 1.0) * (n + m - 1.0) * (n - m - 1.0)
                / ((n - m) * (n + m) * (2.0 * n - 3.0))
            )
            P[(n, m)] = a * t * P[(n - 1, m)] - b * P.get((n - 2, m), np.zeros_like(t))
    return P


def undulation(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Long-wavelength geoid undulation N (m above the WGS84 ellipsoid) at lon/lat degrees.

    >>> import numpy as np
    >>> float(undulation(78.0, 5.0)) < -40      # Indian Ocean low (true EGM96: ~ -105 m)
    True
    >>> float(undulation(142.0, -5.0)) > 30     # West Pacific high (true: ~ +80 m)
    True
    >>> round(float(undulation(-90.2, 38.6)))   # St Louis (true: ~ -33 m)
    -35
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam = np.deg2rad(lon)
    t = np.sin(np.deg2rad(lat))
    P = _legendre_norm(_N_MAX, t)
    N = np.full(np.broadcast(lon, lat).shape, _N0, dtype=np.float64)
    for (n, m), c in _CNM.items():
        dc = c - _CNM_ELLIPSOID.get((n, m), 0.0)
        s = _SNM.get((n, m), 0.0)
        N = N + _A * P[(n, m)] * (dc * np.cos(m * lam) + s * np.sin(m * lam))
    return N


def builtin_geoid_grid(step: float = 1.0) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A deterministic global undulation grid (lons, lats, N) at `step` degrees."""
    lons = np.arange(-180.0, 180.0 + step / 2, step)
    lats = np.arange(-90.0, 90.0 + step / 2, step)
    grid = undulation(lons[None, :], lats[:, None])
    return lons, lats, grid
