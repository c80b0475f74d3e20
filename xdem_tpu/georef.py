"""Host-side georeferencing: affine grid transforms and a minimal CRS engine.

The reference delegates georeferencing to rasterio/pyproj via geoutils. This rebuild is
standalone: a small affine class (same (a, b, c, d, e, f) convention as rasterio's Affine, i.e.
``x = a*col + b*row + c``, ``y = d*col + e*row + f``), and a CRS class with built-in support for
the projections that matter for DEM work (geographic WGS84, UTM via an exact Karney/Krüger-series
transverse Mercator, polar stereographic, Web Mercator). Projection math is written with
``jnp``-compatible primitives so reprojection can run on device.

Reference behavior mirrored: `geoutils.Raster.transform/crs` semantics used throughout
/root/reference/xdem (e.g. xdem/coreg/base.py, xdem/dem.py).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, Tuple

import numpy as np

__all__ = ["Affine", "CRS", "transform_points"]


@dataclass(frozen=True)
class Affine:
    """2-D affine georeferencing transform: x = a*col + b*row + c ; y = d*col + e*row + f."""

    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    @classmethod
    def from_origin(cls, west: float, north: float, xres: float, yres: float) -> "Affine":
        """North-up transform with upper-left corner (west, north) and pixel size (xres, yres>0).

        >>> t = Affine.from_origin(500000.0, 8000000.0, 20.0, 20.0)
        >>> t.xy(0, 0)  # center of the upper-left pixel
        (500010.0, 7999990.0)
        >>> t.rowcol(500010.0, 7999990.0)
        (0.0, 0.0)
        """
        return cls(xres, 0.0, west, 0.0, -yres, north)

    @classmethod
    def identity(cls) -> "Affine":
        return cls(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)

    def __iter__(self):
        yield from (self.a, self.b, self.c, self.d, self.e, self.f)

    def __mul__(self, other: "Affine") -> "Affine":
        """Compose: (self * other)(col, row) == self(other(col, row))."""
        a1, b1, c1, d1, e1, f1 = self
        a2, b2, c2, d2, e2, f2 = other
        return Affine(
            a1 * a2 + b1 * d2,
            a1 * b2 + b1 * e2,
            a1 * c2 + b1 * f2 + c1,
            d1 * a2 + e1 * d2,
            d1 * b2 + e1 * e2,
            d1 * c2 + e1 * f2 + f1,
        )

    def translation(self, xoff: float, yoff: float) -> "Affine":
        """Return this transform shifted by a world-coordinate offset."""
        return Affine(self.a, self.b, self.c + xoff, self.d, self.e, self.f + yoff)

    @property
    def determinant(self) -> float:
        return self.a * self.e - self.b * self.d

    def invert(self) -> "Affine":
        det = self.determinant
        if det == 0:
            raise ValueError("Affine transform is singular.")
        ia = self.e / det
        ib = -self.b / det
        id_ = -self.d / det
        ie = self.a / det
        ic = -(ia * self.c + ib * self.f)
        if_ = -(id_ * self.c + ie * self.f)
        return Affine(ia, ib, ic, id_, ie, if_)

    def xy(self, rows: Any, cols: Any, offset: str = "center") -> Tuple[Any, Any]:
        """World coordinates of pixel (row, col); offset 'center'|'ul' like rasterio."""
        shift = 0.5 if offset == "center" else 0.0
        cc = cols + shift
        rr = rows + shift
        return self.a * cc + self.b * rr + self.c, self.d * cc + self.e * rr + self.f

    def rowcol(self, xs: Any, ys: Any) -> Tuple[Any, Any]:
        """Fractional (row, col) pixel indices (center-of-pixel convention) of world coords."""
        inv = self.invert()
        col = inv.a * xs + inv.b * ys + inv.c - 0.5
        row = inv.d * xs + inv.e * ys + inv.f - 0.5
        return row, col

    @property
    def xres(self) -> float:
        return math.hypot(self.a, self.d)

    @property
    def yres(self) -> float:
        return math.hypot(self.b, self.e)

    def almost_equals(self, other: "Affine", precision: float = 1e-9) -> bool:
        return all(abs(p - q) <= precision for p, q in zip(self, other))


# --------------------------------------------------------------------------------------
# CRS
# --------------------------------------------------------------------------------------

# WGS84 ellipsoid
_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563

_GEOGRAPHIC_EPSG = {4326, 4269, 4258, 4267, 4979}


class CRS:
    """A coordinate reference system identified by an EPSG code (plus free-form user strings).

    Built-in projections (exact, self-contained):
      - EPSG:4326 geographic WGS84
      - EPSG:326xx / 327xx UTM north/south zones (transverse Mercator, Krüger series)
      - EPSG:3857 Web Mercator
      - EPSG:3413 / 3031 polar stereographic north/south
      - Lambert conformal conic: EPSG:2154 (Lambert-93), 3978 (Canada Atlas),
        27572 (NTF Lambert zone II, incl. Paris meridian + NTF datum shift)
      - Albers equal-area: EPSG:5070 (Conus), 3577 (Australian)
      - UTM on non-WGS84 datums: 269xx (NAD83), 258xx (ETRS89), 283xx (GDA94/MGA),
        230xx (ED50 with 3-parameter datum shift)
    Any other EPSG code is representable (carried through I/O) but not transformable.
    """

    def __init__(self, epsg: int | str | "CRS"):
        if isinstance(epsg, CRS):
            self._epsg = epsg._epsg
            return
        if isinstance(epsg, str):
            m = re.match(r"(?i)epsg:\s*(\d+)", epsg.strip())
            if m:
                self._epsg = int(m.group(1))
            else:
                raise ValueError(f"Unsupported CRS string: {epsg!r} (use 'EPSG:<code>').")
        else:
            self._epsg = int(epsg)

    @classmethod
    def from_epsg(cls, code: int) -> "CRS":
        return cls(code)

    @classmethod
    def from_user_input(cls, value: Any) -> "CRS":
        return cls(value)

    @property
    def epsg(self) -> int:
        return self._epsg

    def to_epsg(self) -> int:
        return self._epsg

    @property
    def is_geographic(self) -> bool:
        return self._epsg in _GEOGRAPHIC_EPSG

    @property
    def is_projected(self) -> bool:
        return not self.is_geographic

    @property
    def utm_zone(self) -> tuple[int, bool] | None:
        """(zone, is_north) when this is a UTM CRS, else None."""
        if 32601 <= self._epsg <= 32660:
            return self._epsg - 32600, True
        if 32701 <= self._epsg <= 32760:
            return self._epsg - 32700, False
        return None

    @property
    def units(self) -> str:
        return "degree" if self.is_geographic else "metre"

    def __eq__(self, other: object) -> bool:
        if isinstance(other, (int, str)):
            try:
                other = CRS(other)
            except ValueError:
                return NotImplemented
        if isinstance(other, CRS):
            return self._epsg == other._epsg
        return NotImplemented

    def __hash__(self) -> int:
        return hash(("CRS", self._epsg))

    def __repr__(self) -> str:
        return f"CRS(EPSG:{self._epsg})"

    def to_wkt(self) -> str:
        # Minimal identification-only WKT (enough for round-tripping our own files).
        kind = "GEOGCS" if self.is_geographic else "PROJCS"
        return f'{kind}["EPSG:{self._epsg}",AUTHORITY["EPSG","{self._epsg}"]]'


# --------------------------------------------------------------------------------------
# Projection math (numpy/jnp-generic: uses only ufunc-style ops)
# --------------------------------------------------------------------------------------


def _tm_constants(a: float = _WGS84_A, f: float = _WGS84_F) -> dict[str, Any]:
    """Precompute Krüger-series constants for the transverse Mercator projection (order 6)."""
    n = f / (2.0 - f)
    n2, n3, n4, n5, n6 = n**2, n**3, n**4, n**5, n**6
    # Rectifying radius
    A = a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    # Forward coefficients alpha (Karney 2011, eq. 35)
    alpha = np.array(
        [
            n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288 + 7891 * n6 / 37800,
            13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630 - 1983433 * n6 / 1935360,
            61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
            49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
            34729 * n5 / 80640 - 3418889 * n6 / 1995840,
            212378941 * n6 / 319334400,
        ]
    )
    # Inverse coefficients beta (Karney 2011, eq. 36)
    beta = np.array(
        [
            n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512 + 96199 * n6 / 604800,
            n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
            17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
            4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
            4583 * n5 / 161280 - 108847 * n6 / 3991680,
            20648693 * n6 / 638668800,
        ]
    )
    e2 = f * (2 - f)
    return {"A": A, "alpha": alpha, "beta": beta, "e": math.sqrt(e2), "a": a, "f": f}


_TM = _tm_constants()


def _tm_forward(lon_deg: Any, lat_deg: Any, lon0_deg: float, k0: float, x0: float, y0: float, xp: Any = np,
                consts: dict | None = None):
    """Transverse Mercator forward (Karney/Krüger series, mm accuracy within ~30 deg of lon0)."""
    _C = consts if consts is not None else _TM
    e, A, alpha = _C["e"], _C["A"], _C["alpha"]
    lat = xp.deg2rad(lat_deg)
    lon = xp.deg2rad(lon_deg - lon0_deg)
    # Conformal latitude
    t = xp.sinh(xp.arctanh(xp.sin(lat)) - e * xp.arctanh(e * xp.sin(lat)))
    xi_p = xp.arctan2(t, xp.cos(lon))
    eta_p = xp.arcsinh(xp.sin(lon) / xp.sqrt(t * t + xp.cos(lon) ** 2))
    xi = xi_p
    eta = eta_p
    for j in range(6):
        xi = xi + alpha[j] * xp.sin(2 * (j + 1) * xi_p) * xp.cosh(2 * (j + 1) * eta_p)
        eta = eta + alpha[j] * xp.cos(2 * (j + 1) * xi_p) * xp.sinh(2 * (j + 1) * eta_p)
    x = x0 + k0 * A * eta
    y = y0 + k0 * A * xi
    return x, y


def _tm_inverse(x: Any, y: Any, lon0_deg: float, k0: float, x0: float, y0: float, xp: Any = np,
                consts: dict | None = None):
    """Transverse Mercator inverse (Krüger series + Newton iterations for latitude)."""
    _C = consts if consts is not None else _TM
    e, A, beta = _C["e"], _C["A"], _C["beta"]
    xi = (y - y0) / (k0 * A)
    eta = (x - x0) / (k0 * A)
    xi_p = xi
    eta_p = eta
    for j in range(6):
        xi_p = xi_p - beta[j] * xp.sin(2 * (j + 1) * xi) * xp.cosh(2 * (j + 1) * eta)
        eta_p = eta_p - beta[j] * xp.cos(2 * (j + 1) * xi) * xp.sinh(2 * (j + 1) * eta)
    # Recompute xi_p/eta_p with un-updated values (series uses original xi, eta): done above.
    s = xp.sinh(eta_p)
    lon = xp.arctan2(s, xp.cos(xi_p))
    tau_p = xp.sin(xi_p) / xp.sqrt(s * s + xp.cos(xi_p) ** 2)
    # Invert conformal latitude tau' -> tau by Newton (3 iterations suffice for double precision)
    tau = tau_p
    for _ in range(4):
        sigma = xp.sinh(e * xp.arctanh(e * tau / xp.sqrt(1 + tau * tau)))
        f_tau = tau * xp.sqrt(1 + sigma * sigma) - sigma * xp.sqrt(1 + tau * tau) - tau_p
        df = (xp.sqrt((1 + sigma * sigma) * (1 + tau * tau)) - sigma * tau) * (1 - e * e) * xp.sqrt(1 + tau * tau) / (
            1 + (1 - e * e) * tau * tau
        )
        tau = tau - f_tau / df
    lat = xp.arctan(tau)
    return xp.rad2deg(lon) + lon0_deg, xp.rad2deg(lat)


def _webmerc_forward(lon: Any, lat: Any, xp: Any = np):
    x = _WGS84_A * xp.deg2rad(lon)
    y = _WGS84_A * xp.log(xp.tan(xp.pi / 4 + xp.deg2rad(lat) / 2))
    return x, y


def _webmerc_inverse(x: Any, y: Any, xp: Any = np):
    lon = xp.rad2deg(x / _WGS84_A)
    lat = xp.rad2deg(2 * xp.arctan(xp.exp(y / _WGS84_A)) - xp.pi / 2)
    return lon, lat


def _psn_params(epsg: int) -> tuple[float, float, float, float, float]:
    """Polar stereographic params: (lat_ts, lon0, x0, y0, sign) for EPSG 3413 / 3031."""
    if epsg == 3413:
        return 70.0, -45.0, 0.0, 0.0, 1.0
    if epsg == 3031:
        return -71.0, 0.0, 0.0, 0.0, -1.0
    raise ValueError(f"Unsupported polar stereographic EPSG:{epsg}")


def _ps_forward(lon: Any, lat: Any, epsg: int, xp: Any = np):
    """Polar stereographic forward (Snyder 1987, eqs. 21-33..21-34)."""
    a = _WGS84_A
    e = _TM["e"]
    lat_ts, lon0, x0, y0, sgn = _psn_params(epsg)
    lat_r = xp.deg2rad(lat * sgn)
    lon_r = xp.deg2rad((lon - lon0) * sgn)
    lat_ts_r = math.radians(abs(lat_ts))
    t = xp.tan(xp.pi / 4 - lat_r / 2) / ((1 - e * xp.sin(lat_r)) / (1 + e * xp.sin(lat_r))) ** (e / 2)
    t_c = math.tan(math.pi / 4 - lat_ts_r / 2) / ((1 - e * math.sin(lat_ts_r)) / (1 + e * math.sin(lat_ts_r))) ** (e / 2)
    m_c = math.cos(lat_ts_r) / math.sqrt(1 - (e * math.sin(lat_ts_r)) ** 2)
    rho = a * m_c * t / t_c
    x = x0 + sgn * rho * xp.sin(lon_r)
    y = y0 - sgn * rho * xp.cos(lon_r)
    return x, y


def _ps_inverse(x: Any, y: Any, epsg: int, xp: Any = np):
    a = _WGS84_A
    e = _TM["e"]
    lat_ts, lon0, x0, y0, sgn = _psn_params(epsg)
    lat_ts_r = math.radians(abs(lat_ts))
    t_c = math.tan(math.pi / 4 - lat_ts_r / 2) / ((1 - e * math.sin(lat_ts_r)) / (1 + e * math.sin(lat_ts_r))) ** (e / 2)
    m_c = math.cos(lat_ts_r) / math.sqrt(1 - (e * math.sin(lat_ts_r)) ** 2)
    xs = (x - x0) * sgn
    ys = (y - y0) * sgn
    rho = xp.sqrt(xs * xs + ys * ys)
    t = rho * t_c / (a * m_c)
    # Iterate latitude (Snyder eq. 7-9)
    chi = xp.pi / 2 - 2 * xp.arctan(t)
    lat_r = chi
    for _ in range(5):
        lat_r = xp.pi / 2 - 2 * xp.arctan(t * ((1 - e * xp.sin(lat_r)) / (1 + e * xp.sin(lat_r))) ** (e / 2))
    lon_r = xp.arctan2(xs, -ys)
    return (xp.rad2deg(lon_r) * sgn + lon0), xp.rad2deg(lat_r) * sgn


# --------------------------------------------------------------------------------------
# Generic conic projections + non-WGS84 datums
# --------------------------------------------------------------------------------------

# Reference ellipsoids: name -> (a, f)
_ELLIPSOIDS = {
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "intl": (6378388.0, 1.0 / 297.0),           # International 1924 (Hayford), e.g. ED50
    "clrk80ign": (6378249.2, 1.0 / 293.4660212936269),  # Clarke 1880 (IGN), e.g. NTF
}

# 3-parameter geocentric datum shifts TO WGS84 (dx, dy, dz in meters)
_DATUM_TO_WGS84 = {
    "ED50": (-87.0, -98.0, -121.0),   # European mean (standard 3-param values)
    "NTF": (-168.0, -60.0, 320.0),
}

# Projection definitions for specific EPSG codes (LCC 1SP/2SP, Albers). UTM families on
# non-WGS84 datums are resolved by _projdef() below. GRS80-based datums (NAD83, ETRS89,
# GDA94) are treated as coincident with WGS84 (their offset is sub-meter, far below DEM
# georeferencing accuracy); ED50/NTF get 3-parameter geocentric shifts.
_PROJ_DEFS: dict[int, dict] = {
    # RGF93 / Lambert-93 (France)
    2154: dict(proj="lcc", lat_1=49.0, lat_2=44.0, lat_0=46.5, lon_0=3.0,
               x_0=700000.0, y_0=6600000.0, ellps="GRS80"),
    # NAD83 / Canada Atlas Lambert
    3978: dict(proj="lcc", lat_1=49.0, lat_2=77.0, lat_0=49.0, lon_0=-95.0,
               x_0=0.0, y_0=0.0, ellps="GRS80"),
    # NAD83 / Conus Albers
    5070: dict(proj="aea", lat_1=29.5, lat_2=45.5, lat_0=23.0, lon_0=-96.0,
               x_0=0.0, y_0=0.0, ellps="GRS80"),
    # GDA94 / Australian Albers
    3577: dict(proj="aea", lat_1=-18.0, lat_2=-36.0, lat_0=0.0, lon_0=132.0,
               x_0=0.0, y_0=0.0, ellps="GRS80"),
    # NTF (Paris) / Lambert zone II (lon_0 is the Paris meridian in Greenwich degrees)
    27572: dict(proj="lcc1sp", lat_0=46.8, k_0=0.99987742, lon_0=2.337229166666667,
                x_0=600000.0, y_0=2200000.0, ellps="clrk80ign", datum="NTF"),
}


def _projdef(epsg: int) -> dict | None:
    """Projection definition for an EPSG code, covering UTM families on common datums."""
    if epsg in _PROJ_DEFS:
        return _PROJ_DEFS[epsg]
    # NAD83 UTM zones 1N-23N
    if 26901 <= epsg <= 26923:
        return dict(proj="utm", zone=epsg - 26900, north=True, ellps="GRS80")
    # ETRS89 UTM zones 28N-38N
    if 25828 <= epsg <= 25838:
        return dict(proj="utm", zone=epsg - 25800, north=True, ellps="GRS80")
    # GDA94 / MGA zones 48-58 (southern hemisphere)
    if 28348 <= epsg <= 28358:
        return dict(proj="utm", zone=epsg - 28300, north=False, ellps="GRS80")
    # ED50 / UTM zones 28N-38N
    if 23028 <= epsg <= 23038:
        return dict(proj="utm", zone=epsg - 23000, north=True, ellps="intl", datum="ED50")
    return None


def _ell_consts(name: str) -> dict:
    a, f = _ELLIPSOIDS[name]
    e2 = f * (2 - f)
    return {"a": a, "f": f, "e": math.sqrt(e2), "e2": e2}


def _m_snyder(lat, e, xp):
    return xp.cos(lat) / xp.sqrt(1 - (e * xp.sin(lat)) ** 2)


def _t_snyder(lat, e, xp):
    return xp.tan(xp.pi / 4 - lat / 2) / ((1 - e * xp.sin(lat)) / (1 + e * xp.sin(lat))) ** (e / 2)


def _lat_from_t(t, e, xp):
    """Invert the isometric-latitude function t(lat) (Snyder eq. 7-9, fixed-point)."""
    lat = xp.pi / 2 - 2 * xp.arctan(t)
    for _ in range(6):
        lat = xp.pi / 2 - 2 * xp.arctan(t * ((1 - e * xp.sin(lat)) / (1 + e * xp.sin(lat))) ** (e / 2))
    return lat


def _lcc_consts(p: dict) -> dict:
    """Lambert conformal conic constants (Snyder 15-1..15-11; 1SP when 'k_0' present)."""
    ell = _ell_consts(p["ellps"])
    e = ell["e"]
    lat0 = math.radians(p["lat_0"])
    t0 = float(_t_snyder(lat0, e, np))
    if "k_0" in p:  # 1SP
        n = math.sin(lat0)
        m0 = float(_m_snyder(lat0, e, np))
        F = p["k_0"] * m0 / (n * t0**n)
    else:
        lat1 = math.radians(p["lat_1"])
        lat2 = math.radians(p["lat_2"])
        m1 = float(_m_snyder(lat1, e, np))
        m2 = float(_m_snyder(lat2, e, np))
        t1 = float(_t_snyder(lat1, e, np))
        t2 = float(_t_snyder(lat2, e, np))
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        F = m1 / (n * t1**n)
    rho0 = ell["a"] * F * t0**n
    return {**ell, "n": n, "F": F, "rho0": rho0}


def _lcc_forward(lon, lat, p: dict, xp: Any = np):
    c = _lcc_consts(p)
    lat_r = xp.deg2rad(lat)
    t = _t_snyder(lat_r, c["e"], xp)
    rho = c["a"] * c["F"] * xp.sign(c["n"]) * xp.abs(t) ** c["n"]
    theta = c["n"] * xp.deg2rad(lon - p["lon_0"])
    x = p["x_0"] + rho * xp.sin(theta)
    y = p["y_0"] + c["rho0"] - rho * xp.cos(theta)
    return x, y


def _lcc_inverse(x, y, p: dict, xp: Any = np):
    c = _lcc_consts(p)
    xs = x - p["x_0"]
    ys = c["rho0"] - (y - p["y_0"])
    sgn = 1.0 if c["n"] >= 0 else -1.0
    rho = sgn * xp.sqrt(xs * xs + ys * ys)
    theta = xp.arctan2(sgn * xs, sgn * ys)
    t = (rho / (c["a"] * c["F"])) ** (1.0 / c["n"])
    lat = _lat_from_t(t, c["e"], xp)
    lon = xp.rad2deg(theta / c["n"]) + p["lon_0"]
    return lon, xp.rad2deg(lat)


def _q_snyder(lat, e, xp):
    s = xp.sin(lat)
    return (1 - e * e) * (s / (1 - (e * s) ** 2) - (1 / (2 * e)) * xp.log((1 - e * s) / (1 + e * s)))


def _aea_consts(p: dict) -> dict:
    """Albers equal-area constants (Snyder 14-1..14-11)."""
    ell = _ell_consts(p["ellps"])
    e = ell["e"]
    lat0 = math.radians(p["lat_0"])
    lat1 = math.radians(p["lat_1"])
    lat2 = math.radians(p["lat_2"])
    m1 = float(_m_snyder(lat1, e, np))
    m2 = float(_m_snyder(lat2, e, np))
    q0 = float(_q_snyder(lat0, e, np))
    q1 = float(_q_snyder(lat1, e, np))
    q2 = float(_q_snyder(lat2, e, np))
    n = (m1**2 - m2**2) / (q2 - q1)
    C = m1**2 + n * q1
    rho0 = ell["a"] * math.sqrt(C - n * q0) / n
    return {**ell, "n": n, "C": C, "rho0": rho0}


def _aea_forward(lon, lat, p: dict, xp: Any = np):
    c = _aea_consts(p)
    q = _q_snyder(xp.deg2rad(lat), c["e"], xp)
    rho = c["a"] * xp.sqrt(c["C"] - c["n"] * q) / c["n"]
    theta = c["n"] * xp.deg2rad(lon - p["lon_0"])
    x = p["x_0"] + rho * xp.sin(theta)
    y = p["y_0"] + c["rho0"] - rho * xp.cos(theta)
    return x, y


def _aea_inverse(x, y, p: dict, xp: Any = np):
    c = _aea_consts(p)
    e, e2 = c["e"], c["e2"]
    xs = x - p["x_0"]
    ys = c["rho0"] - (y - p["y_0"])
    sgn = 1.0 if c["n"] >= 0 else -1.0
    rho = sgn * xp.sqrt(xs * xs + ys * ys)
    theta = xp.arctan2(sgn * xs, sgn * ys)
    q = (c["C"] - (rho * c["n"] / c["a"]) ** 2) / c["n"]
    # Latitude by fixed-point iteration (Snyder eq. 3-16)
    lat = xp.arcsin(xp.clip(q / 2, -1, 1))
    for _ in range(6):
        s = xp.sin(lat)
        lat = lat + ((1 - (e * s) ** 2) ** 2 / (2 * xp.cos(lat))) * (
            q / (1 - e2) - s / (1 - (e * s) ** 2) + (1 / (2 * e)) * xp.log((1 - e * s) / (1 + e * s))
        )
    lon = xp.rad2deg(theta / c["n"]) + p["lon_0"]
    return lon, xp.rad2deg(lat)


def _geodetic_to_ecef(lon, lat, ell: dict, xp: Any = np):
    lam = xp.deg2rad(lon)
    phi = xp.deg2rad(lat)
    N = ell["a"] / xp.sqrt(1 - ell["e2"] * xp.sin(phi) ** 2)
    x = N * xp.cos(phi) * xp.cos(lam)
    y = N * xp.cos(phi) * xp.sin(lam)
    z = N * (1 - ell["e2"]) * xp.sin(phi)
    return x, y, z


def _ecef_to_geodetic(x, y, z, ell: dict, xp: Any = np):
    lam = xp.arctan2(y, x)
    pr = xp.sqrt(x * x + y * y)
    phi = xp.arctan2(z, pr * (1 - ell["e2"]))
    for _ in range(5):
        N = ell["a"] / xp.sqrt(1 - ell["e2"] * xp.sin(phi) ** 2)
        h = pr / xp.cos(phi) - N
        phi = xp.arctan2(z, pr * (1 - ell["e2"] * N / (N + h)))
    return xp.rad2deg(lam), xp.rad2deg(phi)


def _datum_shift(lon, lat, datum: str, ellps: str, to_wgs84: bool, xp: Any = np):
    """3-parameter geocentric shift between a legacy datum and WGS84 (points on ellipsoid)."""
    dx, dy, dz = _DATUM_TO_WGS84[datum]
    if to_wgs84:
        x, y, z = _geodetic_to_ecef(lon, lat, _ell_consts(ellps), xp=xp)
        return _ecef_to_geodetic(x + dx, y + dy, z + dz, _ell_consts("WGS84"), xp=xp)
    x, y, z = _geodetic_to_ecef(lon, lat, _ell_consts("WGS84"), xp=xp)
    return _ecef_to_geodetic(x - dx, y - dy, z - dz, _ell_consts(ellps), xp=xp)


_TM_CONSTS_CACHE: dict[str, dict] = {}


def _tm_consts_for(ellps: str) -> dict:
    if ellps not in _TM_CONSTS_CACHE:
        a, f = _ELLIPSOIDS[ellps]
        _TM_CONSTS_CACHE[ellps] = _tm_constants(a, f)
    return _TM_CONSTS_CACHE[ellps]


def _projdef_inverse(p: dict, x: Any, y: Any, xp: Any = np):
    """Projected -> WGS84 geographic for a registry projection definition."""
    if p["proj"] == "utm":
        lon0 = -183.0 + 6.0 * p["zone"]
        lon, lat = _tm_inverse(x, y, lon0, 0.9996, 500000.0, 0.0 if p["north"] else 10000000.0,
                               xp=xp, consts=_tm_consts_for(p["ellps"]))
    elif p["proj"] in ("lcc", "lcc1sp"):
        lon, lat = _lcc_inverse(x, y, p, xp=xp)
    elif p["proj"] == "aea":
        lon, lat = _aea_inverse(x, y, p, xp=xp)
    else:  # pragma: no cover
        raise NotImplementedError(p["proj"])
    if "datum" in p:
        lon, lat = _datum_shift(lon, lat, p["datum"], p["ellps"], to_wgs84=True, xp=xp)
    return lon, lat


def _projdef_forward(p: dict, lon: Any, lat: Any, xp: Any = np):
    """WGS84 geographic -> projected for a registry projection definition."""
    if "datum" in p:
        lon, lat = _datum_shift(lon, lat, p["datum"], p["ellps"], to_wgs84=False, xp=xp)
    if p["proj"] == "utm":
        lon0 = -183.0 + 6.0 * p["zone"]
        return _tm_forward(lon, lat, lon0, 0.9996, 500000.0, 0.0 if p["north"] else 10000000.0,
                           xp=xp, consts=_tm_consts_for(p["ellps"]))
    if p["proj"] in ("lcc", "lcc1sp"):
        return _lcc_forward(lon, lat, p, xp=xp)
    if p["proj"] == "aea":
        return _aea_forward(lon, lat, p, xp=xp)
    raise NotImplementedError(p["proj"])  # pragma: no cover


def _to_geographic(crs: CRS, x: Any, y: Any, xp: Any = np):
    if crs.is_geographic:
        return x, y
    utm = crs.utm_zone
    if utm is not None:
        zone, north = utm
        lon0 = -183.0 + 6.0 * zone
        return _tm_inverse(x, y, lon0, 0.9996, 500000.0, 0.0 if north else 10000000.0, xp=xp)
    if crs.epsg == 3857:
        return _webmerc_inverse(x, y, xp=xp)
    if crs.epsg in (3413, 3031):
        return _ps_inverse(x, y, crs.epsg, xp=xp)
    p = _projdef(crs.epsg)
    if p is not None:
        return _projdef_inverse(p, x, y, xp=xp)
    raise NotImplementedError(f"No built-in transform for {crs!r}.")


def _from_geographic(crs: CRS, lon: Any, lat: Any, xp: Any = np):
    if crs.is_geographic:
        return lon, lat
    utm = crs.utm_zone
    if utm is not None:
        zone, north = utm
        lon0 = -183.0 + 6.0 * zone
        return _tm_forward(lon, lat, lon0, 0.9996, 500000.0, 0.0 if north else 10000000.0, xp=xp)
    if crs.epsg == 3857:
        return _webmerc_forward(lon, lat, xp=xp)
    if crs.epsg in (3413, 3031):
        return _ps_forward(lon, lat, crs.epsg, xp=xp)
    p = _projdef(crs.epsg)
    if p is not None:
        return _projdef_forward(p, lon, lat, xp=xp)
    raise NotImplementedError(f"No built-in transform for {crs!r}.")


def transform_points(src: CRS | int | str, dst: CRS | int | str, x: Any, y: Any, xp: Any = np) -> Tuple[Any, Any]:
    """Transform coordinate arrays between CRSs via the geographic intermediate.

    `xp` may be numpy or jax.numpy — projection math is ufunc-only, so it traces under jit.
    """
    src = CRS(src)
    dst = CRS(dst)
    if src == dst:
        return x, y
    lon, lat = _to_geographic(src, x, y, xp=xp)
    return _from_geographic(dst, lon, lat, xp=xp)


def suggest_utm_crs(lon: float, lat: float) -> CRS:
    """The UTM CRS containing (lon, lat) — analog of geoutils' get_metric_crs."""
    zone = int((lon + 180) // 6) + 1
    zone = min(max(zone, 1), 60)
    return CRS((32600 if lat >= 0 else 32700) + zone)
