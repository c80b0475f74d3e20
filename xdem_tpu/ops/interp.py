"""Gather-based grid interpolation on device.

This single primitive backs coregistration (shifted-dh evaluation), `apply_matrix`, and
same/cross-CRS reprojection — the roles played in the reference by
`geoutils.interface.interpolate._interp_points` and `scipy.interpolate.RegularGridInterpolator`
(see /root/reference/xdem/coreg/affine.py:150-293 and /root/reference/xdem/coreg/base.py:1615).

Semantics:
  * NaN is the nodata value. 'linear'/'cubic' return NaN when any participating neighbor is NaN
    (matching RegularGridInterpolator on NaN data).
  * Coordinates outside the valid interpolation domain return NaN.
  * Row/col coordinates use the center-of-pixel convention (coord 0.0 = center of pixel 0).
"""

from __future__ import annotations

from functools import partial
from typing import Literal, Tuple

import jax
import jax.numpy as jnp

Method = Literal["nearest", "linear", "cubic"]


def grid_coords(shape: Tuple[int, int], transform) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World (x, y) coordinates of every pixel center of a (H, W) grid."""
    h, w = shape
    rows = jnp.arange(h, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    cols = jnp.arange(w, dtype=rows.dtype)
    cgrid, rgrid = jnp.meshgrid(cols, rows)
    a, b, c, d, e, f = tuple(transform)
    x = a * (cgrid + 0.5) + b * (rgrid + 0.5) + c
    y = d * (cgrid + 0.5) + e * (rgrid + 0.5) + f
    return x, y


def _gather(data: jnp.ndarray, r: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Gather data[r, c] with clipped indices (validity handled by the caller)."""
    h, w = data.shape
    rc = jnp.clip(r, 0, h - 1)
    cc = jnp.clip(c, 0, w - 1)
    return data[rc, cc]


@partial(jax.jit, static_argnames=("method",))
def interp_rowcol(
    data: jnp.ndarray,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    method: Method = "linear",
) -> jnp.ndarray:
    """Interpolate `data` (H, W) at fractional (row, col) positions.

    :param data: 2-D array with NaN as nodata.
    :param rows: Fractional row coordinates (any shape).
    :param cols: Fractional col coordinates (same shape as rows).
    :param method: 'nearest', 'linear' (bilinear), or 'cubic' (Keys bicubic convolution, a=-0.5).
    """
    h, w = data.shape
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)

    if method == "nearest":
        r = jnp.round(rows).astype(jnp.int32)
        c = jnp.round(cols).astype(jnp.int32)
        inside = (rows >= -0.5) & (rows <= h - 0.5) & (cols >= -0.5) & (cols <= w - 0.5)
        vals = _gather(data, r, c)
        return jnp.where(inside, vals, jnp.nan)

    if method == "linear":
        r0 = jnp.floor(rows).astype(jnp.int32)
        c0 = jnp.floor(cols).astype(jnp.int32)
        fr = rows - r0
        fc = cols - c0
        v00 = _gather(data, r0, c0)
        v01 = _gather(data, r0, c0 + 1)
        v10 = _gather(data, r0 + 1, c0)
        v11 = _gather(data, r0 + 1, c0 + 1)
        top = v00 * (1 - fc) + v01 * fc
        bot = v10 * (1 - fc) + v11 * fc
        vals = top * (1 - fr) + bot * fr
        inside = (rows >= 0) & (rows <= h - 1) & (cols >= 0) & (cols <= w - 1)
        return jnp.where(inside, vals, jnp.nan)

    if method == "cubic":
        # Keys cubic convolution kernel with a = -0.5 over a 4x4 neighborhood.
        def kern(t: jnp.ndarray) -> jnp.ndarray:
            at = jnp.abs(t)
            a = -0.5
            w1 = (a + 2) * at**3 - (a + 3) * at**2 + 1
            w2 = a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a
            return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))

        r0 = jnp.floor(rows).astype(jnp.int32)
        c0 = jnp.floor(cols).astype(jnp.int32)
        fr = rows - r0
        fc = cols - c0
        vals = jnp.zeros_like(rows, dtype=data.dtype)
        for dr in range(-1, 3):
            wr = kern(fr - dr)
            row_acc = jnp.zeros_like(rows, dtype=data.dtype)
            for dc in range(-1, 3):
                wc = kern(fc - dc)
                row_acc = row_acc + wc * _gather(data, r0 + dr, c0 + dc)
            vals = vals + wr * row_acc
        inside = (rows >= 1) & (rows <= h - 2) & (cols >= 1) & (cols <= w - 2)
        return jnp.where(inside, vals, jnp.nan)

    raise ValueError(f"Unknown interpolation method: {method}")


def interp_points(
    data: jnp.ndarray,
    transform,
    x: jnp.ndarray,
    y: jnp.ndarray,
    method: Method = "linear",
) -> jnp.ndarray:
    """Interpolate a georeferenced grid at world coordinates (x, y)."""
    a, b, c, d, e, f = (float(v) for v in tuple(transform))
    det = a * e - b * d
    ia, ib, ic = e / det, -b / det, -(e * c - b * f) / det
    id_, ie, if_ = -d / det, a / det, -(-d * c + a * f) / det
    cols = ia * x + ib * y + ic - 0.5
    rows = id_ * x + ie * y + if_ - 0.5
    return interp_rowcol(data, rows, cols, method=method)
