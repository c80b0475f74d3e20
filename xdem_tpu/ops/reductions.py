"""NaN-aware robust reductions on device.

NMAD matches the reference's definition (1.4826 * median(|x - median(x)|)), which the reference
forwards to geoutils.stats.nmad (/root/reference/xdem/spatialstats.py:73-88).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NMAD_FACTOR = 1.4826


def nanmean(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    return jnp.nanmean(x, axis=axis)


def nanstd(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    return jnp.nanstd(x, axis=axis)


def nanmedian(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    return jnp.nanmedian(x, axis=axis)


@jax.jit
def nmad(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized median absolute deviation: 1.4826 * median(|x - median(x)|), NaN-aware.

    Robust to the outlier that would wreck a standard deviation:

    >>> import numpy as np
    >>> round(float(nmad(np.array([1.0, 2.0, 3.0, 4.0, 100.0]))), 4)
    1.4826
    """
    med = jnp.nanmedian(x)
    return _NMAD_FACTOR * jnp.nanmedian(jnp.abs(x - med))


def masked_median(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Median over entries where `valid`, as a jit-safe fixed-shape reduction."""
    return jnp.nanmedian(jnp.where(valid, x, jnp.nan))


def masked_nmad(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    xm = jnp.where(valid, x, jnp.nan)
    med = jnp.nanmedian(xm)
    return _NMAD_FACTOR * jnp.nanmedian(jnp.abs(xm - med))
