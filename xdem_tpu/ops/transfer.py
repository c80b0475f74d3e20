"""Host->device transfer helpers.

Boolean masks are the one full-raster input that must cross the host boundary on every coreg
fit (rasters stay device-resident): uploading them as packed bits cuts the transfer 8x, which
matters on slow links (the tunneled chip here moves ~6.5 MB/s host->device, so a 1.3 MB
985x1332 inlier mask costs ~0.2 s raw but ~25 ms packed).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n",))
def _unpack_bits(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    # np.packbits packs MSB-first ('big' bitorder)
    bits = (packed[:, None] >> (7 - jnp.arange(8, dtype=jnp.uint8))) & jnp.uint8(1)
    return bits.reshape(-1)[:n].astype(bool)


def device_mask(mask, shape: tuple[int, int] | None = None) -> jnp.ndarray:
    """Return `mask` as a device bool array, uploading host arrays bit-packed (8x smaller).

    Device-resident arrays pass through untouched; `mask=None` with a `shape` gives all-True
    without any transfer (jnp.ones is created on device).
    """
    if mask is None:
        if shape is None:
            raise ValueError("device_mask(None) needs an explicit shape.")
        return jnp.ones(shape, bool)
    if isinstance(mask, np.ndarray):
        m = np.ascontiguousarray(mask, dtype=bool)
        packed = np.packbits(m.ravel())
        return _unpack_bits(jnp.asarray(packed), m.size).reshape(m.shape)
    return jnp.asarray(mask, bool)
