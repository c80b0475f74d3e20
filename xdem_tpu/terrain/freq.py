"""Frequency-domain terrain attributes: fractional-Laplacian texture shading.

Reference parity (/root/reference/xdem/terrain/freq.py): |f|^alpha filter in rfft2 domain,
NaN in-fill with the valid mean, symmetric padding to the next 2*3*5*7-smooth FFT size, DC
zeroed for alpha > 0, NaNs restored. Runs on device via jnp.fft.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def next_fast_fft_size(n: int) -> int:
    """Next FFT-friendly size: power of two below 1024, else smallest 7-smooth number >= n."""
    if n <= 1:
        return 1
    if n <= 1024:
        return int(2 ** int(np.ceil(np.log2(n))))
    candidate = n
    while True:
        temp = candidate
        for f in (2, 3, 5, 7):
            while temp % f == 0:
                temp //= f
        if temp == 1:
            return candidate
        candidate += 1


@partial(jax.jit, static_argnames=("alpha", "fft_rows", "fft_cols"))
def _texture_core(dem: jnp.ndarray, alpha: float, fft_rows: int, fft_cols: int) -> jnp.ndarray:
    rows, cols = dem.shape
    valid = jnp.isfinite(dem)
    fill = jnp.nanmean(jnp.where(valid, dem, jnp.nan))
    filled = jnp.where(valid, dem, fill)

    pad_rows = (fft_rows - rows) // 2
    pad_cols = (fft_cols - cols) // 2
    padded = jnp.pad(
        filled,
        ((pad_rows, fft_rows - rows - pad_rows), (pad_cols, fft_cols - cols - pad_cols)),
        mode="symmetric",
    )

    fy = jnp.fft.fftfreq(fft_rows)[:, None].astype(dem.dtype)
    fx = jnp.fft.rfftfreq(fft_cols)[None, :].astype(dem.dtype)
    freq = jnp.hypot(fx, fy)
    freq = freq.at[0, 0].set(1.0)
    filt = freq**alpha
    if alpha > 0:
        filt = filt.at[0, 0].set(0.0)

    spec = jnp.fft.rfft2(padded)
    out = jnp.fft.irfft2(spec * filt, s=(fft_rows, fft_cols))
    out = out[pad_rows : pad_rows + rows, pad_cols : pad_cols + cols]
    return jnp.where(valid, out, jnp.nan).astype(dem.dtype)


def texture_shading(dem: jnp.ndarray, alpha: float | None = 0.8) -> jnp.ndarray:
    """Texture shading (Brown 2010) via fractional Laplacian |f|^alpha, alpha in [0, 2]."""
    if alpha is None:
        alpha = 0.8
    if not 0 <= alpha <= 2:
        raise ValueError(f"Alpha must be between 0 and 2, got {alpha}")
    dem = jnp.asarray(dem)
    rows, cols = dem.shape
    return _texture_core(dem, float(alpha), next_fast_fft_size(rows), next_fast_fft_size(cols))
