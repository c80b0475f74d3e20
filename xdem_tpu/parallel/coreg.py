"""Multi-chip coregistration: data-parallel NuthKaab iteration with psum collectives.

The single-chip NuthKaab solver (xdem_tpu/coreg/affine.py) keeps all subsampled points on one
device. At very large subsamples, points are sharded across the mesh: each device evaluates dh
on its point shard against the (replicated or spatially-sharded) raster, accumulates per-aspect-
bin sums/counts locally, and the bins are combined with jax.lax.psum over ICI before the 3x3
cosine solve. The distributed variant uses the bin MEAN (exactly distributable) instead of the
single-chip bin median.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from xdem_tpu.ops.interp import interp_rowcol


def nuth_kaab_step_sharded(
    pts_z: jnp.ndarray,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    raster: jnp.ndarray,
    slope_tan: jnp.ndarray,
    aspect: jnp.ndarray,
    mesh: Mesh,
    n_bins: int = 72,
    axis: str | None = None,
):
    """One data-parallel Nuth & Kaab iteration step over a 1-D point-sharded mesh.

    Returns (east_offset_px, north_offset_px, vshift) combined across all devices with psum.
    Point count must be divisible by the mesh size (pad with NaN otherwise).
    """
    axis = axis or mesh.axis_names[0]
    bin_width = 2 * jnp.pi / n_bins
    centers = (jnp.arange(n_bins) + 0.5) * bin_width
    G = jnp.stack([jnp.cos(centers), jnp.sin(centers), jnp.ones(n_bins)], axis=1)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(None, None), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )
    def step(z, r, c, rast, st, asp):
        dh = z - interp_rowcol(rast, r, c, method="linear")
        ok = jnp.isfinite(dh) & jnp.isfinite(st) & jnp.isfinite(asp)
        # Distributed vertical shift: global mean of dh via psum
        n_ok = jax.lax.psum(jnp.sum(ok), axis)
        vshift = jax.lax.psum(jnp.sum(jnp.where(ok, dh, 0.0)), axis) / jnp.maximum(n_ok, 1)
        y = (dh - vshift) / st
        ok = ok & jnp.isfinite(y)
        bins = jnp.clip((asp / bin_width).astype(jnp.int32), 0, n_bins - 1)
        bins = jnp.where(ok, bins, n_bins)
        local_sums = jnp.bincount(bins, weights=jnp.where(ok, y, 0.0), length=n_bins + 1)[:n_bins]
        local_counts = jnp.bincount(bins, length=n_bins + 1)[:n_bins]
        sums = jax.lax.psum(local_sums, axis)
        counts = jax.lax.psum(local_counts, axis)
        mean_bins = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), 0.0)
        w = (counts > 0).astype(jnp.float32)
        A = (G * w[:, None]).T @ G
        b = (G * w[:, None]).T @ mean_bins
        p = jnp.linalg.solve(A + 1e-12 * jnp.eye(3), b)
        return p[1], p[0], vshift  # east = a sin b, north = a cos b

    return step(pts_z, rows, cols, raster, slope_tan, aspect)
