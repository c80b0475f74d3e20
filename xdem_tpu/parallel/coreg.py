"""Multi-chip coregistration: point-sharded iterative fits with MEDIAN-EXACT collectives.

The single-chip solvers (xdem_tpu/coreg/affine.py) keep all subsampled points on one device.
Here the subsample is sharded across a 1-D mesh: each device evaluates dh on its point shard
against the replicated raster, and every statistic the solver consumes — the vertical-shift
median and the per-aspect-bin medians (reference affine.py:358-377, 477-536 uses medians for
both) — is computed EXACTLY across shards with the bit-space radix selection of
parallel/selection.py. Medians are order statistics, not sums, so there is no f32
reassociation error: the sharded fit matches the single-device fit BITWISE (asserted in
tests/test_coreg.py). Only the bin_before_fit=False mode reduces point sums with psum and
carries a documented f32-reassociation tolerance instead.

The raster (and its slope/aspect prepare + the seeded top_k subsample) is replicated on every
device: NuthKaab's cost at scale is the per-iteration work over the point population, which is
what shards. The prepare runs once, the iterations run >=3 times over all points.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from xdem_tpu.ops.interp import interp_rowcol
from xdem_tpu.parallel.selection import masked_median_distributed, signed_median_by_bin


@partial(
    jax.jit,
    static_argnames=("count", "max_iterations", "n_bins", "bin_before_fit", "mesh"),
)
def nuth_kaab_rst_rst_sharded(
    ref: jnp.ndarray,
    tba: jnp.ndarray,
    inlier: jnp.ndarray,
    seed: jnp.ndarray,
    count: int,
    res_x: float,
    res_y: float,
    tolerance: float,
    mesh: Mesh,
    max_iterations: int = 10,
    n_bins: int = 72,
    bin_before_fit: bool = True,
) -> jnp.ndarray:
    """The fused raster-raster Nuth & Kaab program on a 1-D point-sharded mesh.

    Same contract as the single-device `_nuth_kaab_rst_rst_device` (coreg/affine.py) — one
    dispatch returning f32 [shift_x_m, shift_y_m, vshift, stat, iterations, n_valid,
    populated_bins] — and, in the default bin_before_fit mode, the SAME bits: the prepare
    (slope/aspect stencils, seeded top_k subsample) replays identically on every device, and
    the per-iteration medians come from exact distributed order-statistic selection.
    """
    from xdem_tpu.coreg.affine import _nk_slope_aspect_valid, _topk_subsample

    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    h, w = ref.shape
    count_p = -(-count // n_dev) * n_dev  # NaN-pad the subsample to a shard multiple
    shard = count_p // n_dev

    bin_width = 2 * jnp.pi / n_bins
    bin_centers = (jnp.arange(n_bins) + 0.5) * bin_width
    G = jnp.stack([jnp.cos(bin_centers), jnp.sin(bin_centers), jnp.ones(n_bins)], axis=1)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(None, None), P()),
        out_specs=P(None),
    )
    def run(refl, tbal, inl, sd):
        # --- Replicated prepare: op-for-op the single-device fused program's prepare, so the
        # subsample (indices, NaN poisoning, diagnostics) is bit-identical to the mesh=None fit
        slope_tan, aspect, valid = _nk_slope_aspect_valid(refl, tbal, inl)
        n_valid = valid.sum()
        idx, picked_ok = _topk_subsample(jax.random.PRNGKey(sd), valid.ravel(), count)
        rr = (idx // w).astype(jnp.float32)
        cc = (idx % w).astype(jnp.float32)
        pts_z = jnp.where(picked_ok, refl.ravel()[idx], jnp.nan)
        st = jnp.where(picked_ok, slope_tan.ravel()[idx], jnp.nan)
        asp = aspect.ravel()[idx]

        sub_ok = jnp.isfinite(st)
        bin_idx_all = jnp.clip((asp / bin_width).astype(jnp.int32), 0, n_bins - 1)
        hist = jnp.bincount(jnp.where(sub_ok, bin_idx_all, n_bins), length=n_bins + 1)[:n_bins]
        populated = (hist > 10).sum()

        # --- Shard slice: NaN pads are invalid in every statistic, so count_p > count is inert
        pad = count_p - count
        i = jax.lax.axis_index(axis)
        sl = lambda a, fill: jax.lax.dynamic_slice_in_dim(  # noqa: E731
            jnp.pad(a, (0, pad), constant_values=fill), i * shard, shard
        )
        z_s, rr_s, cc_s = sl(pts_z, jnp.nan), sl(rr, 0.0), sl(cc, 0.0)
        st_s, asp_s = sl(st, jnp.nan), sl(asp, 0.0)

        # --- The iterative solver: mirrors _nuth_kaab_solve with distributed exact medians
        def step(carry):
            sx, sy, _vs, _stat, it = carry
            dh = z_s - interp_rowcol(tbal, rr_s - sy, cc_s + sx, method="linear")
            vshift, _n = masked_median_distributed(dh, jnp.isfinite(dh), axis)
            dh = dh - vshift
            y = dh / st_s
            valid_pt = jnp.isfinite(y)

            if bin_before_fit:
                bin_idx = jnp.clip((asp_s / bin_width).astype(jnp.int32), 0, n_bins - 1)
                parked = jnp.where(valid_pt, bin_idx, n_bins)
                counts = jax.lax.psum(
                    jnp.bincount(parked, length=n_bins + 1)[:n_bins], axis
                )
                med = signed_median_by_bin(y, parked, counts, n_bins, axis)
                bin_ok = jnp.isfinite(med)
                w_b = bin_ok.astype(jnp.float32)
                A_mat = (G * w_b[:, None]).T @ G
                b_vec = (G * w_b[:, None]).T @ jnp.where(bin_ok, med, 0.0)
            else:
                # Point-sum mode: psum of per-shard partial sums — f32 reassociation differs
                # from the single-device reduction order (documented ~1e-4 relative bound)
                Gf = jnp.stack([jnp.cos(asp_s), jnp.sin(asp_s), jnp.ones_like(asp_s)], axis=1)
                w_p = valid_pt.astype(jnp.float32)
                A_mat = jax.lax.psum((Gf * w_p[:, None]).T @ Gf, axis)
                b_vec = jax.lax.psum((Gf * w_p[:, None]).T @ jnp.where(valid_pt, y, 0.0), axis)
            p = jnp.linalg.solve(A_mat + 1e-12 * jnp.eye(3), b_vec)

            north_px = p[0]  # a*cos(b)
            east_px = p[1]  # a*sin(b)
            stat = jnp.hypot(east_px, north_px)
            return sx + east_px, sy + north_px, vshift, stat, it + 1

        def cond(carry):
            _sx, _sy, _vs, stat, it = carry
            return (it < max_iterations) & ~((it >= 3) & (stat < tolerance))

        init = (jnp.asarray(0.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
                jnp.asarray(0.0, jnp.float32), jnp.asarray(jnp.inf, jnp.float32),
                jnp.asarray(0))
        sx, sy, vshift, stat, it = jax.lax.while_loop(cond, step, init)
        return jnp.stack([
            sx * res_x, sy * res_y, vshift, stat,
            it.astype(jnp.float32), n_valid.astype(jnp.float32), populated.astype(jnp.float32),
        ])

    return run(ref, tba, inlier, seed)


@partial(jax.jit, static_argnames=("mesh",))
def masked_median_diff_sharded(
    ref: jnp.ndarray, tba: jnp.ndarray, inlier: jnp.ndarray, mesh: Mesh
):
    """The full-raster VerticalShift fit on a row-sharded mesh: exact distributed median of
    (ref - tba) over inlier+finite pixels, plus the valid count. Matches the single-device
    `_masked_median_diff` bitwise (same per-pixel dh, same two-order-statistic formula)."""
    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    h, w = ref.shape
    pad = -(-h // n_dev) * n_dev - h  # NaN-pad rows to a shard multiple (median-inert)
    ref_p = jnp.pad(ref, ((0, pad), (0, 0)), constant_values=jnp.nan)
    tba_p = jnp.pad(tba, ((0, pad), (0, 0)), constant_values=jnp.nan)
    inl_p = jnp.pad(inlier, ((0, pad), (0, 0)), constant_values=False)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None)),
        out_specs=(P(), P()),
    )
    def run(r, t, m):
        dh = jnp.where(m, r - t, jnp.nan).ravel()
        return masked_median_distributed(dh, jnp.isfinite(dh), axis)

    return run(ref_p, tba_p, inl_p)
