"""Pallas TPU kernel for the fused surface-fit terrain attributes.

One HBM pass: the NaN-padded DEM stays in HBM/ANY; each grid program DMAs its (TILE+2*halo)^2
block into VMEM, evaluates all requested derivative stencils as shifted-slice multiply-adds in
VMEM, applies the shared attribute algebra (surfit._attrs_from_derivs) in registers, and writes
the attribute tile. Replaces the reference's Numba prange pixel loop (surfit.py:977-1088) as
the "native engine"; the XLA engine (surfit.surface_attributes) remains the portable default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xdem_tpu.terrain.surfit import (
    ALL_STENCILS,
    _CURVATURE_ATTRS,
    _FIT_DERIVS,
    _attrs_from_derivs,
    _needed_derivs,
)

from xdem_tpu.terrain.surfit import DIV_CONST as _DIV_CONST
from xdem_tpu.terrain.surfit import DIV_POW as _DIV_POW


def _atan_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Branchless f32 arctan (Cephes atanf-style range reduction + minimax cubic-in-z poly).

    Pallas TPU has no atan lowering; this reaches ~1 ulp f32 accuracy.
    """
    sign = jnp.sign(x)
    t = jnp.abs(x)
    # Range reduction: tan(pi/8) and tan(3*pi/8) breakpoints
    hi = t > 2.414213562373095
    mid = (t > 0.4142135623730950) & ~hi
    safe_t = jnp.where(t == 0, 1.0, t)
    x_hi = -1.0 / safe_t
    x_mid = (t - 1.0) / (t + 1.0)
    xr = jnp.where(hi, x_hi, jnp.where(mid, x_mid, t))
    y0 = jnp.where(hi, jnp.float32(np.pi / 2), jnp.where(mid, jnp.float32(np.pi / 4), 0.0))
    z = xr * xr
    poly = (((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z - 3.33329491539e-1) * z
    y = y0 + xr + xr * poly
    y = jnp.where(t == 0, 0.0, y)
    return sign * y


def _atan2_poly(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Branchless f32 arctan2 built on _atan_poly (quadrant corrections, zero handling)."""
    safe_x = jnp.where(x == 0, 1.0, x)
    base = _atan_poly(y / safe_x)
    pi = jnp.float32(np.pi)
    out = jnp.where(
        x > 0,
        base,
        jnp.where(y >= 0, base + pi, base - pi),
    )
    # x == 0 cases
    out = jnp.where(x == 0, jnp.where(y > 0, pi / 2, jnp.where(y < 0, -pi / 2, 0.0)), out)
    # Propagate NaN inputs
    out = jnp.where(jnp.isnan(x) | jnp.isnan(y), jnp.nan, out)
    return out


# Mosaic DMA slices must be tiling-aligned: rows to 8 (sublanes), cols to 128 (lanes)
_PADR = 8
_PADC = 128


def _make_kernel(attrs, roles, names, ksize, geometric, hs_alt, hs_az, hs_zf, tr, tc, halo):
    """Build the pallas kernel body for a fixed attribute/method configuration."""
    kernels = {name: ALL_STENCILS[name] for name in names}
    k = ksize
    pad = k // 2

    def kernel(res_ref, dem_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        gh = pl.num_programs(0)
        gw = pl.num_programs(1)
        # Double-buffered aligned over-fetch from HBM: TPU grids execute sequentially, so
        # while tile (i, j) computes, the DMA for the next grid step fills the other VMEM
        # slot — the copy latency hides behind the stencil algebra. The input is pre-padded
        # by (_PADR, _PADC) on the top/left so fetches stay tiling-aligned with the halo
        # inside the over-fetch.
        step = i * gw + j
        slot = jax.lax.rem(step, 2)

        def dma_for(s, r, c):
            return pltpu.make_async_copy(
                dem_hbm.at[pl.ds(r * tr, tr + 2 * _PADR), pl.ds(c * tc, tc + 2 * _PADC)],
                scratch.at[s],
                sem.at[s],
            )

        @pl.when(step == 0)
        def _():
            dma_for(slot, i, j).start()

        nstep = step + 1
        ni = jnp.minimum(nstep // gw, gh - 1)
        nj = nstep % gw

        @pl.when(nstep < gh * gw)
        def _():
            dma_for(1 - slot, ni, nj).start()

        dma_for(slot, i, j).wait()
        block = scratch[slot]
        finite = jnp.isfinite(block)
        z = jnp.where(finite, block, 0.0)
        inv_res = 1.0 / res_ref[0]

        # Derivative stencils as shifted-slice multiply-adds; slices shared across stencils.
        accs = {role: jnp.zeros((tr, tc), dtype=block.dtype) for role in roles}
        valid = jnp.ones((tr, tc), dtype=jnp.bool_)
        off_r = _PADR - pad
        off_c = _PADC - pad
        for u in range(k):
            for v in range(k):
                sl = z[off_r + u : off_r + u + tr, off_c + v : off_c + v + tc]
                fl = finite[off_r + u : off_r + u + tr, off_c + v : off_c + v + tc]
                valid = valid & fl
                for role, name in zip(roles, names):
                    w = float(kernels[name][k - 1 - u, k - 1 - v])
                    if w:
                        accs[role] = accs[role] + w * sl

        # Apply dividers (constant part static, resolution part dynamic)
        D = {}
        for role, name in zip(roles, names):
            D[role] = accs[role] * (inv_res ** _DIV_POW[role]) * (1.0 / _DIV_CONST[name])

        vals = _attrs_from_derivs(
            D, attrs, geometric,
            hillshade_altitude=hs_alt, hillshade_azimuth=hs_az, hillshade_z_factor=hs_zf,
            arctan=_atan_poly, arctan2=_atan2_poly,
        )
        nan = jnp.asarray(jnp.nan, dtype=block.dtype)
        for a_idx, val in enumerate(vals):
            out_ref[a_idx, :, :] = jnp.where(valid, val, nan)

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "attrs", "surface_fit", "curv_method",
        "hillshade_altitude", "hillshade_azimuth", "hillshade_z_factor", "tile", "tile_cols",
    ),
)
def surface_attributes_pallas(
    dem: jnp.ndarray,
    resolution: jnp.ndarray | float,
    attrs: tuple[str, ...],
    surface_fit: str = "Florinsky",
    curv_method: str = "geometric",
    hillshade_altitude: float = 45.0,
    hillshade_azimuth: float = 315.0,
    hillshade_z_factor: float = 1.0,
    tile: int | None = None,
    tile_cols: int | None = None,
) -> jnp.ndarray:
    """Fused Pallas surface-fit attributes; identical semantics to surfit.surface_attributes.

    Tiles are (tile, tile_cols or tile); wider lanes cut the aligned over-fetch ratio.
    ``tile=None`` auto-selects 128x128 for every attribute set: since the remote compile
    helper became the chipless TpuAotCompiler with a 16 MB scoped-VMEM cap (round 4), the
    previous non-curvature 256x512 tiling fails to compile AT ALL (HTTP 500 helper crash) —
    re-measured round 5: S/A/H at 128x128 and 128x256 compile and run (41-42 ms at 1024^2,
    dispatch-floor-bound), 128x512 and any 256-row tile fail; the 9-attribute curvature
    stack at 128x128 runs in 27 ms. Explicit tile=/tile_cols= still force larger tiles for
    full-VMEM hardware."""
    fit = surface_fit.lower()
    geometric = curv_method.lower() == "geometric"
    if fit == "horn" and any(a in _CURVATURE_ATTRS for a in attrs):
        raise ValueError("'Horn' surface fit cannot compute curvatures; use ZevenbergThorne or Florinsky.")

    dem = jnp.asarray(dem, dtype=jnp.float32)
    h, w = dem.shape
    roles = _needed_derivs(attrs, fit)
    names = tuple(_FIT_DERIVS[fit][r] for r in roles)
    ksize = ALL_STENCILS[names[0]].shape[0] if names else 3
    halo = ksize // 2

    valid_in = jnp.isfinite(dem)
    center = jnp.where(jnp.any(valid_in), jnp.nanmean(jnp.where(valid_in, dem, jnp.nan)), 0.0)
    dem_c = jnp.where(valid_in, dem - center, jnp.nan)

    # Pad: aligned over-fetch margins of NaN plus rounding the extent up to tile multiples.
    # The 16 MB scoped-VMEM compile helper (round 4 regression) bounds the auto tile at
    # 128x128 for EVERY attribute set — larger tiles crash the helper outright (see
    # docstring). Explicit tile=/tile_cols= override for full-VMEM hardware.
    tr = int(tile) if tile is not None else 128
    tc = int(tile_cols) if tile_cols is not None else (tr if tile is not None else 128)
    gh = -(-h // tr)
    gw = -(-w // tc)
    ph = gh * tr - h
    pw = gw * tc - w
    demp = jnp.pad(
        dem_c, ((_PADR, _PADR + ph), (_PADC, _PADC + pw)), constant_values=jnp.nan
    )

    res = jnp.asarray([resolution], dtype=jnp.float32)

    kernel = _make_kernel(
        attrs, tuple(roles), names, ksize, geometric,
        float(hillshade_altitude), float(hillshade_azimuth), float(hillshade_z_factor),
        tr, tc, halo,
    )

    out = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (len(attrs), tr, tc),
            lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((len(attrs), gh * tr, gw * tc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2 * _PADR, tc + 2 * _PADC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(res, demp)
    return out[:, :h, :w]


# --------------------------------------------------------------------------------------
# Fractal roughness: single-HBM-pass box counting
# --------------------------------------------------------------------------------------
# The XLA path (window.fractal_roughness) needs ~200 full-array passes (block maxima per
# box scale + one shifted add per block): ~14 GB of HBM traffic at 4096^2. Here each tile is
# DMA'd into VMEM once and all scales' box maxima, clipped counts, and the log-log
# regression run in-register — traffic drops to read+write of the raster.


def _make_fractal_kernel(w: int, tr: int, tc: int):
    hw = w // 2
    qs = [q for q in range(1, hw + 1) if hw % q == 0]
    log_q = [float(np.log(q)) for q in qs]
    n = len(qs)
    mx = float(np.mean(log_q))
    ss_xx = float(np.sum([lq * lq for lq in log_q]) - n * mx * mx)

    def kernel(dem_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        gh = pl.num_programs(0)
        gw = pl.num_programs(1)
        step = i * gw + j
        slot = jax.lax.rem(step, 2)

        def dma_for(s, r, c):
            return pltpu.make_async_copy(
                dem_hbm.at[pl.ds(r * tr, tr + 2 * _PADR), pl.ds(c * tc, tc + 2 * _PADC)],
                scratch.at[s],
                sem.at[s],
            )

        @pl.when(step == 0)
        def _():
            dma_for(slot, i, j).start()

        nstep = step + 1
        ni = jnp.minimum(nstep // gw, gh - 1)
        nj = nstep % gw

        @pl.when(nstep < gh * gw)
        def _():
            dma_for(1 - slot, ni, nj).start()

        dma_for(slot, i, j).wait()

        off_r = _PADR - hw
        off_c = _PADC - hw

        def sl(d1, d2):
            """(tr, tc) read of the current block at a static window offset."""
            return scratch[slot, off_r + d1: off_r + d1 + tr, off_c + d2: off_c + d2 + tc]

        center = scratch[slot, _PADR: _PADR + tr, _PADC: _PADC + tc]
        # NaN anywhere in a window propagates through maximum/clip/log -> NaN output,
        # matching the XLA path's edge/nodata erosion. Offsets must be static (Mosaic only
        # allows aligned dynamic slice starts), so the block sweep is fully unrolled —
        # which bounds the tile size: Mosaic's scoped-VMEM stack holds the unrolled
        # temporaries (~200 tile-sized values), fitting at tile=128 but not 256.
        sum_y = jnp.zeros((tr, tc), dtype=jnp.float32)
        sum_xy = jnp.zeros((tr, tc), dtype=jnp.float32)
        # Box maxima reuse: a q-box is the max of (q/p)^2 p-boxes for any divisor p of q
        # already computed (max is associative, so this is bit-exact). For w=13
        # (qs=[1,2,3,6]) the q=6 boxes drop from 35 window reads each to 3 in-register
        # maxima of the q=3 boxes — the window-offset reads are the kernel's dominant cost.
        def _best_src(q2: int) -> int | None:
            return max((p for p in qs if 1 < p < q2 and q2 % p == 0), default=None)

        box_cache: dict[int, dict[tuple[int, int], Any]] = {}
        for q, lq in zip(qs, log_q):
            nq = (w - 1) // q
            src = max((p for p in box_cache if p > 1 and q % p == 0), default=None)
            boxes: dict[tuple[int, int], Any] = {}
            ns = jnp.zeros((tr, tc), dtype=jnp.float32)
            for bj in range(nq):
                for bk in range(nq):
                    if src is not None:
                        f = q // src
                        m = None
                        for u in range(f):
                            for v in range(f):
                                sub = box_cache[src][(bj * f + u, bk * f + v)]
                                m = sub if m is None else jnp.maximum(m, sub)
                    else:
                        m = sl(bj * q, bk * q)
                        for u in range(q):
                            for v in range(q):
                                if u == 0 and v == 0:
                                    continue
                                m = jnp.maximum(m, sl(bj * q + u, bk * q + v))
                    boxes[(bj, bk)] = m
                    ns = ns + jnp.clip(m - center, 0.0, float(w))
            # Keep only boxes that a later scale will actually consume (VMEM stack pressure)
            if q > 1 and any(_best_src(q2) == q for q2 in qs if q2 > q):
                box_cache[q] = boxes
            y = jnp.log(ns / q)
            sum_y = sum_y + y
            sum_xy = sum_xy + lq * y

        my = sum_y / n
        ss_xy = sum_xy - n * my * mx
        out_ref[:, :] = -(ss_xy / ss_xx)

    return kernel


@partial(jax.jit, static_argnames=("window_size", "tile_rows", "tile_cols"))
def fractal_roughness_pallas(dem: jnp.ndarray, window_size: int = 13, tile_rows: int = 32,
                             tile_cols: int = 256) -> jnp.ndarray:
    """Fused Pallas fractal roughness; identical semantics to window.fractal_roughness.

    Tiles are rectangular (32 sublanes x 256 lanes by default): the offset sweep must be
    fully unrolled (Mosaic requires aligned dynamic slice starts), and the unrolled
    temporaries live on the 16 MB scoped-VMEM stack — small tiles keep it in budget while
    128 lanes preserve DMA alignment.
    """
    w = int(window_size)
    if w < 5:
        raise ValueError("Fractal roughness requires window size >= 5.")
    if w // 2 > _PADR:
        raise ValueError(f"Pallas fractal roughness supports window_size <= {2 * _PADR + 1}.")
    tr, tc = int(tile_rows), int(tile_cols)
    dem = jnp.asarray(dem, dtype=jnp.float32)
    h, width = dem.shape
    gh = -(-h // tr)
    gw = -(-width // tc)
    demp = jnp.pad(
        dem, ((_PADR, _PADR + gh * tr - h), (_PADC, _PADC + gw * tc - width)),
        constant_values=jnp.nan,
    )
    out = pl.pallas_call(
        _make_fractal_kernel(w, tr, tc),
        grid=(gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tr, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gh * tr, gw * tc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2 * _PADR, tc + 2 * _PADC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(demp)
    return out[:h, :width]


# --------------------------------------------------------------------------------------
# Windowed indexes: fused single-HBM-pass reducers (SURVEY P6)
# --------------------------------------------------------------------------------------
# TPI / TRI / roughness accumulate over all w^2 window offsets; the XLA path reads the
# raster once per offset (w^2 passes). Here every requested reducer runs over one
# double-buffered VMEM tile, so HBM traffic stays at read + n_attrs writes for any w.


def _make_windowed_kernel(attrs: tuple, w: int, riley: bool, tr: int, tc: int):
    hw = w // 2
    need_sum = "topographic_position_index" in attrs
    need_tri = "terrain_ruggedness_index" in attrs
    need_rough = "roughness" in attrs
    need_rug = "rugosity" in attrs

    def kernel(res_ref, dem_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        gh = pl.num_programs(0)
        gw = pl.num_programs(1)
        step = i * gw + j
        slot = jax.lax.rem(step, 2)

        def dma_for(s, r, c):
            return pltpu.make_async_copy(
                dem_hbm.at[pl.ds(r * tr, tr + 2 * _PADR), pl.ds(c * tc, tc + 2 * _PADC)],
                scratch.at[s],
                sem.at[s],
            )

        @pl.when(step == 0)
        def _():
            dma_for(slot, i, j).start()

        nstep = step + 1
        ni = jnp.minimum(nstep // gw, gh - 1)
        nj = nstep % gw

        @pl.when(nstep < gh * gw)
        def _():
            dma_for(1 - slot, ni, nj).start()

        dma_for(slot, i, j).wait()

        off_r = _PADR - hw
        off_c = _PADC - hw

        def sl(d1, d2):
            return scratch[slot, off_r + d1: off_r + d1 + tr, off_c + d2: off_c + d2 + tc]

        center = scratch[slot, _PADR: _PADR + tr, _PADC: _PADC + tc]
        acc_sum = jnp.zeros((tr, tc), jnp.float32) if need_sum else None
        acc_tri = jnp.zeros((tr, tc), jnp.float32) if need_tri else None
        acc_max = jnp.full((tr, tc), -jnp.inf, jnp.float32) if need_rough else None
        acc_min = jnp.full((tr, tc), jnp.inf, jnp.float32) if need_rough else None
        nan_seen = jnp.zeros((tr, tc), jnp.bool_) if need_rough else None

        if need_sum or need_tri or need_rough:
            for u in range(w):
                for v in range(w):
                    s_uv = sl(u, v)
                    if need_sum:
                        acc_sum = acc_sum + s_uv
                    if need_tri:
                        d = s_uv - center
                        acc_tri = acc_tri + (d * d if riley else jnp.abs(d))
                    if need_rough:
                        acc_max = jnp.maximum(acc_max, s_uv)
                        acc_min = jnp.minimum(acc_min, s_uv)
                        nan_seen = nan_seen | jnp.isnan(s_uv)

        rug = None
        if need_rug:
            # Geometry tables shared with window._rugosity so the two engines cannot drift;
            # the per-slice math is re-expressed here for Mosaic.
            from xdem_tpu.terrain.window import (RUGOSITY_CENTER_SEGS, RUGOSITY_EDGE_SEGS,
                                                 RUGOSITY_TRIS)

            L = res_ref[0]
            Z = {(u, v): sl(u, v) for u in range(3) for v in range(3)}
            hsl = []
            for (pos, lfac) in RUGOSITY_CENTER_SEGS:
                dz = center - Z[pos]
                hsl.append(jnp.sqrt(dz * dz + (lfac * L) ** 2) / 2)
            for (p0, p1) in RUGOSITY_EDGE_SEGS:
                dz = Z[p0] - Z[p1]
                hsl.append(jnp.sqrt(dz * dz + L * L) / 2)
            area = jnp.zeros((tr, tc), jnp.float32)
            for (ia, ib, ic) in RUGOSITY_TRIS:
                a, b, c = hsl[ia], hsl[ib], hsl[ic]
                s_h = (a + b + c) / 2
                area = area + jnp.sqrt(jnp.maximum(s_h * (s_h - a) * (s_h - b) * (s_h - c), 0.0))
            rug = area / (L * L)

        for a_idx, a in enumerate(attrs):
            if a == "topographic_position_index":
                val = center - (acc_sum - center) / (w * w - 1)
            elif a == "terrain_ruggedness_index":
                val = jnp.sqrt(acc_tri) if riley else acc_tri / (w * w - 1)
            elif a == "roughness":
                val = jnp.where(nan_seen, jnp.nan, acc_max - acc_min)
            else:  # rugosity
                val = rug
            out_ref[a_idx, :, :] = val

    return kernel


@partial(jax.jit, static_argnames=("attrs", "window_size", "tri_method", "tile_rows", "tile_cols"))
def windowed_indexes_pallas(
    dem: jnp.ndarray,
    resolution: jnp.ndarray | float,
    attrs: tuple[str, ...],
    window_size: int = 3,
    tri_method: str = "Riley",
    tile_rows: int = 32,
    tile_cols: int = 256,
) -> jnp.ndarray:
    """Fused Pallas windowed indexes; identical semantics to window.windowed_indexes."""
    w = int(window_size)
    if w // 2 > _PADR:
        raise ValueError(f"Pallas windowed indexes support window_size <= {2 * _PADR + 1}.")
    if "rugosity" in attrs and w != 3:
        raise ValueError("Rugosity is only defined on a 3x3 window.")
    tr, tc = int(tile_rows), int(tile_cols)
    dem = jnp.asarray(dem, dtype=jnp.float32)
    h, width = dem.shape
    gh = -(-h // tr)
    gw = -(-width // tc)
    demp = jnp.pad(
        dem, ((_PADR, _PADR + gh * tr - h), (_PADC, _PADC + gw * tc - width)),
        constant_values=jnp.nan,
    )
    res = jnp.asarray([resolution], dtype=jnp.float32)
    out = pl.pallas_call(
        _make_windowed_kernel(tuple(attrs), w, tri_method.lower() == "riley", tr, tc),
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((len(attrs), tr, tc), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((len(attrs), gh * tr, gw * tc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2 * _PADR, tc + 2 * _PADC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(res, demp)
    return out[:, :h, :width]
