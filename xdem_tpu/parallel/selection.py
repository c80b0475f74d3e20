"""Distributed exact order statistics for SIGNED f32 values (bit-space radix selection).

Sibling of the non-negative selection in parallel/variogram.py (which exploits that positive
IEEE-754 floats compare like their bit patterns). Signed floats need the classic total-order
key: non-negative values map to `bits | 0x8000_0000`, negative values to `~bits` — a monotone
bijection onto uint32, so the k-th order statistic can be located in key space. Two rounds of
psum'd 16-bit-radix histograms find it exactly: round 1 the high 16 key bits, round 2 the low
16 bits within the selected bucket. No value ever crosses devices — memory is
O(n_bins * 65536) histogram entries per device regardless of population size, and the result
is bit-exact: the returned float IS an element of the population (ties resolve to the same
value), identical for any sharding.

Used by the point-sharded coregistration solvers (parallel/coreg.py) so the distributed
per-aspect-bin medians and vertical-shift medians match the single-device solver BITWISE —
medians are order statistics, not sums, so there is no f32 reassociation error to tolerate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SIGN = jnp.uint32(0x80000000)


def signed_monotone_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Map f32 -> uint32 preserving order: x < y  <=>  key(x) < key(y) (total order incl. -0<+0)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where(bits >> 31 == 1, ~bits, bits | _SIGN)


def u32_to_f32(key: jnp.ndarray) -> jnp.ndarray:
    """Inverse of signed_monotone_u32."""
    bits = jnp.where(key >> 31 == 1, key & jnp.uint32(0x7FFFFFFF), ~key)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _second_round(lo, parked, in_sel, k_in, n_bins, axis):
    flat_lo = jnp.where(in_sel, parked * 65536 + lo, n_bins * 65536)
    hist_lo = jnp.bincount(flat_lo, length=n_bins * 65536 + 1)[:-1].reshape(n_bins, 65536)
    hist_lo = jax.lax.psum(hist_lo, axis)
    cum_lo = jnp.cumsum(hist_lo, axis=1)
    return jnp.argmax(cum_lo > k_in[:, None], axis=1)


def _round_one(x, parked, n_bins: int, axis: str):
    """Shared first radix round: keys, split bits, and the psum'd high-16-bit histogram."""
    key = signed_monotone_u32(x)
    key = jnp.where(parked < n_bins, key, jnp.uint32(0))
    hi = (key >> 16).astype(jnp.int32)  # [0, 65536)
    lo = (key & jnp.uint32(0xFFFF)).astype(jnp.int32)

    flat_hi = jnp.where(parked < n_bins, parked * 65536 + hi, n_bins * 65536)
    hist_hi = jnp.bincount(flat_hi, length=n_bins * 65536 + 1)[:-1].reshape(n_bins, 65536)
    cum_hi = jnp.cumsum(jax.lax.psum(hist_hi, axis), axis=1)
    return hi, lo, cum_hi


def _pick_kth(hi, lo, cum_hi, parked, k, n_bins: int, axis: str):
    """Locate the k-th order statistic per bin given the round-1 cumulative histogram."""
    sel_hi = jnp.argmax(cum_hi > k[:, None], axis=1)
    below = jnp.where(
        sel_hi > 0,
        jnp.take_along_axis(cum_hi, jnp.maximum(sel_hi - 1, 0)[:, None], axis=1)[:, 0],
        0,
    )
    in_sel = (parked < n_bins) & (hi == sel_hi[jnp.clip(parked, 0, n_bins - 1)])
    sel_lo = _second_round(lo, parked, in_sel, k - below, n_bins, axis)
    return u32_to_f32((sel_hi.astype(jnp.uint32) << 16) | sel_lo.astype(jnp.uint32))


def signed_kth_by_bin(x, parked, k, n_bins: int, axis: str):
    """Exact k_b-th smallest (0-based) of {x_i : parked_i == b} per bin b across all shards.

    `parked` must be n_bins for invalid entries. Returns one f32 per bin (garbage where the
    global bin population is smaller than k — mask with counts on the caller side).
    """
    hi, lo, cum_hi = _round_one(x, parked, n_bins, axis)
    return _pick_kth(hi, lo, cum_hi, parked, k, n_bins, axis)


def signed_median_by_bin(x, parked, counts, n_bins: int, axis: str):
    """Exact global per-bin median across shards: 0.5 * (lo + hi) of the two middle order
    statistics — the SAME formula as the single-device _binned_median (coreg/affine.py), so
    a sharded solver using this matches the single-device one bitwise. NaN where count==0.
    The round-1 histogram is shared between the two order statistics."""
    hi, lo, cum_hi = _round_one(x, parked, n_bins, axis)
    k_lo = jnp.maximum((counts - 1) // 2, 0)
    k_hi = counts // 2
    m_lo = _pick_kth(hi, lo, cum_hi, parked, k_lo, n_bins, axis)
    m_hi = _pick_kth(hi, lo, cum_hi, parked, k_hi, n_bins, axis)
    return jnp.where(counts > 0, 0.5 * (m_lo + m_hi), jnp.nan)


def masked_median_distributed(x, valid, axis: str):
    """Exact global median of {x_i : valid_i} across shards; returns (median, global_count)."""
    parked = jnp.where(valid, 0, 1)
    counts = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), axis)[None]
    med = signed_median_by_bin(x, parked, counts, 1, axis)
    return med[0], counts[0]
