"""Normal-angle histogram correspondence pre-filter.

Equivalent of histogram_outlier_removal
(/root/reference/examples/teaser_cpp_ply/PSULVSB.cc:87-172):

1. angle_i = acos(<src_normal_i, dst_normal_i>) in degrees;
2. Scott's-rule bin width 3.49 * sigma * n^(-1/3) over the angles;
3. keep bins with height > mean + 1 sigma (keep_mask = 1);
4. discard bins farther than 2 from the peak bin (keep_mask = -1);
5. everything else stays 0 (droppable but re-admittable by self-update).

The reference's histogram size is data-dependent (ceil(range/width)); here
bins are capped at a static `max_bins` and the dynamic count masks the tail,
so the filter jits. NaN angles (zero normals) are excluded from statistics
and keep 0, matching PSULVSB.cc:103-104.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_bins",))
def normal_angle_histogram_filter(
    src_normals: jax.Array,
    dst_normals: jax.Array,
    active: jax.Array | None = None,
    max_bins: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Returns (keep_mask (N,) int32 in {1, 0, -1}, angles_deg (N,))."""
    n = src_normals.shape[1]
    if active is None:
        active = jnp.ones((n,), bool)
    dtype = src_normals.dtype

    def unit(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-30)

    cos = jnp.sum(unit(src_normals) * unit(dst_normals), axis=0)
    cos = jnp.clip(cos, -1.0, 1.0)
    angles = jnp.arccos(cos) * (180.0 / jnp.pi)
    valid = active & jnp.isfinite(angles) & (
        jnp.linalg.norm(src_normals, axis=0) > 0
    ) & (jnp.linalg.norm(dst_normals, axis=0) > 0)

    vf = valid.astype(dtype)
    cnt = jnp.maximum(jnp.sum(vf), 1.0)
    mean = jnp.sum(jnp.where(valid, angles, 0.0)) / cnt
    var = jnp.sum(jnp.where(valid, (angles - mean) ** 2, 0.0)) / cnt
    std = jnp.sqrt(var)

    a_min = jnp.min(jnp.where(valid, angles, jnp.inf))
    a_max = jnp.max(jnp.where(valid, angles, -jnp.inf))
    width = 3.49 * std / jnp.cbrt(cnt)
    width = jnp.maximum(width, 1e-6)
    nbins = jnp.maximum(jnp.ceil((a_max - a_min) / width), 1.0)
    nbins_i = jnp.minimum(nbins, max_bins).astype(jnp.int32)
    # If the dynamic bin count saturates max_bins, widen bins to span.
    eff_width = jnp.maximum(width, (a_max - a_min) / nbins_i.astype(dtype))

    bin_idx = jnp.floor((angles - a_min) / eff_width).astype(jnp.int32)
    bin_idx = jnp.clip(bin_idx, 0, nbins_i - 1)
    bin_idx = jnp.where(valid, bin_idx, max_bins - 1)  # park invalids in tail

    heights = jnp.zeros((max_bins,), jnp.int32).at[bin_idx].add(
        valid.astype(jnp.int32)
    )
    bin_live = jnp.arange(max_bins) < nbins_i
    peak = jnp.argmax(jnp.where(bin_live, heights, -1))

    hf = heights.astype(dtype)
    h_mean = jnp.sum(jnp.where(bin_live, hf, 0.0)) / jnp.maximum(
        nbins_i.astype(dtype), 1.0
    )
    h_var = jnp.sum(jnp.where(bin_live, (hf - h_mean) ** 2, 0.0)) / jnp.maximum(
        nbins_i.astype(dtype), 1.0
    )
    h_thr = h_mean + jnp.sqrt(h_var)  # stdDevMultiplier = 1 (PSULVSB.cc:128)

    tall_bin = hf > h_thr
    far_bin = jnp.abs(jnp.arange(max_bins) - peak) > 2

    keep = jnp.zeros((n,), jnp.int32)
    # Order matters in the reference (PSULVSB.cc:156-168): far-from-peak
    # marks -1 first, tall bins then overwrite with 1 (a bin can be both).
    keep = jnp.where(valid & far_bin[bin_idx], -1, keep)
    keep = jnp.where(valid & tall_bin[bin_idx], 1, keep)
    keep = jnp.where(~active, -1, keep)
    return keep, angles
