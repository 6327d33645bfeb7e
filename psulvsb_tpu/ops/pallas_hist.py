"""Tiled Pallas scale-ratio histogram over the full C x C pair grid.

The reference's line-vector build sweeps all C(C-1)/2 correspondence pairs
and histograms the TIM length ratios (registration.cc:693-732). The XLA
exact form (solver/psulvsb.py::_init_stage) materializes the O(C^2) TIM
universe in HBM and scatter-adds it into the histogram — scatters serialize
on TPU (measured ~9 ms per 1M elements on v5e). The rejection-sampled init
avoids O(C^2) work but only *estimates* the peak from a pair subsample.

This kernel computes the EXACT histogram with O(C) HBM traffic and no
scatter: each grid step holds a (T, 3) row block and a (Cc, 3) column block
in VMEM, computes the (T, Cc) ratio tile with one MXU contraction, and bins
by broadcast-compare — bins live on SUBLANES as a (B, 1) iota column,
pair rows on LANES as (1, Cc) slices, so `bins == idx_row` lowers to a
native (B, Cc) vector compare (Mosaic supports neither scatter nor
lane-unaligned dynamic slices, which rules out the usual one-hot layouts).
Sub-diagonal tiles are skipped entirely (halves the sweep).

Binning is windowed: bin b counts ratios in [lo + b, lo + b + 1) * width
(width = 1 / bins_per_unit * stride). Two calls give an exact global
argmax at a fraction of the compare cost (compare work is L * B lanes):

1. coarse pass: stride s (bin width s/bins_per_unit) over [0, B*s) global
   fine bins, overflow clamped into the last coarse bin;
2. fine pass: stride 1 anchored at the coarse argmax's fine-bin range.

The fine argmax is certified global iff no *other* coarse bin's count
reaches the fine peak count (a coarse bin bounds every fine bin under it);
`exact_peak_bin` returns that certificate so callers can fall back to the
XLA sweep on the (pathological) failure case. Bin boundaries match
pairs/tims.py::scale_ratio_histogram exactly (floor at multiples of
1/bins_per_unit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(
    src_rows,  # (T, 3) VMEM — row block of source points
    dst_rows,  # (T, 3)
    src_cols,  # (Cc, 3) VMEM — column block
    dst_cols,  # (Cc, 3)
    act_rows,  # (T, 1) float {0,1}
    act_cols,  # (Cc, 1)
    scale_ref,  # (1, 1) SMEM f32 — fine bins per unit ratio
    window_ref,  # (1, 2) SMEM i32 — (lo fine bin, stride)
    counts_ref,  # (B, 1) VMEM out — accumulated across the sequential grid
    *,
    t_block: int,
    c_block: int,
    num_bins: int,
    clamp_overflow: bool,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        counts_ref[:] = jnp.zeros_like(counts_ref)

    t, cc = t_block, c_block

    # Tiles entirely below the diagonal hold no i < j pairs — skip them.
    tile_live = (i * t) < ((j + 1) * cc - 1)

    @pl.when(tile_live)
    def _body():
        def pair_dist2(rows, cols):
            # HIGHEST precision: the bf16-pass MXU default shifts distances
            # by ~1e-3 relative, which moves ratios across bin boundaries
            # (bin width 0.05) — bin counts must match the f32 XLA sweep.
            rn = jnp.sum(rows * rows, axis=1, keepdims=True)  # (T, 1)
            cn = jnp.sum(cols * cols, axis=1, keepdims=True)  # (Cc, 1)
            cross = jnp.dot(
                rows, cols.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jnp.maximum(rn + cn.T - 2.0 * cross, 0.0)

        v1 = jnp.sqrt(pair_dist2(src_rows[:], src_cols[:]))  # (T, Cc)
        v2 = jnp.sqrt(pair_dist2(dst_rows[:], dst_cols[:]))
        # Same zero-length guard as the XLA exact sweep (psulvsb.py:223).
        ratio = v2 / jnp.where(v1 > 0, v1, 1.0)
        lo = window_ref[0, 0]
        stride = window_ref[0, 1]
        fine = jnp.floor(ratio * scale_ref[0, 0]).astype(jnp.int32)
        fine = jnp.maximum(fine, 0)  # degenerate negatives -> bin 0
        idx = (fine - lo) // stride

        # Each unordered pair votes once: global row < global col.
        row_g = i * t + jax.lax.broadcasted_iota(jnp.int32, (t, cc), 0)
        col_g = j * cc + jax.lax.broadcasted_iota(jnp.int32, (t, cc), 1)
        valid = (row_g < col_g).astype(jnp.float32) * act_rows[:] * act_cols[:].T
        if clamp_overflow:
            idx = jnp.clip(idx, 0, num_bins - 1)
        else:
            valid = jnp.where((idx >= 0) & (idx < num_bins), valid, 0.0)
            idx = jnp.clip(idx, 0, num_bins - 1)

        bins = jax.lax.broadcasted_iota(jnp.int32, (num_bins, cc), 0)
        acc = jnp.zeros((num_bins, 1), jnp.float32)
        for r in range(t):  # static unroll: rows are sublane-static slices
            onehot = jnp.where(idx[r : r + 1, :] == bins, valid[r : r + 1, :], 0.0)
            acc = acc + jnp.sum(onehot, axis=1, keepdims=True)  # (B, 1)
        counts_ref[:] += acc


@functools.partial(
    jax.jit,
    static_argnames=("t_block", "c_block", "num_bins", "clamp_overflow", "interpret"),
)
def _pair_ratio_histogram_impl(
    src_t, dst_t, act, scale, window, t_block, c_block, num_bins,
    clamp_overflow, interpret,
):
    c = src_t.shape[0]
    kernel = functools.partial(
        _hist_kernel,
        t_block=t_block,
        c_block=c_block,
        num_bins=num_bins,
        clamp_overflow=clamp_overflow,
    )
    counts = pl.pallas_call(
        kernel,
        grid=(c // t_block, c // c_block),
        in_specs=[
            pl.BlockSpec((t_block, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_block, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_block, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_block, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_block, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_block, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_bins, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_bins, 1), jnp.float32),
        interpret=interpret,
    )(src_t, dst_t, src_t, dst_t, act, act, scale, window)
    return counts[:, 0].astype(jnp.int32)


def _prep(src, dst, active, block):
    c = src.shape[1]
    if active is None:
        active = jnp.ones((c,), bool)
    pad = (-c) % block
    src_t = jnp.pad(src.T.astype(jnp.float32), ((0, pad), (0, 0)))
    dst_t = jnp.pad(dst.T.astype(jnp.float32), ((0, pad), (0, 0)))
    act = jnp.pad(active.astype(jnp.float32), (0, pad))[:, None]
    return src_t, dst_t, act


def pair_ratio_histogram(
    src: jax.Array,
    dst: jax.Array,
    active: jax.Array | None = None,
    bins_per_unit: int = 20,
    num_bins: int = 512,
    lo_bin=0,
    stride: int = 1,
    clamp_overflow: bool = True,
    t_block: int = 16,
    c_block: int = 512,
) -> jax.Array:
    """Exact windowed histogram of ||dst_j - dst_i|| / ||src_j - src_i||
    over all active pairs i < j, tiled through VMEM.

    src/dst: (3, C). Bin b counts global fine bins [lo_bin + b*stride,
    lo_bin + (b+1)*stride) where a fine bin spans 1/bins_per_unit of ratio.
    clamp_overflow=True folds out-of-window ratios into the edge bins
    (coarse-pass semantics); False drops them (fine-pass semantics).
    Returns counts (num_bins,) int32.
    """
    src_t, dst_t, act = _prep(src, dst, active, max(t_block, c_block))
    scale = jnp.full((1, 1), float(bins_per_unit), jnp.float32)
    window = jnp.asarray([[lo_bin, stride]], jnp.int32)
    interpret = jax.default_backend() != "tpu"
    return _pair_ratio_histogram_impl(
        src_t, dst_t, act, scale, window, t_block, c_block, num_bins,
        clamp_overflow, interpret,
    )


def _beta_count_kernel(
    src_rows, dst_rows, src_cols, dst_cols, act_rows, act_cols,
    beta_ref,  # (1, 1) SMEM f32
    count_ref,  # (1, 1) VMEM out f32 — accumulated across the grid
    *,
    t_block: int,
    c_block: int,
):
    """Count pairs i < j with | ||src_j-src_i|| - ||dst_j-dst_i|| | <= beta —
    the known-scale reduced-set membership test (registration.cc:753-767) —
    over one (T, Cc) tile. Same tiling/layout as _hist_kernel."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        count_ref[:] = jnp.zeros_like(count_ref)

    t, cc = t_block, c_block
    tile_live = (i * t) < ((j + 1) * cc - 1)

    @pl.when(tile_live)
    def _body():
        def pair_dist2(rows, cols):
            rn = jnp.sum(rows * rows, axis=1, keepdims=True)
            cn = jnp.sum(cols * cols, axis=1, keepdims=True)
            cross = jnp.dot(
                rows, cols.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jnp.maximum(rn + cn.T - 2.0 * cross, 0.0)

        v1 = jnp.sqrt(pair_dist2(src_rows[:], src_cols[:]))
        v2 = jnp.sqrt(pair_dist2(dst_rows[:], dst_cols[:]))
        row_g = i * t + jax.lax.broadcasted_iota(jnp.int32, (t, cc), 0)
        col_g = j * cc + jax.lax.broadcasted_iota(jnp.int32, (t, cc), 1)
        valid = (row_g < col_g).astype(jnp.float32) * act_rows[:] * act_cols[:].T
        member = jnp.where(
            jnp.abs(v1 - v2) <= beta_ref[0, 0], valid, 0.0
        )
        count_ref[0, 0] += jnp.sum(member)


@functools.partial(jax.jit, static_argnames=("t_block", "c_block", "interpret"))
def _pair_beta_count_impl(src_t, dst_t, act, beta, t_block, c_block, interpret):
    c = src_t.shape[0]
    kernel = functools.partial(
        _beta_count_kernel, t_block=t_block, c_block=c_block
    )
    count = pl.pallas_call(
        kernel,
        grid=(c // t_block, c // c_block),
        in_specs=[
            pl.BlockSpec((t_block, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_block, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_block, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_block, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_block, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_block, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(src_t, dst_t, src_t, dst_t, act, act, beta)
    return count[0, 0].astype(jnp.int32)


def pair_beta_count(
    src: jax.Array,
    dst: jax.Array,
    beta: jax.Array | float,
    active: jax.Array | None = None,
    t_block: int = 16,
    c_block: int = 512,
) -> jax.Array:
    """EXACT count of active pairs i < j passing the known-scale beta window
    | ||src_j-src_i|| - ||dst_j-dst_i|| | <= beta (registration.cc:753-767),
    with O(C) HBM traffic — the known-scale analog of pair_ratio_histogram,
    giving `init_mode="auto"` an exact |reduced| beyond dense_init_max_c.

    src/dst: (3, C). Returns () int32.

    Numerics: tile distances come from the ||a||^2+||b||^2-2ab MXU
    decomposition (HIGHEST precision) — ~1e-3 relative shifts vs the direct
    (a-b) form can flip razor-edge window membership of individual pairs
    (same property as the dense init, solver/psulvsb.py::_init_stage_dense).

    Exactness bound: the accumulator is an f32 scalar, so the count is
    exact only while it stays <= 2^24 (~16.7M passing pairs, i.e. all-pass
    at C ~ 5800). Harmless today — every consumer clamps the result to
    reduced_cap = 131072 long before f32 rounding kicks in — but a future
    consumer of the raw count above that regime should switch the kernel
    to per-tile int32 partials first.
    """
    src_t, dst_t, act = _prep(src, dst, active, max(t_block, c_block))
    beta_arr = jnp.full((1, 1), beta, jnp.float32)
    interpret = jax.default_backend() != "tpu"
    return _pair_beta_count_impl(
        src_t, dst_t, act, beta_arr, t_block, c_block, interpret
    )


def exact_peak_bin(
    src: jax.Array,
    dst: jax.Array,
    active: jax.Array | None = None,
    bins_per_unit: int = 20,
    num_bins: int = 128,
    stride: int = 16,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact global-argmax fine bin via a coarse + fine kernel pass.

    Returns (peak fine-bin index, peak count, certified bool). `certified`
    is True when no coarse bin outside the refined window can hold a fine
    bin beating the found peak — the caller should fall back to the exact
    XLA sweep when False (requires out-of-window mass dominating the data,
    e.g. scale ratios beyond num_bins*stride/bins_per_unit = 102.4 at the
    defaults).
    """
    coarse = pair_ratio_histogram(
        src, dst, active, bins_per_unit=bins_per_unit, num_bins=num_bins,
        lo_bin=0, stride=stride, clamp_overflow=True,
    )
    cpeak = jnp.argmax(coarse).astype(jnp.int32)
    # Fine window: the coarse argmax bin +-1 (the true fine peak's +-1
    # membership window never needs more), aligned down to stride.
    lo = jnp.maximum(cpeak - 1, 0) * stride
    n_fine = 3 * stride
    fine = pair_ratio_histogram(
        src, dst, active, bins_per_unit=bins_per_unit, num_bins=n_fine,
        lo_bin=lo, stride=1, clamp_overflow=False,
    )
    fpeak = jnp.argmax(fine).astype(jnp.int32)
    peak_count = fine[fpeak]
    # Certificate: every fine bin under coarse bin k has count <= coarse[k].
    # The LAST coarse bin absorbs the entire out-of-window tail
    # (clamp_overflow=True), so its aggregated count bounds nothing about
    # any single fine bin: it must never count as "inside the window"
    # (second-to-last-bin peaks would otherwise shadow a larger true peak
    # hiding in the clamp mass) and an argmax ON it is never certifiable.
    nb = coarse.shape[0]
    in_window = (jnp.abs(jnp.arange(nb) - cpeak) <= 1) & (
        jnp.arange(nb) < nb - 1
    )
    outside_max = jnp.max(jnp.where(in_window, 0, coarse))
    certified = (outside_max < jnp.maximum(peak_count, 1)) & (cpeak < nb - 1)
    return lo + fpeak, peak_count, certified
