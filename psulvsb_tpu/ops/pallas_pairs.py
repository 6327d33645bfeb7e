"""Pallas TPU kernels for the O(C^2) correspondence-pair grid.

The reference's hottest loops sweep all pairs of correspondences serially
(the line-vector build, registration.cc:693-732; GROR node reliability,
ia_gror.hpp:125-193). The XLA form broadcasts (C, C) distance matrices in
HBM — correct, but at C = 5k that's 100 MB of traffic per matrix. These
kernels tile the pair grid through VMEM instead: each program holds a row
block of points plus the full (3, C) point set (tiny), computes its
(T, C) tile with one MXU contraction (||a-b||^2 = ||a||^2 + ||b||^2 - 2ab),
reduces in-register, and only the (C,)-sized outputs ever touch HBM.

On non-TPU backends the kernels run in interpreter mode (tests) — the
public wrappers pick automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _degree_kernel(src_rows, dst_rows, src_all, dst_all, act_rows, act_all,
                   tau_ref, deg_ref):
    """One (T, C) tile of the consistency grid.

    src_rows/dst_rows: (T, 3) row-block points; src_all/dst_all: (C, 3);
    act_*: (T, 1)/(C, 1) float masks {0,1}; tau_ref: (1, 1) threshold.
    deg_ref out: (T, 1) float32 degree counts.
    """
    tau = tau_ref[0, 0]

    def pair_dist(rows, alls):
        rn = jnp.sum(rows * rows, axis=1, keepdims=True)  # (T, 1)
        an = jnp.sum(alls * alls, axis=1, keepdims=True)  # (C, 1)
        cross = jnp.dot(rows, alls.T, preferred_element_type=jnp.float32)
        d2 = rn + an.T - 2.0 * cross
        return jnp.sqrt(jnp.maximum(d2, 0.0))

    ds = pair_dist(src_rows[:], src_all[:])
    dt = pair_dist(dst_rows[:], dst_all[:])
    ok = (jnp.abs(ds - dt) < tau).astype(jnp.float32)
    ok = ok * act_rows[:] * act_all[:].T
    # The diagonal self-pair always passes (|0-0| < tau); subtract it.
    deg = jnp.sum(ok, axis=1, keepdims=True) - act_rows[:]
    deg_ref[:] = deg


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _consistency_degree_impl(
    src_t: jax.Array,  # (C, 3)
    dst_t: jax.Array,
    act: jax.Array,  # (C, 1) float
    tau: jax.Array,  # (1, 1)
    block: int,
    interpret: bool,
) -> jax.Array:
    c = src_t.shape[0]
    grid = (c // block,)
    deg = pl.pallas_call(
        _degree_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 1), jnp.float32),
        interpret=interpret,
    )(src_t, dst_t, src_t, dst_t, act, act, tau)
    return deg[:, 0]


def consistency_degree(
    src: jax.Array,
    dst: jax.Array,
    tau: float | jax.Array,
    active: jax.Array | None = None,
    block: int = 256,
) -> jax.Array:
    """Per-correspondence degree in the length-consistency graph:
    deg[i] = #{j != i : | ||s_i - s_j|| - ||t_i - t_j|| | < tau}.

    src/dst: (3, C). Returns (C,) int32. Pads C to a block multiple
    internally.
    """
    c = src.shape[1]
    if active is None:
        active = jnp.ones((c,), bool)
    pad = (-c) % block
    src_t = jnp.pad(src.T.astype(jnp.float32), ((0, pad), (0, 0)))
    dst_t = jnp.pad(dst.T.astype(jnp.float32), ((0, pad), (0, 0)))
    act = jnp.pad(active.astype(jnp.float32), (0, pad))[:, None]
    tau_arr = jnp.full((1, 1), tau, jnp.float32)
    interpret = jax.default_backend() != "tpu"
    deg = _consistency_degree_impl(src_t, dst_t, act, tau_arr, block, interpret)
    return deg[:c].astype(jnp.int32)
