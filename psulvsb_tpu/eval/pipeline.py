"""Full per-pair registration pipeline: normals -> normal-angle histogram
pre-filter -> PSULVSB solve.

This is the sequence both reference drivers run per pair
(PSULVSB.cc:303-328, teaser_cpp_ply_main.cc:330-422): PCL normals (k = 20),
histogram_outlier_removal producing keep_mask/reduce_map, then
RobustRegistrationSolver::solve on the reduced set with ori_* in Params.
"""

from __future__ import annotations

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from psulvsb_tpu.frontend.normals import estimate_normals
from psulvsb_tpu.frontend.histogram_filter import normal_angle_histogram_filter
from psulvsb_tpu.solver.config import SolverParams
from psulvsb_tpu.solver.psulvsb import psulvsb_solve
from psulvsb_tpu.solver.fused import psulvsb_register
from psulvsb_tpu.solver.solution import RegistrationSolution


class PipelineResult(NamedTuple):
    solution: RegistrationSolution
    keep_mask: jax.Array
    elapsed_s: float


def solve_with_prefilter(
    src,
    dst,
    params: SolverParams,
    key: jax.Array,
    normal_k: int = 20,
    fused: bool = True,
) -> PipelineResult:
    """src/dst: (3, C) matched correspondence matrices (original set)."""
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    t0 = time.monotonic()

    src_normals = estimate_normals(src, k=normal_k)
    dst_normals = estimate_normals(dst, k=normal_k)
    keep_mask, _ = normal_angle_histogram_filter(src_normals, dst_normals)

    if fused:
        sol = psulvsb_register(src, dst, keep_mask, key, params)
        jax.block_until_ready(sol)
    else:
        sol, _info = psulvsb_solve(src, dst, keep_mask, params, key)
    return PipelineResult(
        solution=sol, keep_mask=keep_mask, elapsed_s=time.monotonic() - t0
    )
