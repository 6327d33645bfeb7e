"""Classic TEASER-style decoupled solve on a full correspondence set.

In the reference fork the upstream decoupled path survives only inside the
PSULVSB basic-iteration body (SURVEY.md §3.3); this module exposes it
directly — scale TLS over all TIMs -> GNC rotation -> component-wise
translation — for API parity with upstream `RobustRegistrationSolver` usage
(tests, python examples) and as the verification target for the batched
hypothesis evaluator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from psulvsb_tpu.pairs.tims import compute_tims
from psulvsb_tpu.solver.basic import WarmState, basic_step
from psulvsb_tpu.solver.config import SolverParams
from psulvsb_tpu.solver.solution import RegistrationSolution


@functools.partial(jax.jit, static_argnames=("params",))
def solve_decoupled(
    src: jax.Array,
    dst: jax.Array,
    params: SolverParams,
    key: jax.Array,
    active: jax.Array | None = None,
) -> tuple[RegistrationSolution, dict]:
    """Decoupled solve with the caller's noise bound (no PSULVSB loop).

    src/dst: (3, C). Returns (solution, info dict with inlier masks).
    """
    c = src.shape[1]
    if active is None:
        active = jnp.ones((c,), dtype=bool)
    _, idx_i, idx_j, pair_active = compute_tims(src, active)

    result = basic_step(
        src,
        dst,
        jnp.asarray(idx_i),
        jnp.asarray(idx_j),
        pair_active,
        params,
        key,
        WarmState.initial(src.dtype),
        noise_bound=params.noise_bound,
        cbar2=params.cbar2,
    )
    solution = RegistrationSolution(
        valid=jnp.ones((), bool),
        scale=result.scale,
        rotation=result.rotation,
        translation=result.translation,
        final_inlier_count=jnp.sum(result.translation_point_inliers, dtype=jnp.int32),
    )
    info = {
        "scale_inliers": result.scale_inliers,
        "rotation_inliers": result.rotation_inliers,
        "translation_inliers": result.translation_point_inliers,
        "translation_points": result.translation_points,
        "basic_tims_i": jnp.asarray(idx_i),
        "basic_tims_j": jnp.asarray(idx_j),
    }
    return solution, info
