"""Classic TEASER-style decoupled solve on a full correspondence set.

In the reference fork the upstream decoupled path survives only inside the
PSULVSB basic-iteration body (SURVEY.md §3.3); this module exposes the full
upstream pipeline directly — scale TLS over all complete-graph TIMs ->
max-clique inlier pruning over the scale-consistency graph -> rotation on
chain (or complete) TIMs of the clique points -> component-wise translation
— for API parity with upstream `RobustRegistrationSolver` usage
(registration-test.cc, the MATLAB benchmark fixtures in
test/benchmark/data/) and as the verification target for the batched
hypothesis evaluator.

Host-orchestrated (the clique stage is combinatorial, and problem sizes on
this path are the reference's test sizes); the numeric stages run jitted.
Convention note: upstream reports translation with dst = s * R * src + t
(no `t /= s` — that division is a fork modification, registration.cc:1250).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from psulvsb_tpu.pairs.tims import compute_tims
from psulvsb_tpu.robust.scale import select_scale_inliers, solve_scale_tls
from psulvsb_tpu.robust.translation import solve_translation
from psulvsb_tpu.rotation.gnc import gnc_tls_rotation
from psulvsb_tpu.rotation.fgr import fgr_rotation
from psulvsb_tpu.solver.config import (
    SolverParams,
    InlierGraphFormulation,
    InlierSelectionMode,
    RotationEstimationAlgorithm,
)
from psulvsb_tpu.solver.solution import RegistrationSolution
from psulvsb_tpu.utils.precision import mm


def _max_clique(adj: np.ndarray, mode: InlierSelectionMode, params: SolverParams):
    """MaxCliqueSolver::findMaxClique dispatch (graph.cc:12-125): exact PMC
    branch-and-bound for PMC_EXACT (native C++, greedy fallback when the
    library is unavailable), on-device greedy for PMC_HEU, k-core peel for
    KCORE_HEU."""
    if mode == InlierSelectionMode.PMC_EXACT:
        from psulvsb_tpu.clique.pmc import exact_max_clique, native_available

        if native_available():
            # Runtime failures must surface — PMC_EXACT callers depend on
            # exact cliques for golden parity; silently degrading to the
            # heuristic would yield different inlier sets with no warning.
            # Only library unavailability (no toolchain/.so) falls through
            # to the greedy lower bound.
            return exact_max_clique(adj, params.max_clique_time_limit)
    if mode == InlierSelectionMode.KCORE_HEU:
        from psulvsb_tpu.clique.kcore import max_kcore_mask

        mask = np.asarray(max_kcore_mask(jnp.asarray(adj)))
        return sorted(np.nonzero(mask)[0].tolist())
    from psulvsb_tpu.clique.kcore import greedy_clique

    mask = np.asarray(greedy_clique(jnp.asarray(adj)))
    return sorted(np.nonzero(mask)[0].tolist())


def solve_decoupled(
    src: jax.Array,
    dst: jax.Array,
    params: SolverParams,
    key: jax.Array,
    active: jax.Array | None = None,
) -> tuple[RegistrationSolution, dict]:
    """Upstream decoupled solve with the caller's noise bound (no PSULVSB
    loop). src/dst: (3, C). Returns (solution, info dict with inlier masks).

    Stage order and semantics follow the upstream solve() the benchmark
    fixtures were exported against: scale -> clique -> chain-TIM rotation ->
    translation, all with params.noise_bound / params.rotation_* (the
    inner_* overrides belong to the PSULVSB loop only).
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    c = src.shape[1]
    dtype = src.dtype
    if active is None:
        active = jnp.ones((c,), dtype=bool)
    _, idx_i, idx_j, pair_active = compute_tims(src, active)
    idx_i = np.asarray(idx_i)
    idx_j = np.asarray(idx_j)

    src_tims = src[:, idx_j] - src[:, idx_i]
    dst_tims = dst[:, idx_j] - dst[:, idx_i]

    # --- scale (registration.cc:958-991) ------------------------------------
    if params.estimate_scaling:
        scale, scale_inliers, _ = solve_scale_tls(
            src_tims, dst_tims, params.noise_bound, params.cbar2, key,
            active=pair_active, max_draws=params.scale_max_draws,
            estimator=params.scale_estimator,
        )
    else:
        scale, scale_inliers, _ = select_scale_inliers(
            src_tims, dst_tims, params.noise_bound, params.cbar2,
            active=pair_active,
        )

    # --- max-clique inlier selection (registration.cc:1000-1056) ------------
    mode = params.resolve_inlier_selection()
    if mode != InlierSelectionMode.NONE:
        sc = np.asarray(scale_inliers)
        adj = np.zeros((c, c), bool)
        adj[idx_i[sc], idx_j[sc]] = True
        adj[idx_j[sc], idx_i[sc]] = True
        clique = _max_clique(adj, mode, params)
        if len(clique) <= 1:
            # Clique abort (registration.cc:1032-1036).
            sol = RegistrationSolution(
                valid=jnp.zeros((), bool),
                scale=scale,
                rotation=jnp.eye(3, dtype=dtype),
                translation=jnp.zeros((3,), dtype),
                final_inlier_count=jnp.zeros((), jnp.int32),
            )
            # Keep the masks computed before the abort so the api getters
            # stay truthful (the rotation/translation stages never ran —
            # those keys are explicitly None, matching the getters'
            # "not produced by the last solve" behavior).
            return sol, {
                "max_clique": clique,
                "scale_inliers": scale_inliers,
                "rotation_inliers": None,
                "translation_inliers": None,
                "translation_points": None,
            }
    else:
        clique = [int(i) for i in np.nonzero(np.asarray(active))[0]]

    # --- rotation TIMs over the clique (upstream chain graph) ---------------
    m = len(clique)
    cq = np.asarray(clique)
    if params.rotation_tim_graph == InlierGraphFormulation.CHAIN:
        r_i = cq
        r_j = cq[(np.arange(m) + 1) % m]  # chain with wrap-around
    else:  # COMPLETE over clique points
        a, b = np.triu_indices(m, 1)
        r_i, r_j = cq[a], cq[b]
    rot_src = src[:, r_j] - src[:, r_i]
    rot_dst = dst[:, r_j] - dst[:, r_i]

    # De-scale + widened noise bound (registration.cc:1102-1108).
    inv_s = 1.0 / jnp.maximum(scale, 1e-30)
    rot_dst = rot_dst * inv_s
    rot_nb = jnp.asarray(params.noise_bound, dtype) * 2.0 * inv_s

    if params.rotation_estimation_algorithm == RotationEstimationAlgorithm.GNC_TLS:
        rot = gnc_tls_rotation(
            rot_src, rot_dst, rot_nb,
            max_iterations=params.rotation_max_iterations,
            gnc_factor=params.rotation_gnc_factor,
            cost_threshold=params.rotation_cost_threshold,
            rot_method=params.gnc_rot_method,
        )
    else:
        rot = fgr_rotation(
            rot_src, rot_dst, rot_nb,
            max_iterations=params.rotation_max_iterations,
            gnc_factor=params.rotation_gnc_factor,
            cost_threshold=params.rotation_cost_threshold,
        )
    rotation, rotation_inliers = rot.rotation, rot.inliers

    # --- translation point set (endpoint dedup, registration.cc:1114-1154) --
    ri = np.asarray(rotation_inliers)
    pt_mask = np.zeros((c,), bool)
    pt_mask[r_i[ri]] = True
    pt_mask[r_j[ri]] = True
    trans_points = jnp.asarray(pt_mask)

    # --- translation (upstream: on s * R * src; t NOT divided by s) ---------
    moved = scale * mm(rotation, src)
    translation, trans_inliers, _ = solve_translation(
        moved, dst, params.noise_bound, params.cbar2, active=trans_points,
    )

    solution = RegistrationSolution(
        valid=jnp.ones((), bool),
        scale=scale,
        rotation=rotation,
        translation=translation,
        final_inlier_count=jnp.sum(trans_inliers, dtype=jnp.int32),
    )
    info = {
        "scale_inliers": scale_inliers,
        "rotation_inliers": rotation_inliers,
        "translation_inliers": trans_inliers,
        "translation_points": trans_points,
        "max_clique": clique,
        "basic_tims_i": jnp.asarray(r_i),
        "basic_tims_j": jnp.asarray(r_j),
    }
    return solution, info
