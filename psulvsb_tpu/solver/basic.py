"""The decoupled scale -> rotation -> translation basic step.

This is the body of one PSULVSB "basic iteration"
(/root/reference/teaser/src/registration.cc:937-1256), shared by:
- the classic TEASER-style decoupled solve (`solver/classic.py`), and
- the batched-hypothesis PSULVSB loop (`solver/psulvsb.py`) — there it is
  vmapped over hypotheses, replacing the reference's serial local loop.

Everything runs at fixed shapes: the TIM set is (3, L_cap) with an active
mask; point selections are (C,)-sized boolean masks built by scatter-or from
TIM endpoint indices (the reference's dedup-by-`dub[]` loops,
registration.cc:1114-1154).

Warm-start state (the reference's file-scope globals `scale_last_best`,
`rotation_last_best`, `translation_last_best`, `first_time`,
registration.cc:42-47) is an explicit `WarmState` pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from psulvsb_tpu.robust.scale import solve_scale_tls, select_scale_inliers
from psulvsb_tpu.utils.precision import mm
from psulvsb_tpu.robust.translation import solve_translation
from psulvsb_tpu.rotation.gnc import gnc_tls_rotation
from psulvsb_tpu.rotation.fgr import fgr_rotation
from psulvsb_tpu.solver.config import SolverParams, RotationEstimationAlgorithm


class WarmState(NamedTuple):
    """Explicit carry for the reference's warm-start globals."""

    scale: jax.Array  # ()
    rotation: jax.Array  # (3, 3)
    translation: jax.Array  # (3,)
    first_time: jax.Array  # () bool — True until the first scoring pass

    @staticmethod
    def initial(dtype=jnp.float32) -> "WarmState":
        return WarmState(
            scale=jnp.ones((), dtype),
            rotation=jnp.eye(3, dtype=dtype),
            translation=jnp.zeros((3,), dtype),
            first_time=jnp.ones((), bool),
        )


class BasicResult(NamedTuple):
    scale: jax.Array  # ()
    rotation: jax.Array  # (3, 3)
    translation: jax.Array  # (3,)
    scale_inliers: jax.Array  # (L_cap,) bool over the basic TIM set
    rotation_inliers: jax.Array  # (L_cap,) bool
    translation_point_inliers: jax.Array  # (C,) bool
    translation_points: jax.Array  # (C,) bool — points fed to translation
    scale_noise: jax.Array  # ()
    translation_noise: jax.Array  # ()


def endpoint_mask(
    idx_i: jax.Array, idx_j: jax.Array, tim_mask: jax.Array, num_points: int
) -> jax.Array:
    """Scatter-or TIM endpoints into a (C,) point mask (the `dub[]` dedup)."""
    m = jnp.zeros((num_points,), dtype=bool)
    sel = tim_mask
    m = m.at[idx_i].max(sel)
    m = m.at[idx_j].max(sel)
    return m


def basic_step(
    src: jax.Array,
    dst: jax.Array,
    idx_i: jax.Array,
    idx_j: jax.Array,
    tim_active: jax.Array,
    params: SolverParams,
    key: jax.Array,
    warm: WarmState,
    noise_bound: float | jax.Array | None = None,
    cbar2: float | jax.Array | None = None,
    clique_points: jax.Array | None = None,
    use_clique_points: jax.Array | bool = False,
) -> BasicResult:
    """One decoupled solve over the TIM set defined by (idx_i, idx_j).

    src/dst: (3, C) full point matrices. The TIMs are gathered on the fly
    (src[:, j] - src[:, i]) — cheaper than materializing per-hypothesis TIM
    buffers in HBM.

    noise_bound/cbar2 default to the PSULVSB inner-loop overrides
    (registration.cc:938-939); pass params.noise_bound/params.cbar2 for the
    classic outer-path behavior.

    When `use_clique_points`, the translation stage uses `clique_points`
    instead of the rotation-inlier endpoints (the b_sampled_rate == 1.0
    branch, registration.cc:1238-1244).
    """
    dtype = src.dtype
    c = src.shape[1]
    nb = jnp.asarray(
        params.inner_noise_bound if noise_bound is None else noise_bound, dtype
    )
    cb2 = jnp.asarray(params.inner_cbar2 if cbar2 is None else cbar2, dtype)

    src_tims = src[:, idx_j] - src[:, idx_i]
    dst_tims = dst[:, idx_j] - dst[:, idx_i]

    # --- scale ------------------------------------------------------------
    if params.estimate_scaling:
        scale, scale_inliers, scale_noise = solve_scale_tls(
            src_tims,
            dst_tims,
            nb,
            cb2,
            key,
            active=tim_active,
            warm_scale=warm.scale,
            use_warm=~warm.first_time,
            max_draws=params.scale_max_draws,
            estimator=params.scale_estimator,
        )
        rot_tim_mask = scale_inliers
    else:
        scale, scale_inliers, scale_noise = select_scale_inliers(
            src_tims, dst_tims, nb, cb2, active=tim_active
        )
        # Known scale: rotation consumes ALL basic TIMs; the scale-inlier
        # mask only feeds the clique graph (registration.cc:984-991).
        rot_tim_mask = tim_active

    # --- rotation ----------------------------------------------------------
    # De-scale dst TIMs and widen the noise bound (registration.cc:1102-1107).
    inv_s = 1.0 / jnp.maximum(scale, 1e-30)
    dst_tims_descaled = dst_tims * inv_s
    rot_nb = nb * (2.0 * inv_s)

    if params.rotation_estimation_algorithm == RotationEstimationAlgorithm.GNC_TLS:
        rot = gnc_tls_rotation(
            src_tims,
            dst_tims_descaled,
            rot_nb,
            active=rot_tim_mask,
            max_iterations=params.inner_rotation_max_iterations,
            gnc_factor=params.inner_rotation_gnc_factor,
            cost_threshold=params.inner_rotation_cost_threshold,
            warm_rotation=warm.rotation,
            use_warm=~warm.first_time,
            rot_method=params.gnc_rot_method,
        )
        rotation, rotation_inliers = rot.rotation, rot.inliers
    else:
        rot = fgr_rotation(
            src_tims,
            dst_tims_descaled,
            rot_nb,
            active=rot_tim_mask,
            max_iterations=params.inner_rotation_max_iterations,
            gnc_factor=params.inner_rotation_gnc_factor,
            cost_threshold=params.inner_rotation_cost_threshold,
        )
        rotation, rotation_inliers = rot.rotation, rot.inliers

    # --- translation point set ---------------------------------------------
    rot_points = endpoint_mask(idx_i, idx_j, rotation_inliers, c)
    if clique_points is None:
        trans_points = rot_points
    else:
        trans_points = jnp.where(
            jnp.asarray(use_clique_points), clique_points, rot_points
        )

    # --- translation ---------------------------------------------------------
    # solveForTranslation(s * R * src, dst) then t /= s
    # (registration.cc:1248-1250).
    moved = scale * mm(rotation, src)
    translation_s, trans_inliers, translation_noise = solve_translation(
        moved,
        dst,
        nb,
        cb2,
        active=trans_points,
        warm_translation=warm.translation,
        use_warm=~warm.first_time,
    )
    translation = translation_s * inv_s

    return BasicResult(
        scale=scale,
        rotation=rotation,
        translation=translation,
        scale_inliers=scale_inliers,
        rotation_inliers=rotation_inliers,
        translation_point_inliers=trans_inliers,
        translation_points=trans_points,
        scale_noise=scale_noise,
        translation_noise=translation_noise,
    )


def score_transform(
    src: jax.Array,
    dst: jax.Array,
    point_mask: jax.Array,
    scale: jax.Array,
    rotation: jax.Array,
    translation: jax.Array,
    threshold: jax.Array | float,
) -> tuple[jax.Array, jax.Array]:
    """Count points with ||dst - s*(R src + t)|| <= threshold among
    point_mask (the scoring loops at registration.cc:1317-1346 and
    :1417-1444; note the transform convention s*(R p + t) after t /= s).

    Returns (count int32, per-point inlier bool (C,)).
    """
    moved = scale * (mm(rotation, src) + translation[:, None])
    res_sq = jnp.sum((dst - moved) ** 2, axis=0)
    ok = (res_sq <= jnp.asarray(threshold) ** 2) & point_mask
    return jnp.sum(ok, dtype=jnp.int32), ok
