"""Component-wise robust translation solver.

Equivalent of TLSTranslationSolver::solveForTranslation
(/root/reference/teaser/src/registration.cc:436-463): per-axis max-interval
stabbing on raw translations dst - src with noise beta = noise_bound *
sqrt(cbar2); a point is an inlier iff all three axes agree. The reference
cycles its STswitch global x -> y -> z and warm-starts each axis from
translation_last_best (registration.cc:137-161); here the warm start is an
explicit argument.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from psulvsb_tpu.robust.scalar_tls import max_stabbing


def solve_translation(
    src: jax.Array,
    dst: jax.Array,
    noise_bound: jax.Array | float,
    cbar2: jax.Array | float,
    active: jax.Array | None = None,
    warm_translation: jax.Array | None = None,
    use_warm: jax.Array | bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (translation (3,), inlier mask over columns, translation_noise).

    src/dst: (3, N) point matrices (already rotated/scaled by the caller, as
    in registration.cc:1248).
    """
    if active is None:
        active = jnp.ones((src.shape[1],), dtype=bool)
    beta = jnp.asarray(noise_bound, src.dtype) * jnp.sqrt(jnp.asarray(cbar2, src.dtype))
    raw = dst - src  # (3, N)
    if warm_translation is None:
        warm_translation = jnp.zeros((3,), dtype=src.dtype)

    def solve_axis(row, warm):
        return max_stabbing(row, beta, active=active, warm_value=warm, use_warm=use_warm)

    est, inl = jax.vmap(solve_axis)(raw, warm_translation)
    inliers = jnp.all(inl, axis=0) & active
    return est, inliers, beta


class TLSTranslationSolver:
    """Facade of teaser::TLSTranslationSolver (registration.h:194-217)."""

    def __init__(self, noise_bound: float, cbar2: float):
        self.noise_bound = noise_bound
        self.cbar2 = cbar2

    def solveForTranslation(self, src, dst):
        t, inliers, _ = solve_translation(
            jnp.asarray(src), jnp.asarray(dst), self.noise_bound, self.cbar2
        )
        return t, inliers
