"""Scale solvers over line-vector (TIM) sets.

Equivalents of (references into /root/reference/teaser/src/registration.cc):
- TLSScaleSolver::solveForScale       registration.cc:397-415
- ScaleInliersSelector::solveForScale registration.cc:418-434

The reference sets the module global `scale_noise = 2*noise_bound*sqrt(cbar2)`
as a side effect (registration.cc:411); here that value is simply returned so
the solver can thread it through its carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from psulvsb_tpu.robust.scalar_tls import scale_consensus_1pt, tls_vote


def tim_norms(tims: jax.Array, active: jax.Array | None = None) -> jax.Array:
    """Column norms of a (3, L) TIM matrix; padded columns get norm 0."""
    n = jnp.sqrt(jnp.sum(tims * tims, axis=0))
    if active is not None:
        n = jnp.where(active, n, 0.0)
    return n


def solve_scale_tls(
    src_tims: jax.Array,
    dst_tims: jax.Array,
    noise_bound: jax.Array | float,
    cbar2: jax.Array | float,
    key: jax.Array,
    active: jax.Array | None = None,
    warm_scale: jax.Array | None = None,
    use_warm: jax.Array | bool = False,
    max_draws: int = 256,
    estimator: str = "ransac1pt",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Unknown-scale estimate from TIM norm ratios (registration.cc:397-415).

    raw_scales = |dst_tim| / |src_tim|; alphas = beta / |src_tim| with
    beta = 2 * noise_bound * sqrt(cbar2).

    estimator: "ransac1pt" — the PSULVSB fork's RANSAC-mode scalar consensus
    (registration.cc:67-119); "vote" — upstream TEASER's deterministic
    adaptive voting (estimate_tiled, registration.cc:206-320), the estimator
    behind the MATLAB benchmark references.

    Returns (scale, inlier mask over TIM columns, scale_noise = beta).
    """
    if active is None:
        active = jnp.ones((src_tims.shape[1],), dtype=bool)
    v1 = tim_norms(src_tims)
    v2 = tim_norms(dst_tims)
    safe_v1 = jnp.where(v1 > 0, v1, 1.0)
    raw_scales = v2 / safe_v1
    beta = 2.0 * jnp.asarray(noise_bound, v1.dtype) * jnp.sqrt(jnp.asarray(cbar2, v1.dtype))
    alphas = beta / safe_v1
    valid = active & (v1 > 0)
    if estimator == "vote":
        scale, inliers = tls_vote(raw_scales, alphas, active=valid)
    else:
        scale, inliers = scale_consensus_1pt(
            raw_scales,
            alphas,
            key,
            active=valid,
            warm_value=warm_scale,
            use_warm=use_warm,
            max_draws=max_draws,
        )
    return scale, inliers, beta


def select_scale_inliers(
    src_tims: jax.Array,
    dst_tims: jax.Array,
    noise_bound: jax.Array | float,
    cbar2: jax.Array | float,
    active: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Known-scale (s = 1) inlier test (registration.cc:418-434):
    abs(|src_tim| - |dst_tim|) <= beta, beta = 2 * noise_bound * sqrt(cbar2).

    Returns (scale=1, inlier mask, scale_noise = beta).
    """
    if active is None:
        active = jnp.ones((src_tims.shape[1],), dtype=bool)
    v1 = tim_norms(src_tims)
    v2 = tim_norms(dst_tims)
    beta = 2.0 * jnp.asarray(noise_bound, v1.dtype) * jnp.sqrt(jnp.asarray(cbar2, v1.dtype))
    inliers = (jnp.abs(v1 - v2) <= beta) & active
    return jnp.ones((), dtype=v1.dtype), inliers, beta


class TLSScaleSolver:
    """Facade of teaser::TLSScaleSolver (registration.h:138-166)."""

    def __init__(self, noise_bound: float, cbar2: float, seed: int = 0):
        self.noise_bound = noise_bound
        self.cbar2 = cbar2
        self._key = jax.random.PRNGKey(seed)

    def solveForScale(self, src_tims, dst_tims):
        self._key, sub = jax.random.split(self._key)
        scale, inliers, _ = solve_scale_tls(
            jnp.asarray(src_tims), jnp.asarray(dst_tims),
            self.noise_bound, self.cbar2, sub,
        )
        return scale, inliers


class ScaleInliersSelector:
    """Facade of teaser::ScaleInliersSelector (registration.h:168-189)."""

    def __init__(self, noise_bound: float, cbar2: float):
        self.noise_bound = noise_bound
        self.cbar2 = cbar2

    def solveForScale(self, src_tims, dst_tims):
        scale, inliers, _ = select_scale_inliers(
            jnp.asarray(src_tims), jnp.asarray(dst_tims),
            self.noise_bound, self.cbar2,
        )
        return scale, inliers
