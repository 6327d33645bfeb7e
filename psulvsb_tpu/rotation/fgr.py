"""Fast Global Registration rotation-only solver.

Equivalent of FastGlobalRegistrationSolver::solveForRotation
(/root/reference/teaser/src/registration.cc:322-394) — stock TEASER, kept
for API parity: Geman-McClure line processes l_pq, weighted Procrustes,
mu /= gnc_factor per iteration, stop when cost < cost_threshold or
mu < 1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from psulvsb_tpu.core.linalg import svd_rot
from psulvsb_tpu.utils.precision import mm
from psulvsb_tpu.core.metrics import calculate_diameter


class FGRResult(NamedTuple):
    rotation: jax.Array
    inliers: jax.Array
    weights: jax.Array
    cost: jax.Array
    iterations: jax.Array


class _Carry(NamedTuple):
    i: jax.Array
    rotation: jax.Array
    l_pq: jax.Array
    mu: jax.Array
    cost: jax.Array
    done: jax.Array


def fgr_rotation(
    src: jax.Array,
    dst: jax.Array,
    noise_bound: jax.Array | float,
    active: jax.Array | None = None,
    max_iterations: int = 100,
    gnc_factor: float = 1.4,
    cost_threshold: float = 1e-6,
    rot_method: str = "eigh",
) -> FGRResult:
    n = src.shape[1]
    dtype = src.dtype
    if active is None:
        active = jnp.ones((n,), dtype=bool)
    act_f = active.astype(dtype)

    nb_sq = jnp.square(jnp.asarray(noise_bound, dtype))
    # mu init from the larger point-set diameter (registration.cc:339-344).
    global_scale = jnp.maximum(
        calculate_diameter(src, active), calculate_diameter(dst, active)
    ) / nb_sq
    mu0 = jnp.square(global_scale) / nb_sq

    def body(c: _Carry) -> _Carry:
        scaled_mu = c.mu * nb_sq
        diff = dst - mm(c.rotation, src)
        r_sq = jnp.sum(diff * diff, axis=0)
        l_pq = jnp.square(scaled_mu / (scaled_mu + r_sq)) * act_f
        rotation = svd_rot(src, dst, l_pq, method=rot_method)
        diff2 = dst - mm(rotation, src)
        d_sq = jnp.sum(diff2 * diff2, axis=0)
        cost = jnp.sum((scaled_mu * d_sq) / (scaled_mu + d_sq) * act_f)
        done = (cost < cost_threshold) | (c.mu < 1.0)
        return _Carry(
            i=c.i + 1,
            rotation=rotation,
            l_pq=l_pq,
            mu=jnp.where(done, c.mu, c.mu / gnc_factor),
            cost=cost,
            done=done,
        )

    init = _Carry(
        i=jnp.zeros((), jnp.int32),
        rotation=jnp.eye(3, dtype=dtype),
        l_pq=act_f,
        mu=mu0,
        cost=jnp.asarray(jnp.inf, dtype),
        done=jnp.zeros((), bool),
    )
    final = jax.lax.while_loop(
        lambda c: (~c.done) & (c.i < max_iterations), body, init
    )
    # Reference casts l_pq to bool for the inlier mask (registration.cc:391-393).
    inliers = (final.l_pq > 0) & active
    return FGRResult(
        rotation=final.rotation,
        inliers=inliers,
        weights=final.l_pq,
        cost=final.cost,
        iterations=final.i,
    )


class FastGlobalRegistrationSolver:
    """Facade of teaser::FastGlobalRegistrationSolver (registration.h:222-265)."""

    def __init__(self, noise_bound: float = 0.01, cost_threshold: float = 1e-6,
                 gnc_factor: float = 1.4, max_iterations: int = 100):
        self.noise_bound = noise_bound
        self.cost_threshold = cost_threshold
        self.gnc_factor = gnc_factor
        self.max_iterations = max_iterations

    def solveForRotation(self, src, dst):
        res = fgr_rotation(
            jnp.asarray(src), jnp.asarray(dst), self.noise_bound,
            max_iterations=self.max_iterations, gnc_factor=self.gnc_factor,
            cost_threshold=self.cost_threshold,
        )
        return res.rotation, res.inliers
