"""GNC-TLS rotation solver as a `lax.while_loop` with explicit carry.

Equivalent of GNCTLSRotationSolver::solveForRotation
(/root/reference/teaser/src/registration.cc:1563-1692), including the
PSULVSB modifications:
- warm start: the first iteration uses `warm_rotation` instead of the
  weighted Procrustes solve when `use_warm` (registration.cc:1617-1621 —
  gated there by the `first_time`/`rotation_last_best` globals);
- inliers: weight >= 0.5, with an all-inliers fail-safe when at most 10
  survive (registration.cc:1676-1691).

Loop-carried state replaces the reference's mutable locals; padded columns
carry zero weight so they contribute to neither the Procrustes correlation
nor the cost/threshold updates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from psulvsb_tpu.core.linalg import svd_rot
from psulvsb_tpu.utils.precision import mm


class GNCResult(NamedTuple):
    rotation: jax.Array  # (3, 3)
    inliers: jax.Array  # (N,) bool
    weights: jax.Array  # (N,)
    cost: jax.Array  # ()
    iterations: jax.Array  # ()


class _Carry(NamedTuple):
    i: jax.Array
    rotation: jax.Array
    weights: jax.Array
    mu: jax.Array
    prev_cost: jax.Array
    cost: jax.Array
    done: jax.Array


def gnc_tls_rotation(
    src: jax.Array,
    dst: jax.Array,
    noise_bound: jax.Array | float,
    active: jax.Array | None = None,
    max_iterations: int = 100,
    gnc_factor: float = 1.4,
    cost_threshold: float = 1e-6,
    warm_rotation: jax.Array | None = None,
    use_warm: jax.Array | bool = False,
    rot_method: str = "eigh",
) -> GNCResult:
    """Graduated non-convexity TLS rotation estimation on (3, N) TIMs.

    Iterates {weighted Procrustes; closed-form TLS weight update; mu *= gnc_factor}
    until |cost - prev_cost| < cost_threshold or max_iterations. Replicates
    the degenerate-mu early break (mu <= 0 at init, registration.cc:1634-1638)
    and the noise_bound_sq floor of 1e-2 when below 1e-16
    (registration.cc:1592-1595).
    """
    n = src.shape[1]
    dtype = src.dtype
    if active is None:
        active = jnp.ones((n,), dtype=bool)
    act_f = active.astype(dtype)
    use_warm = jnp.asarray(use_warm)
    if warm_rotation is None:
        warm_rotation = jnp.eye(3, dtype=dtype)

    nb_sq = jnp.square(jnp.asarray(noise_bound, dtype))
    nb_sq = jnp.where(nb_sq < 1e-16, 1e-2, nb_sq)

    def residuals_sq(rotation):
        diff = dst - mm(rotation, src)
        return jnp.sum(diff * diff, axis=0)

    def body(c: _Carry) -> _Carry:
        solved = svd_rot(src, dst, c.weights * act_f, method=rot_method)
        # Warm start applies only on iteration 0 when requested.
        rotation = jnp.where((c.i == 0) & use_warm, warm_rotation, solved)

        r_sq = residuals_sq(rotation)
        # mu initialization on the first iteration (registration.cc:1628-1638).
        max_res = jnp.max(jnp.where(active, r_sq, -jnp.inf))
        mu_init = 1.0 / (2.0 * max_res / nb_sq - 1.0)
        mu = jnp.where(c.i == 0, mu_init, c.mu)
        degenerate = (c.i == 0) & (mu <= 0)

        th1 = (mu + 1.0) / mu * nb_sq
        th2 = mu / (mu + 1.0) * nb_sq
        # Cost uses the PREVIOUS weights (registration.cc:1645-1648).
        cost = jnp.sum(c.weights * r_sq * act_f)
        w_mid = jnp.sqrt(nb_sq * mu * (mu + 1.0) / jnp.maximum(r_sq, 1e-30)) - mu
        new_w = jnp.where(
            r_sq >= th1, 0.0, jnp.where(r_sq <= th2, 1.0, jnp.clip(w_mid, 0.0, 1.0))
        )
        new_w = new_w * act_f

        cost_diff = jnp.abs(cost - c.prev_cost)
        converged = cost_diff < cost_threshold
        done = degenerate | converged

        # On the degenerate break the reference exits before updating
        # weights/cost; keep the prior values in that case.
        new_w = jnp.where(degenerate, c.weights, new_w)
        cost = jnp.where(degenerate, c.cost, cost)
        return _Carry(
            i=c.i + 1,
            rotation=rotation,
            weights=new_w,
            mu=mu * gnc_factor,
            prev_cost=jnp.where(degenerate, c.prev_cost, cost),
            cost=cost,
            done=done,
        )

    init = _Carry(
        i=jnp.zeros((), jnp.int32),
        rotation=jnp.eye(3, dtype=dtype),
        weights=act_f,
        mu=jnp.ones((), dtype),
        prev_cost=jnp.asarray(jnp.inf, dtype),
        cost=jnp.asarray(jnp.inf, dtype),
        done=jnp.zeros((), bool),
    )
    final = jax.lax.while_loop(
        lambda c: (~c.done) & (c.i < max_iterations), body, init
    )

    inliers = (final.weights >= 0.5) & active
    count = jnp.sum(inliers)
    # Fail-safe: <= 10 surviving inliers -> all active columns are inliers
    # (registration.cc:1685-1690).
    inliers = jnp.where(count <= 10, active, inliers)
    return GNCResult(
        rotation=final.rotation,
        inliers=inliers,
        weights=final.weights,
        cost=final.cost,
        iterations=final.i,
    )


class GNCTLSRotationSolver:
    """Facade of teaser::GNCTLSRotationSolver (registration.h:267-295)."""

    def __init__(self, noise_bound: float = 0.01, cost_threshold: float = 1e-6,
                 gnc_factor: float = 1.4, max_iterations: int = 100):
        self.noise_bound = noise_bound
        self.cost_threshold = cost_threshold
        self.gnc_factor = gnc_factor
        self.max_iterations = max_iterations

    def solveForRotation(self, src, dst, warm_rotation=None):
        res = gnc_tls_rotation(
            jnp.asarray(src), jnp.asarray(dst), self.noise_bound,
            max_iterations=self.max_iterations, gnc_factor=self.gnc_factor,
            cost_threshold=self.cost_threshold,
            warm_rotation=None if warm_rotation is None else jnp.asarray(warm_rotation),
            use_warm=warm_rotation is not None,
        )
        return res.rotation, res.inliers
