"""Pallas whole-GNC kernel: the full graduated-non-convexity reweighting
loop, VMEM-resident, for a batch of hypotheses in one kernel launch.

The GNC-TLS rotation solver (rotation/gnc.py, equivalent of
registration.cc:1563-1692) iterates up to 100 times; as XLA ops under a
vmapped `lax.while_loop` every iteration costs a dozen small kernel
launches, which dominates single-pair latency (~16 ms per local round
measured at C=1889). Here the entire loop — weighted Procrustes via the
Davenport quaternion (matrix-squaring power iteration), residuals, TLS
weight update, convergence bookkeeping — runs inside ONE Pallas kernel with
all state in VMEM. Per-hypothesis state is laid out as (B, N) / (B, 1)
arrays so every instruction is a full VPU vector op across the hypothesis
batch.

Numerics match rotation/gnc.py (same update rules, warm start, degenerate-mu
break, cost-uses-previous-weights convention); parity is tested in
tests/test_pallas_ops.py. Interpret mode serves non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mat4_mul(a, b):
    """4x4 matmul on (B, 16) row-major scalar-vector entries."""
    out = []
    for i in range(4):
        for j in range(4):
            acc = a[:, 4 * i : 4 * i + 1] * b[:, j : j + 1]
            for m in range(1, 4):
                acc = acc + a[:, 4 * i + m : 4 * i + m + 1] * b[:, 4 * m + j : 4 * m + j + 1]
            out.append(acc)
    return jnp.concatenate(out, axis=1)


def _davenport_from_h(h):
    """h: (B, 9) row-major correlation S. Returns Davenport K as (B, 16)
    (core/linalg._davenport_matrix, rows/cols in (w, x, y, z) order)."""
    sxx, sxy, sxz = h[:, 0:1], h[:, 1:2], h[:, 2:3]
    syx, syy, syz = h[:, 3:4], h[:, 4:5], h[:, 5:6]
    szx, szy, szz = h[:, 6:7], h[:, 7:8], h[:, 8:9]
    k = [
        sxx + syy + szz, syz - szy, szx - sxz, sxy - syx,
        syz - szy, sxx - syy - szz, sxy + syx, szx + sxz,
        szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy,
        sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz,
    ]
    return jnp.concatenate(k, axis=1)


def _quat_to_r9(q):
    """q: (B, 4) = (w, x, y, z) -> (B, 9) row-major rotation."""
    w, x, y, z = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
    return jnp.concatenate(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=1,
    )


def _rot_from_h9(h):
    """Proper rotation from (B, 9) correlation via shifted matrix-squaring
    power iteration on the Davenport matrix (core/linalg.rot_from_correlation
    method='power')."""
    k = _davenport_from_h(h)
    h_norm = jnp.sqrt(jnp.sum(h * h, axis=1, keepdims=True))
    shift = 2.0 * h_norm + 1e-12
    eye16 = jnp.concatenate(
        [(1.0 if i % 5 == 0 else 0.0) * jnp.ones_like(shift) for i in range(16)],
        axis=1,
    )
    ks = k + shift * eye16
    for _ in range(5):
        ks = _mat4_mul(ks, ks)
        ks = ks / (jnp.sqrt(jnp.sum(ks * ks, axis=1, keepdims=True)) + 1e-30)
    # q = Ks @ (0.5, 0.5, 0.5, 0.5)
    q = jnp.concatenate(
        [
            0.5 * (ks[:, 4 * i : 4 * i + 1] + ks[:, 4 * i + 1 : 4 * i + 2]
                   + ks[:, 4 * i + 2 : 4 * i + 3] + ks[:, 4 * i + 3 : 4 * i + 4])
            for i in range(4)
        ],
        axis=1,
    )
    q = q / (jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True)) + 1e-30)
    return _quat_to_r9(q)


def _make_kernel(max_iterations: int, gnc_factor: float, cost_threshold: float):
    def kernel(src_ref, dst_ref, act_ref, nbsq_ref, warm_ref, uw_ref,
               rot_ref, w_ref):
        s0, s1, s2 = src_ref[0], src_ref[1], src_ref[2]  # (B, N)
        d0, d1, d2 = dst_ref[0], dst_ref[1], dst_ref[2]
        act = act_ref[:]  # (B, N) float {0, 1}
        nbsq = nbsq_ref[:]  # (B, 1)
        use_warm = uw_ref[0] != 0
        warm = warm_ref[:]  # (B, 9)

        big = jnp.float32(3.0e38)

        def rot_apply(r9, i):
            return (
                r9[:, 3 * i : 3 * i + 1] * s0
                + r9[:, 3 * i + 1 : 3 * i + 2] * s1
                + r9[:, 3 * i + 2 : 3 * i + 3] * s2
            )

        def residuals_sq(r9):
            e0 = d0 - rot_apply(r9, 0)
            e1 = d1 - rot_apply(r9, 1)
            e2 = d2 - rot_apply(r9, 2)
            return e0 * e0 + e1 * e1 + e2 * e2  # (B, N)

        def solve_rotation(w):
            wa = w * act
            h = jnp.concatenate(
                [
                    jnp.sum(wa * sa * db, axis=1, keepdims=True)
                    for sa in (s0, s1, s2)
                    for db in (d0, d1, d2)
                ],
                axis=1,
            )  # (B, 9) row-major S_ab
            return _rot_from_h9(h)

        def body(state):
            i, r9, w, mu, prev_cost, done = state
            solved = solve_rotation(w)
            first = i == 0
            r_new = jnp.where(jnp.logical_and(first, use_warm), warm, solved)

            r_sq = residuals_sq(r_new)
            # mu init on iteration 0 (registration.cc:1628-1638).
            max_res = jnp.max(jnp.where(act > 0, r_sq, -big), axis=1, keepdims=True)
            mu_init = 1.0 / (2.0 * max_res / nbsq - 1.0)
            mu_new = jnp.where(first, mu_init, mu)
            degenerate = jnp.logical_and(first, mu_new <= 0)

            th1 = (mu_new + 1.0) / mu_new * nbsq
            th2 = mu_new / (mu_new + 1.0) * nbsq
            cost = jnp.sum(w * r_sq * act, axis=1, keepdims=True)
            w_mid = jnp.sqrt(nbsq * mu_new * (mu_new + 1.0) / jnp.maximum(r_sq, 1e-30)) - mu_new
            w_new = jnp.where(
                r_sq >= th1, 0.0, jnp.where(r_sq <= th2, 1.0, jnp.clip(w_mid, 0.0, 1.0))
            ) * act

            converged = jnp.abs(cost - prev_cost) < cost_threshold
            done_new = jnp.logical_or(done, jnp.logical_or(degenerate, converged))

            # Freeze state for hypotheses that were already done.
            r_out = jnp.where(done, r9, r_new)
            w_out = jnp.where(done, w, jnp.where(degenerate, w, w_new))
            mu_out = jnp.where(done, mu, mu_new * gnc_factor)
            pc_out = jnp.where(done, prev_cost, cost)
            return i + 1, r_out, w_out, mu_out, pc_out, done_new

        def cond(state):
            i, _, _, _, _, done = state
            return jnp.logical_and(i < max_iterations, jnp.logical_not(jnp.all(done)))

        b, n = act.shape
        init = (
            jnp.int32(0),
            jnp.concatenate(
                [jnp.ones((b, 1), jnp.float32) if i % 4 == 0 else jnp.zeros((b, 1), jnp.float32)
                 for i in range(9)],
                axis=1,
            ),  # identity rows
            act,
            jnp.ones((b, 1), jnp.float32),
            jnp.full((b, 1), big, jnp.float32),
            jnp.zeros((b, 1), bool),
        )
        _, r9, w, _, _, _ = jax.lax.while_loop(cond, body, init)
        rot_ref[:] = r9
        w_ref[:] = w

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "gnc_factor", "cost_threshold", "interpret"),
)
def gnc_batch_pallas(
    src: jax.Array,  # (3, B, N)
    dst: jax.Array,  # (3, B, N)
    act: jax.Array,  # (B, N) float {0,1}
    nb_sq: jax.Array,  # (B, 1)
    warm_r9: jax.Array,  # (B, 9)
    use_warm: jax.Array,  # () bool
    max_iterations: int = 100,
    gnc_factor: float = 1.4,
    cost_threshold: float = 0.005,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (rotations (B, 9) row-major, weights (B, N))."""
    b, n = act.shape
    kernel = _make_kernel(max_iterations, gnc_factor, cost_threshold)
    rot, w = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, 9), jnp.float32),
            jax.ShapeDtypeStruct((b, n), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        src.astype(jnp.float32),
        dst.astype(jnp.float32),
        act.astype(jnp.float32),
        nb_sq.astype(jnp.float32),
        warm_r9.astype(jnp.float32),
        jnp.asarray(use_warm, jnp.int32).reshape(1),
    )
    return rot, w


def gnc_batch(
    src_tims_b: jax.Array,  # (B, 3, N)
    dst_tims_b: jax.Array,  # (B, 3, N)
    active_b: jax.Array,  # (B, N) bool
    noise_bound_b: jax.Array,  # (B,)
    warm_rotation: jax.Array,  # (3, 3), shared warm start
    use_warm: jax.Array,  # () bool
    max_iterations: int,
    gnc_factor: float,
    cost_threshold: float,
) -> tuple[jax.Array, jax.Array]:
    """Batch GNC-TLS front door. Returns (rotations (B, 3, 3),
    inliers (B, N) bool) with the reference's weight >= 0.5 rule and the
    <= 10-inlier fail-safe (registration.cc:1676-1691)."""
    b = active_b.shape[0]
    nb_sq = jnp.square(noise_bound_b)[:, None]
    nb_sq = jnp.where(nb_sq < 1e-16, 1e-2, nb_sq)
    warm9 = jnp.broadcast_to(warm_rotation.reshape(-1), (b, 9))
    interpret = jax.default_backend() != "tpu"
    rot9, w = gnc_batch_pallas(
        src_tims_b.transpose(1, 0, 2),
        dst_tims_b.transpose(1, 0, 2),
        active_b.astype(jnp.float32),
        nb_sq,
        warm9,
        use_warm,
        max_iterations=max_iterations,
        gnc_factor=gnc_factor,
        cost_threshold=cost_threshold,
        interpret=interpret,
    )
    rotations = rot9.reshape(b, 3, 3)
    inliers = (w >= 0.5) & active_b
    count = jnp.sum(inliers, axis=1, keepdims=True)
    inliers = jnp.where(count <= 10, active_b, inliers)
    return rotations, inliers
