"""Pallas whole-GNC kernel: the full graduated-non-convexity reweighting
loop, VMEM-resident, for a batch of hypotheses in one kernel launch.

The GNC-TLS rotation solver (rotation/gnc.py, equivalent of
registration.cc:1563-1692) iterates up to 100 times; as XLA ops under a
vmapped `lax.while_loop` every iteration costs a dozen small kernel
launches, which dominates single-pair latency (~16 ms per local round
measured at C=1889). Here the entire loop — weighted Procrustes via the
Davenport quaternion (matrix-squaring power iteration), residuals, TLS
weight update, convergence bookkeeping — runs inside ONE Pallas kernel with
all state in VMEM.

Mosaic constraints shaped the layout (probed on this toolchain):
- hypotheses live on the LANE axis: data arrays are (N, B), per-hypothesis
  scalars are (1, B); the only broadcast used is (1, B) -> (N, B)
  (supported), never lane broadcasts or broadcasts into non-tile-aligned
  (9, B)/(16, B) shapes (unsupported "Sublane broadcast");
- every small per-hypothesis matrix (the 3x3 correlation, 4x4 Davenport,
  rotation) is a PYTHON LIST of (1, B) rows — all small math is same-shape
  (1, B) vector ops, no relayouts;
- conditional updates are arithmetic blends with float {0, 1} flags
  (select_n with narrow masks is unsupported).

Numerics match rotation/gnc.py (same update rules, warm start,
degenerate-mu break, cost-uses-previous-weights convention); parity is
tested in tests/test_pallas_ops.py. Interpret mode serves non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mat4_mul(a: list, b: list) -> list:
    """4x4 matmul on lists of 16 (1, B) row-major entries."""
    out = []
    for i in range(4):
        for j in range(4):
            acc = a[4 * i] * b[j]
            for m in range(1, 4):
                acc = acc + a[4 * i + m] * b[4 * m + j]
            out.append(acc)
    return out


def _davenport_from_h(h: list) -> list:
    """h: list of 9 (1, B) row-major correlation entries. Returns the
    Davenport K as a list of 16 (1, B) entries (core/linalg.
    _davenport_matrix, rows/cols in (w, x, y, z) order)."""
    sxx, sxy, sxz, syx, syy, syz, szx, szy, szz = h
    return [
        sxx + syy + szz, syz - szy, szx - sxz, sxy - syx,
        syz - szy, sxx - syy - szz, sxy + syx, szx + sxz,
        szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy,
        sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz,
    ]


def _quat_to_r9(q: list) -> list:
    """q: list of 4 (1, B) entries (w, x, y, z) -> list of 9 row-major
    rotation entries."""
    w, x, y, z = q
    return [
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ]


def _rot_from_h9(h: list) -> list:
    """Proper rotation from a 9-entry correlation list via shifted
    matrix-squaring power iteration on the Davenport matrix
    (core/linalg.rot_from_correlation method='power')."""
    k = _davenport_from_h(h)
    h_sq = h[0] * h[0]
    for e in h[1:]:
        h_sq = h_sq + e * e
    shift = 2.0 * jnp.sqrt(h_sq) + 1e-12
    ks = [k[i] + shift if i % 5 == 0 else k[i] for i in range(16)]
    for _ in range(5):
        ks = _mat4_mul(ks, ks)
        nrm = ks[0] * ks[0]
        for e in ks[1:]:
            nrm = nrm + e * e
        inv = 1.0 / (jnp.sqrt(nrm) + 1e-30)
        ks = [e * inv for e in ks]
    # q = largest-norm column of the converged Ks (rank-1 lambda*v*v^T, so
    # that column is a scaled dominant eigenvector v whatever its
    # orientation; a fixed all-ones probe collapses for 180-degree
    # rotations where v sums to ~0 — mirrors core/linalg.py 'power').
    # Branchless column select: Mosaic has no gather here.
    col_n = [
        ks[c] * ks[c] + ks[4 + c] * ks[4 + c]
        + ks[8 + c] * ks[8 + c] + ks[12 + c] * ks[12 + c]
        for c in range(4)
    ]
    best_n = col_n[0]
    q = [ks[0], ks[4], ks[8], ks[12]]
    for c in range(1, 4):
        take = jnp.where(col_n[c] > best_n, 1.0, 0.0)
        q = [take * ks[4 * i + c] + (1.0 - take) * q[i] for i in range(4)]
        best_n = jnp.maximum(col_n[c], best_n)
    qn = q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]
    inv = 1.0 / (jnp.sqrt(qn) + 1e-30)
    q = [e * inv for e in q]
    return _quat_to_r9(q)


def _make_kernel(max_iterations: int, gnc_factor: float, cost_threshold: float):
    def kernel(src_ref, dst_ref, act_ref, nbsq_ref, warm_ref, uw_ref,
               rot_ref, w_ref):
        s = [src_ref[0], src_ref[1], src_ref[2]]  # each (N, B)
        d = [dst_ref[0], dst_ref[1], dst_ref[2]]
        act = act_ref[:]  # (N, B) float {0, 1}
        # nbsq arrives pre-broadcast to (N, B): per-hypothesis scalars are
        # carried at full shape so every op in the loop is same-shape — the
        # only narrow values are the reduction-born (1, B) rotation entries
        # (mixing narrow input-ref/carry layouts trips Mosaic's
        # unimplemented sublane-broadcast relayout).
        nbsq = nbsq_ref[:]  # (N, B)
        use_warm_f = jnp.where(uw_ref[0] != 0, 1.0, 0.0)  # scalar
        # Warm rotation entries arrive as SMEM scalars (shared across the
        # batch); scalar * vector ops are layout-neutral.
        ones_1b = jnp.sum(act * 0.0, axis=0, keepdims=True) + 1.0  # (1, B)
        warm = [warm_ref[i] * ones_1b for i in range(9)]  # 9 x (1, B)
        full = act * 0.0  # (N, B) zeros for fresh broadcasts

        big = jnp.float32(3.0e38)

        def residuals_sq(r):
            out = None
            for i in range(3):
                e = d[i] - (r[3 * i] * s[0] + r[3 * i + 1] * s[1] + r[3 * i + 2] * s[2])
                out = e * e if out is None else out + e * e
            return out  # (N, B)

        def solve_rotation(w):
            wa = w * act
            h = [
                jnp.sum(wa * s[a] * d[b], axis=0, keepdims=True)
                for a in range(3)
                for b in range(3)
            ]  # 9 x (1, B), row-major S_ab
            return _rot_from_h9(h)

        def body(state):
            i, r9, w, mu, prev_cost, done_f = state
            solved = solve_rotation(w)
            first_f = jnp.where(i == 0, 1.0, 0.0)  # scalar
            warm_f = first_f * use_warm_f
            r_new = [warm_f * warm[k] + (1.0 - warm_f) * solved[k] for k in range(9)]

            r_sq = residuals_sq(r_new)
            # mu init on iteration 0 (registration.cc:1628-1638). All
            # per-hypothesis scalars live at (N, B) (rows replicated).
            masked = r_sq * act - big * (1.0 - act)
            max_res = (
                jnp.broadcast_to(jnp.max(masked, axis=0, keepdims=True), act.shape)
                + full
            )  # (N, B)
            mu_init = 1.0 / (2.0 * max_res / nbsq - 1.0)
            mu_new = first_f * mu_init + (1.0 - first_f) * mu
            degen_f = first_f * jnp.where(mu_new <= 0, 1.0, 0.0)  # (N, B)

            th1 = (mu_new + 1.0) / mu_new * nbsq  # (N, B)
            th2 = mu_new / (mu_new + 1.0) * nbsq
            cost = (
                jnp.broadcast_to(
                    jnp.sum(w * r_sq * act, axis=0, keepdims=True), act.shape
                )
                + full
            )  # (N, B)
            w_mid = jnp.sqrt(
                nbsq * mu_new * (mu_new + 1.0) / jnp.maximum(r_sq, 1e-30)
            ) - mu_new
            w_new = jnp.where(
                r_sq >= th1,
                0.0,
                jnp.where(r_sq <= th2, 1.0, jnp.clip(w_mid, 0.0, 1.0)),
            ) * act

            conv_f = jnp.where(
                jnp.abs(cost - prev_cost) < cost_threshold, 1.0, 0.0
            )  # (N, B)
            done_new = jnp.minimum(done_f + degen_f + conv_f, 1.0)

            # Freeze state for hypotheses that were already done. The
            # rotation rows are (1, B): blend them with a reduction-born
            # (1, B) flag so the carry type stays narrow.
            live = 1.0 - done_f
            done_1b = jnp.max(done_f, axis=0, keepdims=True)
            live_1b = 1.0 - done_1b
            r_out = [done_1b * r9[k] + live_1b * r_new[k] for k in range(9)]
            w_keep = jnp.minimum(done_f + degen_f, 1.0)
            w_out = w_keep * w + (1.0 - w_keep) * w_new
            mu_out = done_f * mu + live * (mu_new * gnc_factor)
            pc_out = done_f * prev_cost + live * cost
            return i + 1, r_out, w_out, mu_out, pc_out, done_new

        def cond(state):
            i, _, _, _, _, done_f = state
            return jnp.logical_and(i < max_iterations, jnp.min(done_f) < 0.5)

        n, b = act.shape
        ident = [
            (jnp.ones((1, b), jnp.float32) if i % 4 == 0
             else jnp.zeros((1, b), jnp.float32))
            for i in range(9)
        ]
        init = (
            jnp.int32(0),
            ident,
            act,
            jnp.ones((n, b), jnp.float32),
            jnp.full((n, b), big, jnp.float32),
            jnp.zeros((n, b), jnp.float32),
        )
        _, r9, w, _, _, _ = jax.lax.while_loop(cond, body, init)
        for k in range(9):
            rot_ref[k : k + 1, :] = r9[k]
        w_ref[:] = w

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "gnc_factor", "cost_threshold", "interpret"),
)
def gnc_batch_pallas(
    src: jax.Array,  # (3, N, B)
    dst: jax.Array,  # (3, N, B)
    act: jax.Array,  # (N, B) float {0,1}
    nb_sq: jax.Array,  # (N, B), per-hypothesis value replicated over rows
    warm_r9: jax.Array,  # (9,) — shared across the batch, passed via SMEM
    use_warm: jax.Array,  # () bool
    max_iterations: int = 100,
    gnc_factor: float = 1.4,
    cost_threshold: float = 0.005,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (rotations (9, B) row-major, weights (N, B))."""
    n, b = act.shape
    kernel = _make_kernel(max_iterations, gnc_factor, cost_threshold)
    rot, w = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((9, b), jnp.float32),
            jax.ShapeDtypeStruct((n, b), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
        warm_r9.astype(jnp.float32).reshape(9),
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
    n = active_b.shape[1]
    nb_sq = jnp.square(noise_bound_b)[None, :]  # (1, B)
    nb_sq = jnp.where(nb_sq < 1e-16, 1e-2, nb_sq)
    nb_sq = jnp.broadcast_to(nb_sq, (n, b))
    warm9 = warm_rotation.reshape(-1)
    interpret = jax.default_backend() != "tpu"
    rot9, w = gnc_batch_pallas(
        src_tims_b.transpose(1, 2, 0),  # (3, N, B)
        dst_tims_b.transpose(1, 2, 0),
        active_b.astype(jnp.float32).T,  # (N, B)
        nb_sq,
        warm9,
        use_warm,
        max_iterations=max_iterations,
        gnc_factor=gnc_factor,
        cost_threshold=cost_threshold,
        interpret=interpret,
    )
    rotations = rot9.T.reshape(b, 3, 3)
    inliers = (w.T >= 0.5) & active_b
    count = jnp.sum(inliers, axis=1, keepdims=True)
    inliers = jnp.where(count <= 10, active_b, inliers)
    return rotations, inliers
