"""Douglas-Rachford-splitting rotation certifier — dense TPU form.

Equivalent of teaser::DRSCertifier
(/root/reference/teaser/src/certification.cc:22-671 and certification.h:53-238).
Given a rotation estimate R, TIMs (src, dst) and the TLS inlier signs theta,
it verifies global optimality of R for the QUASAR lifted-quaternion SDP by
searching for a dual certificate with DRS iterations:

  M_PSD   = Pi_PSD(M)                      (eigendecomposition clamp)
  W_dual  = Pi_dual(2 M_PSD - M - M_init)  (structure projection)
  M_aff   = M_init + W_dual
  gap     = -lambda_min(M_aff) (N+1) / mu
  M      += gamma_tau (M_aff - M_PSD)

TPU re-design notes:

- Everything is dense: the (4N+4)^2 matrices live as (N+1, N+1, 4, 4) block
  tensors for the structure projection (batched 4x4 ops) and as flat
  (4N+4, 4N+4) for the two eigendecompositions per iteration.

- The reference's sparse "linear inverse map" A_inv
  (getLinearProjection, certification.cc:538-657) collapses to a closed
  form. Writing the pair-indexed vector b as an antisymmetric matrix
  B[i, j] (= b_(i,j) for i < j), the sparse matvec A_inv @ b equals

      (x + 2y) B + y (theta R^T - R theta^T),   R_a = sum_k theta_k B[a, k]

  with y = 1/(2 N0 + 6), x = (N0 + 1) y — and x + 2y = 1/2 exactly. So the
  whole sparse build + matvec is one masked einsum (O(N^2) instead of
  O(N^2) nonzeros *constructed on host*), verified against a dense
  reconstruction of the reference's triplet rules in tests.

- The 9x16 QUASAR P matrix (vec(qq^T) -> vec(R), certification.cc:241-251)
  is derived numerically at import from the quaternion rotation formula
  (exact: entries of R are linear in vec(qq^T)), not transcribed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from psulvsb_tpu.core.linalg import hatmap, nearest_psd
from psulvsb_tpu.utils.precision import mm


# --- the QUASAR P matrix, derived numerically (see module docstring) --------


def _quat_to_rot_xyzw(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


@functools.lru_cache(maxsize=1)
def _p_matrix() -> np.ndarray:
    """vec_colmajor(R) = P @ vec_colmajor(q q^T) with q = (x, y, z, w).

    Each entry of R(q) is a homogeneous quadratic form in q (the constant of
    the quaternion formula homogenized with 1 = q.q), so it has a unique
    symmetric coefficient matrix; P distributes off-diagonal monomial
    coefficients evenly between (i, j) and (j, i) — the QUASAR convention
    (certification.cc:241-251). Derived here by exact least squares over the
    10 symmetric monomials q_i q_j (i <= j) from 40 random unit quaternions.
    """
    rng = np.random.default_rng(0)
    pairs = [(i, j) for i in range(4) for j in range(i, 4)]  # 10 monomials
    n_s = 40
    lhs = np.zeros((n_s, 10))
    rhs = np.zeros((n_s, 9))
    for s in range(n_s):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        lhs[s] = [q[i] * q[j] for (i, j) in pairs]
        rhs[s] = _quat_to_rot_xyzw(q).reshape(-1, order="F")
    coef, *_ = np.linalg.lstsq(lhs, rhs, rcond=None)  # (10, 9)
    p = np.zeros((9, 16))
    for m, (i, j) in enumerate(pairs):
        if i == j:
            p[:, 4 * j + i] = coef[m]
        else:
            p[:, 4 * j + i] += coef[m] / 2  # (i, j) slot, col-major idx
            p[:, 4 * i + j] += coef[m] / 2  # (j, i) slot
    return np.round(p, 9)


# --- result type ------------------------------------------------------------


class CertificationResult(NamedTuple):
    """Parity with teaser::CertificationResult (certification.h:30-35)."""

    is_optimal: jax.Array  # () bool
    best_suboptimality: jax.Array  # ()
    suboptimality_traj: jax.Array  # (max_iterations,), inf-padded


# --- building blocks ---------------------------------------------------------


def get_q_cost(v1: jax.Array, v2: jax.Array, noise_bound: float, cbar2: float) -> jax.Array:
    """QUASAR data matrix Q (certification.cc:233-298). v1/v2: (3, N) TIMs.
    Returns (4N+4, 4N+4)."""
    n = v1.shape[1]
    dtype = v1.dtype
    nbs = cbar2 * noise_bound * noise_bound
    p = jnp.asarray(_p_matrix(), dtype)

    # P_k = reshape_F(P^T vec_F(v2_k v1_k^T)) for all k: (N, 4, 4).
    outer = v2.T[:, :, None] * v1.T[:, None, :]  # (N, 3, 3), [k, r, c]
    vec_f = outer.transpose(0, 2, 1).reshape(n, 9)  # column-major vec
    tb = mm(vec_f, p)  # (N, 16) = P^T @ vec per k
    p_k = tb.reshape(n, 4, 4).transpose(0, 2, 1)  # reshape column-major

    sq = jnp.sum(v1 * v1, axis=0) + jnp.sum(v2 * v2, axis=0)  # (N,)
    ck1 = 0.5 * (sq - nbs)
    ck2 = 0.5 * (sq + nbs)
    eye = jnp.eye(4, dtype=dtype)

    # Block tensor (N+1, N+1, 4, 4).
    q = jnp.zeros((n + 1, n + 1, 4, 4), dtype)
    row0 = -0.5 * p_k + 0.5 * ck1[:, None, None] * eye  # blocks (0, k+1)
    q = q.at[0, 1:].set(row0)
    q = q.at[1:, 0].set(row0)  # blocks (k+1, 0), same value
    diag = -p_k + ck2[:, None, None] * eye
    q = q.at[jnp.arange(1, n + 1), jnp.arange(1, n + 1)].set(diag)
    return blocks_to_dense(q)


def blocks_to_dense(b: jax.Array) -> jax.Array:
    """(K, K, 4, 4) block tensor -> (4K, 4K)."""
    k = b.shape[0]
    return b.transpose(0, 2, 1, 3).reshape(4 * k, 4 * k)


def dense_to_blocks(m: jax.Array) -> jax.Array:
    """(4K, 4K) -> (K, K, 4, 4)."""
    k = m.shape[0] // 4
    return m.reshape(k, 4, k, 4).transpose(0, 2, 1, 3)


def rotation_to_quat_xyzw(r: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (x, y, z, w), w >= 0 branch-free
    (Shepperd's method via the 4x4 eigenvector-free formulation)."""
    # Build the Davenport-like symmetric matrix whose leading eigenvector is
    # the quaternion; for an exact rotation this is rank-deficient friendly.
    m = r
    t = jnp.trace(m)
    k4 = jnp.array(
        [
            [m[0, 0] - m[1, 1] - m[2, 2], m[0, 1] + m[1, 0], m[0, 2] + m[2, 0], m[2, 1] - m[1, 2]],
            [m[0, 1] + m[1, 0], m[1, 1] - m[0, 0] - m[2, 2], m[1, 2] + m[2, 1], m[0, 2] - m[2, 0]],
            [m[0, 2] + m[2, 0], m[1, 2] + m[2, 1], m[2, 2] - m[0, 0] - m[1, 1], m[1, 0] - m[0, 1]],
            [m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1], t],
        ],
        dtype=r.dtype,
    ) / 3.0
    _, vecs = jnp.linalg.eigh(k4)
    q = vecs[:, -1]  # (x, y, z, w)
    q = q * jnp.sign(q[3] + 1e-30)
    return q / jnp.linalg.norm(q)


def get_omega1(q_xyzw: jax.Array) -> jax.Array:
    """Left quaternion product matrix Omega_1(q) (certification.cc:301-310)."""
    x, y, z, w = q_xyzw[0], q_xyzw[1], q_xyzw[2], q_xyzw[3]
    return jnp.array(
        [
            [w, -z, y, x],
            [z, w, -x, y],
            [-y, x, w, z],
            [-x, -y, -z, w],
        ],
        dtype=q_xyzw.dtype,
    )


def apply_a_inv(b_grid: jax.Array, theta_p: jax.Array) -> jax.Array:
    """Closed-form A_inv matvec (see module docstring).

    b_grid: (K, K, d) with the pair values in the upper triangle (i < j);
    lower triangle/diagonal ignored. theta_p: (K,) in {+1, -1} (theta
    prepended with 1). Returns (K, K, d) with out(i, j) in the upper
    triangle (antisymmetric extension inside).
    """
    k = b_grid.shape[0]
    iu = jnp.triu(jnp.ones((k, k), bool), 1)
    b_anti = jnp.where(iu[:, :, None], b_grid, 0.0)
    b_anti = b_anti - b_anti.transpose(1, 0, 2)  # antisymmetric B[a, b]

    n0 = k - 1
    y = 1.0 / (2.0 * n0 + 6.0)
    rsum = jnp.einsum("k,akd->ad", theta_p, b_anti)  # R_a = sum_k t_k B[a,k]
    out = 0.5 * b_anti + y * (
        theta_p[:, None, None] * rsum[None, :, :]
        - theta_p[None, :, None] * rsum[:, None, :]
    )
    return jnp.where(iu[:, :, None], out, 0.0)


def dual_projection(w: jax.Array, theta_p: jax.Array) -> jax.Array:
    """getOptimalDualProjection (certification.cc:323-452), block-tensor form.

    w: (4K, 4K) dense; theta_p: (K,). Returns dense (4K, 4K) W_dual.
    """
    k = theta_p.shape[0]
    wb = dense_to_blocks(w)  # (K, K, 4, 4)
    iu = jnp.triu(jnp.ones((k, k), bool), 1)
    tij = theta_p[:, None] * theta_p[None, :]  # (K, K)

    # b_W(i,j) = -t_ij W[ii][3,0:3] + W[ji][3,0:3] - W[ij][3,0:3]
    #            + t_ij W[jj][3,0:3]                (certification.cc:336-379)
    d_ii = wb[jnp.arange(k), jnp.arange(k)][:, 3, 0:3]  # (K, 3)
    w_ji_last = wb.transpose(1, 0, 2, 3)[:, :, 3, 0:3]  # [i,j] -> W[j,i][3,:3]
    w_ij_last = wb[:, :, 3, 0:3]
    b_w = (
        -tij[:, :, None] * d_ii[:, None, :]
        + w_ji_last
        - w_ij_last
        + tij[:, :, None] * d_ii[None, :, :]
    )
    y_dual = apply_a_inv(b_w, theta_p)  # (K, K, 3), upper triangle

    # Off-diagonal blocks: (W_ij - W_ij^T)/2 with last col/row replaced.
    anti = (wb - wb.transpose(0, 1, 3, 2)) / 2.0
    off = anti.at[:, :, 0:3, 3].set(y_dual)
    off = off.at[:, :, 3, 0:3].set(-y_dual)
    off = jnp.where(iu[:, :, None, None], off, 0.0)
    # W_dual += W_dual^T (block transpose): block (j,i) = block (i,j)^T.
    wd = off + off.transpose(1, 0, 3, 2)

    # Diagonal blocks (certification.cc:424-440): row-sum of last columns
    # weighted by theta, then complementary-slackness last col/row, then
    # subtract the mean top-left 3x3 across the diagonal.
    # row_sum[i] = sum_j theta_j W_dual[i,j][:,3]  -> (K, 4)
    row_sum = jnp.einsum("j,ija->ia", theta_p, wd[:, :, :, 3])
    w_ii = wb[jnp.arange(k), jnp.arange(k)]  # (K, 4, 4) from W (not W_dual)
    last = -theta_p[:, None] * row_sum  # (K, 4)
    w_ii = w_ii.at[:, :, 3].set(last)
    w_ii = w_ii.at[:, 3, :].set(last)
    diag_mean33 = jnp.mean(w_ii[:, 0:3, 0:3], axis=0)
    w_ii = w_ii.at[:, 0:3, 0:3].add(-diag_mean33[None])
    wd = wd.at[jnp.arange(k), jnp.arange(k)].set(w_ii)
    return blocks_to_dense(wd)


def get_lambda_guess(
    r: jax.Array,
    theta: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    noise_bound: float,
    cbar2: float,
) -> jax.Array:
    """KKT-slackness initial dual guess (certification.cc:454-536).
    theta: (N,) in {+1,-1}. Returns dense (4N+4, 4N+4)."""
    n = src.shape[1]
    dtype = src.dtype
    nbs = cbar2 * noise_bound * noise_bound
    xi = mm(r.T, dst - mm(r, src))  # (3, N), same residual both branches

    src_hat = jax.vmap(hatmap, in_axes=1)(src)  # (N, 3, 3)
    xi_hat = jax.vmap(hatmap, in_axes=1)(xi)
    eye3 = jnp.eye(3, dtype=dtype)

    xi_sq = jnp.sum(xi * xi, axis=0)  # (N,)
    dot_sx = jnp.sum(src * xi, axis=0)
    outer_xs = xi.T[:, :, None] * src.T[:, None, :]  # (N, 3, 3)
    hh = jnp.einsum("nab,nbc->nac", src_hat, src_hat)
    xh = jnp.einsum("nab,nbc->nac", xi_hat, src_hat)
    xs_vec = jnp.einsum("nab,bn->na", xi_hat, src)  # xi_hat @ src_i, (N, 3)

    pos = theta > 0
    # (4,4) entry and 3x3 block differ between inlier/outlier branches only
    # in the 0.75/0.25 coefficients (certification.cc:484-509).
    c44 = jnp.where(pos, -0.75 * xi_sq - 0.25 * nbs, -0.25 * xi_sq - 0.75 * nbs)
    c_res = jnp.where(pos, 0.75, 0.25)[:, None, None]
    top33 = (
        hh
        - 0.5 * dot_sx[:, None, None] * eye3
        + 0.5 * xh
        + 0.5 * outer_xs
        - c_res * xi_sq[:, None, None] * eye3
        - 0.25 * nbs * eye3
    )
    vec = jnp.where(pos[:, None], -1.5 * xs_vec, -0.5 * xs_vec)  # (N, 3)

    block = jnp.zeros((n, 4, 4), dtype)
    block = block.at[:, 0:3, 0:3].set(top33)
    block = block.at[:, 3, 3].set(c44)
    block = block.at[:, 0:3, 3].set(vec)
    block = block.at[:, 3, 0:3].set(vec)

    lam = jnp.zeros((n + 1, n + 1, 4, 4), dtype)
    lam = lam.at[jnp.arange(1, n + 1), jnp.arange(1, n + 1)].set(-block)
    lam = lam.at[0, 0].set(jnp.sum(block, axis=0))
    return blocks_to_dense(lam)


def _min_eig(m: jax.Array) -> jax.Array:
    sym = (m + m.T) / 2
    return jnp.linalg.eigvalsh(sym)[0]


# --- the certifier -----------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("noise_bound", "cbar2", "max_iterations", "gamma_tau", "sub_optimality"),
)
def certify_rotation(
    r_solution: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    theta: jax.Array,
    noise_bound: float = 0.01,
    cbar2: float = 1.0,
    max_iterations: int = 200,
    gamma_tau: float = 1.999999,
    sub_optimality: float = 1e-3,
) -> CertificationResult:
    """DRS certification (certify, certification.cc:39-190).

    theta: (N,) float in {+1, -1} (TLS inlier signs) or bool.
    Defaults mirror DRSCertifier::Params (certification.h:74-101).

    The whole trace pins HIGHEST matmul precision: the gap divides eigen
    residuals by mu ~ noise^2, so TPU-default bf16 einsum/kron passes
    inflate the reported suboptimality by orders of magnitude (measured:
    a certified-optimal case reads gap ~5e2 in bf16, 0.0 in f32-HIGHEST).
    """
    with jax.default_matmul_precision("highest"):
        return _certify_rotation_body(
            r_solution, src, dst, theta, noise_bound, cbar2,
            max_iterations, gamma_tau, sub_optimality,
        )


def _certify_rotation_body(
    r_solution, src, dst, theta, noise_bound, cbar2,
    max_iterations, gamma_tau, sub_optimality,
) -> CertificationResult:
    if theta.dtype == jnp.bool_:
        theta = jnp.where(theta, 1.0, -1.0).astype(src.dtype)
    n = src.shape[1]
    dtype = src.dtype
    theta_p = jnp.concatenate([jnp.ones((1,), dtype), theta])

    q_cost = get_q_cost(src, dst, noise_bound, cbar2)
    q_vec = rotation_to_quat_xyzw(r_solution)

    # x = kron(theta_prepended, q) — the would-be rank-1 SDP solution
    # (certification.cc:74-75): x[4i + r] = theta_p[i] * q[r].
    x = (theta_p[None, :] * q_vec[:, None]).T.reshape(-1)

    omega = get_omega1(q_vec)
    k1 = n + 1
    d_omega = jnp.kron(jnp.eye(k1, dtype=dtype), omega)
    q_bar = mm(d_omega.T, mm(q_cost, d_omega))

    mu = jnp.dot(x, mm(q_cost, x))

    j_bar = jnp.zeros_like(q_cost).at[0:4, 0:4].set(jnp.eye(4, dtype=dtype))
    lambda_bar = get_lambda_guess(r_solution, theta, src, dst, noise_bound, cbar2)
    m_init = q_bar - mu * j_bar - lambda_bar

    class Carry(NamedTuple):
        m: jax.Array
        it: jax.Array
        best: jax.Array
        traj: jax.Array
        done: jax.Array

    def body(c: Carry) -> Carry:
        m_psd = nearest_psd(c.m)
        temp_w = 2.0 * m_psd - c.m - m_init
        w_dual = dual_projection(temp_w, theta_p)
        m_affine = m_init + w_dual
        min_eig = _min_eig(m_affine)
        gap = jnp.where(min_eig > 0, 0.0, (-min_eig * (n + 1)) / mu)
        best = jnp.minimum(c.best, gap)
        traj = c.traj.at[c.it].set(gap)
        done = gap < sub_optimality
        m = c.m + gamma_tau * (m_affine - m_psd)
        return Carry(m=m, it=c.it + 1, best=best, traj=traj, done=done)

    init = Carry(
        m=m_init,
        it=jnp.int32(0),
        best=jnp.asarray(jnp.inf, dtype),
        traj=jnp.full((max_iterations,), jnp.inf, dtype),
        done=jnp.zeros((), bool),
    )
    final = jax.lax.while_loop(
        lambda c: (~c.done) & (c.it < max_iterations), body, init
    )
    return CertificationResult(
        is_optimal=final.best < sub_optimality,
        best_suboptimality=final.best,
        suboptimality_traj=final.traj,
    )


class DRSCertifier:
    """Class facade mirroring teaser::DRSCertifier (certification.h:53-238)."""

    def __init__(
        self,
        noise_bound: float = 0.01,
        cbar2: float = 1.0,
        max_iterations: int = 200,
        gamma_tau: float = 1.999999,
        sub_optimality: float = 1e-3,
    ):
        self.noise_bound = float(noise_bound)
        self.cbar2 = float(cbar2)
        self.max_iterations = int(max_iterations)
        self.gamma_tau = float(gamma_tau)
        self.sub_optimality = float(sub_optimality)

    @staticmethod
    def _has_cpu() -> bool:
        try:
            return len(jax.devices("cpu")) > 0
        except RuntimeError:
            return False

    def certify(
        self,
        r_solution,
        src,
        dst,
        theta,
        polish: bool = False,
        device: str = "auto",
    ) -> CertificationResult:
        """Certification needs ~1e-8 eigenvalue resolution (the gap divides
        -lambda_min by mu ~ noise^2), beyond f32; the accurate path runs in
        f64 like the reference's Eigen path. This is a verification step,
        not the solve hot path — latency is non-critical.

        device: "cpu" pins the f64 path to the host CPU (TPUs have no f64
        ALUs — like the reference's Eigen certifier running on the CPU next
        to any GPU solver); "device" runs certify_rotation in f32 on the
        session's default backend (TPU under jit — all-dense eigh +
        projections, SURVEY.md §7.8); "auto" prefers f64-CPU when a host CPU
        exists, else the on-device f32 path.

        f32 accuracy (measured on the reference's certification_{small,large}
        MATLAB fixture cases, tests/test_certify.py::TestDeviceF32Parity):
        `is_optimal` agrees with f64 on every shipped case, and
        `best_suboptimality` agrees within 2e-2 absolute (CPU-f32) /
        5e-4 (real TPU f32, 2026-08-17: gaps {0, 0, 1.2e-5, 3.5e-6,
        8.0e-3} vs f64 {0, 8e-13, 1.5e-13, 0, 7.6e-3}). The f32 eigensolve
        floors the observable gap near ~1e-5-1e-2 depending on mu ~ noise^2;
        sub_optimality thresholds below that floor — and exactly-noiseless
        inputs, where mu -> 0 amplifies eigh error unboundedly — are only
        meaningful on the f64 path."""
        import contextlib

        cpu_devices = jax.devices("cpu") if self._has_cpu() else []
        if device not in ("auto", "cpu", "device"):
            raise ValueError(f"device must be auto/cpu/device, got {device!r}")
        use_f32_device = device == "device" or (device == "auto" and not cpu_devices)
        if use_f32_device:
            theta_np = np.asarray(theta)
            if theta_np.dtype == np.bool_:
                theta_np = np.where(theta_np, 1.0, -1.0)
            r32 = jnp.asarray(np.asarray(r_solution), jnp.float32)
            src32 = jnp.asarray(np.asarray(src), jnp.float32)
            dst32 = jnp.asarray(np.asarray(dst), jnp.float32)
            if polish:
                from psulvsb_tpu.core.linalg import svd_rot

                r32 = svd_rot(
                    src32, dst32, jnp.asarray(theta_np > 0, jnp.float32)
                )
            return certify_rotation(
                r32, src32, dst32, jnp.asarray(theta_np, jnp.float32),
                noise_bound=self.noise_bound,
                cbar2=self.cbar2,
                max_iterations=self.max_iterations,
                gamma_tau=self.gamma_tau,
                sub_optimality=self.sub_optimality,
            )

        dev_ctx = (
            jax.default_device(cpu_devices[0])
            if cpu_devices
            else contextlib.nullcontext()
        )
        with dev_ctx, jax.enable_x64(True):
            r64 = jnp.asarray(np.asarray(r_solution), jnp.float64)
            # Bool masks (the reference's primary overload,
            # certification.cc:23, and what gnc/fgr inlier outputs are) must
            # become TLS signs {+1, -1} — a plain float cast would yield
            # {1, 0} and certify a different problem (outlier lanes zeroed
            # out of x, mu, and every projection).
            theta_np = np.asarray(theta)
            if theta_np.dtype == np.bool_:
                theta_np = np.where(theta_np, 1.0, -1.0)
            if polish:
                # Opt-in: certify the f64-polished local optimum instead of
                # the raw estimate. The main solver runs in f32 on TPU; an
                # f32 rotation carries ~1e-7 orientation error, which the gap
                # formula amplifies by 1/mu past the 1e-3 certificate
                # threshold. One f64 weighted Procrustes step on the
                # theta-positive set re-centers the solution. NOTE: with
                # polish=True the certificate speaks for the polished
                # rotation, not the one passed in.
                from psulvsb_tpu.core.linalg import svd_rot

                w64 = jnp.asarray(theta_np > 0, jnp.float64)
                r64 = svd_rot(
                    jnp.asarray(np.asarray(src), jnp.float64),
                    jnp.asarray(np.asarray(dst), jnp.float64),
                    w64,
                )
            return certify_rotation(
                r64,
                jnp.asarray(np.asarray(src), jnp.float64),
                jnp.asarray(np.asarray(dst), jnp.float64),
                jnp.asarray(theta_np, jnp.float64),
                noise_bound=self.noise_bound,
                cbar2=self.cbar2,
                max_iterations=self.max_iterations,
                gamma_tau=self.gamma_tau,
                sub_optimality=self.sub_optimality,
            )
