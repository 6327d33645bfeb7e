"""Real-scan registration: the reference's shipped indoor 3DMatch pair.

The reference's FPFH+ICP example registers two REAL depth-sensor scans it
ships in-tree (/root/reference/examples/teaser_python_fpfh_icp/example.py:
cloud_bin_0.ply / cloud_bin_4.ply, 258k/313k points, voxel 0.05, FPFH,
mutual-NN matching, TEASER solve, ICP refine). This module is the native
equivalent: every stage is the package's own (io/ply, frontend/voxel,
frontend/normals, frontend/fpfh, frontend/matcher, solver/fused,
frontend/icp) — no Open3D.

No ground-truth matrix ships with the pair, so "registered" is judged the
way the reference example judges it: the coarse PSULVSB pose must be a
basin-of-attraction seed for ICP — ICP converges, the inlier RMSE lands
well under the voxel size, a large fraction of source points find a
nearest neighbor within the ICP distance gate (fitness), and the coarse
rotation agrees with the refined one to a few degrees.
"""

from __future__ import annotations

import os
import time

import numpy as np

_REF_DATA = "/root/reference/examples/teaser_python_fpfh_icp/data"
REALSCAN_PLYS = (
    os.path.join(_REF_DATA, "cloud_bin_0.ply"),
    os.path.join(_REF_DATA, "cloud_bin_4.ply"),
)


def realscan_available() -> bool:
    return all(os.path.exists(p) for p in REALSCAN_PLYS)


def register_realscan(
    src_ply: str,
    dst_ply: str,
    voxel: float = 0.05,
    caps: dict | None = None,
    seed: int = 0,
) -> dict:
    """voxel -> normals -> FPFH -> mutual match -> PSULVSB -> ICP on a real
    scan pair. Returns a dict of pipeline observables (counts, timings,
    coarse pose, ICP convergence metrics).

    Stage parameters mirror the reference example (example.py:7,54 and
    helpers.py:9-17): voxel 0.05, normal radius 2*voxel (k-NN analog),
    FPFH radius 5*voxel, noise bound = voxel, mutual filter on.
    """
    import jax
    import jax.numpy as jnp

    from psulvsb_tpu.api import register_pair
    from psulvsb_tpu.frontend.fpfh import compute_fpfh
    from psulvsb_tpu.frontend.icp import icp_point_to_point
    from psulvsb_tpu.frontend.knn import knn
    from psulvsb_tpu.frontend.matcher import match_features
    from psulvsb_tpu.frontend.normals import estimate_normals
    from psulvsb_tpu.frontend.voxel import voxel_downsample
    from psulvsb_tpu.io.ply import read_ply
    from psulvsb_tpu.solver.config import SolverParams

    src_cloud = read_ply(src_ply)
    dst_cloud = read_ply(dst_ply)

    def features(cloud):
        down = voxel_downsample(cloud, voxel)
        pts = jnp.asarray(down, jnp.float32)
        normals = estimate_normals(pts, k=20)
        return down, np.asarray(
            compute_fpfh(pts, normals, radius=5 * voxel, k=48)
        )

    src_d, src_f = features(src_cloud)
    dst_d, dst_f = features(dst_cloud)
    corres = match_features(src_d, dst_d, src_f, dst_f, seed=seed)
    n_corr = int(corres.shape[0])

    src_m = jnp.asarray(src_d[:, corres[:, 0]], jnp.float32)
    dst_m = jnp.asarray(dst_d[:, corres[:, 1]], jnp.float32)
    params = SolverParams.preset_artificial(
        noise_bound=voxel, noise_bound_dataset=voxel, **(caps or {})
    )
    # Compile (untimed) then time the solve dispatch.
    sol, _ = register_pair(src_m, dst_m, params, jax.random.PRNGKey(seed))
    jax.block_until_ready(sol.rotation)
    t0 = time.perf_counter()
    sol, _ = register_pair(src_m, dst_m, params, jax.random.PRNGKey(seed + 1))
    _ = float(sol.translation[0])
    solve_s = time.perf_counter() - t0

    src_dj = jnp.asarray(src_d, jnp.float32)
    dst_dj = jnp.asarray(dst_d, jnp.float32)
    icp = icp_point_to_point(
        src_dj, dst_dj,
        init_rotation=sol.rotation,
        init_translation=sol.translation,
        max_correspondence_distance=2 * voxel,
        max_iterations=100,
    )
    # Fitness: fraction of source points with a dst NN within the ICP gate
    # after the refined transform (the o3d registration fitness analog).
    moved = icp.rotation @ src_dj + icp.translation[:, None]
    _, d2 = knn(moved, dst_dj, k=1)
    fitness = float(jnp.mean(d2[:, 0] <= (2 * voxel) ** 2))

    r_coarse = np.asarray(sol.rotation, np.float64)
    r_ref = np.asarray(icp.rotation, np.float64)
    cosang = (np.trace(r_ref.T @ r_coarse) - 1.0) / 2.0
    rot_vs_icp = float(np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0))))

    return {
        "n_raw_src": int(src_cloud.shape[1]),
        "n_raw_dst": int(dst_cloud.shape[1]),
        "n_down_src": int(src_d.shape[1]),
        "n_down_dst": int(dst_d.shape[1]),
        "n_corr": n_corr,
        "solve_s": solve_s,
        "rotation": np.asarray(sol.rotation),
        "translation": np.asarray(sol.translation),
        "icp_rotation": np.asarray(icp.rotation),
        "icp_translation": np.asarray(icp.translation),
        "icp_rmse": float(icp.rmse),
        "icp_fitness": fitness,
        "icp_iters": int(icp.iterations),
        "rot_vs_icp_deg": rot_vs_icp,
    }
