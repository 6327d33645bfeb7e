"""End-to-end registration of the reference's shipped REAL indoor scans
(eval/realscan.py) — the only real depth-sensor data in the environment
(/root/reference/examples/teaser_python_fpfh_icp/data/cloud_bin_{0,4}.ply,
registered by the reference's example.py with the identical stage chain)."""

import numpy as np
import pytest

from psulvsb_tpu.eval.realscan import (
    REALSCAN_PLYS,
    realscan_available,
    register_realscan,
)

pytestmark = pytest.mark.skipif(
    not realscan_available(), reason="reference scan PLYs not present"
)


@pytest.fixture(scope="module")
def result():
    return register_realscan(*REALSCAN_PLYS)


@pytest.mark.slow
class TestRealScanRegistration:
    def test_frontend_counts(self, result):
        # 258k/313k raw points; voxel 0.05 downsampling keeps tens of
        # thousands; mutual FPFH matching yields a few hundred putative
        # correspondences (the reference example prints the same order).
        assert result["n_raw_src"] == 258342
        # Measured: 0.05-voxel downsampling keeps ~5k points per cloud
        # (4999 for cloud_bin_4).
        assert result["n_down_src"] > 4000
        assert result["n_down_dst"] > 4000
        assert result["n_corr"] >= 100

    def test_coarse_pose_is_icp_basin_seed(self, result):
        """The PSULVSB pose must seed ICP into convergence: inlier RMSE
        well under the voxel size, most source points matched within the
        ICP gate, and the coarse rotation within a few degrees of the
        refined one (the reference example's own success signal)."""
        assert np.isfinite(result["icp_rmse"])
        assert result["icp_rmse"] < 0.05  # < voxel size
        assert result["icp_fitness"] > 0.5
        assert result["icp_iters"] < 100  # converged before the cap
        assert result["rot_vs_icp_deg"] < 10.0

    def test_pose_is_nontrivial_rigid(self, result):
        r = np.asarray(result["rotation"], np.float64)
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-4)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-4)
        # The two scans were taken from different viewpoints — identity is
        # a wrong answer.
        angle = np.degrees(
            np.arccos(np.clip((np.trace(r) - 1.0) / 2.0, -1.0, 1.0))
        )
        assert angle > 2.0
