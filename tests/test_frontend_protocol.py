"""End-to-end front-end protocol (eval/frontend_protocol.py): raw
structured scenes -> voxel/FPFH/mutual-NN -> reference-format files ->
batched harness (teaser_cpp_ply.cc:179-329 equivalent at protocol scale)."""

import os

import numpy as np
import pytest

from psulvsb_tpu.eval.frontend_protocol import (
    NOISE_BOUND,
    frontend_solver_params,
    make_frontend_pair,
    write_frontend_benchmark,
)


class TestFrontendPair:
    @pytest.mark.slow
    def test_match_quality_regime(self):
        """The front-end must produce the documented regime: C >= 800
        correspondences with >= 20 true inliers (97-98% outliers) —
        enough for the solver's escalation path, real enough to carry
        FPFH's spatially-structured wrong matches."""
        src, dst, gt = make_frontend_pair(62)
        assert src.shape[0] == 3 and src.shape == dst.shape
        c = src.shape[1]
        resid = np.linalg.norm(gt[:3, :3] @ src + gt[:3, 3:4] - dst, axis=0)
        inliers = int((resid < NOISE_BOUND).sum())
        assert c >= 800
        assert inliers >= 20

    @pytest.mark.slow
    def test_benchmark_tree_and_recall(self, tmp_path):
        """The written tree is reference-format (readable by the batched
        harness) and the harness solves it under the KITTI criteria."""
        from psulvsb_tpu.eval.batch_harness import run_benchmark_batched

        root = str(tmp_path / "fe")
        write_frontend_benchmark(root, ["s0"], n_pairs=2, seed=11)
        assert os.path.exists(os.path.join(root, "s0", "pairs.txt"))
        params = frontend_solver_params(
            sampled_cap=2048, basic_cap=256, hypothesis_batch=4,
        )
        summary = run_benchmark_batched(
            root, str(tmp_path / "out"), dataset="kitti", scenes=["s0"],
            params=params, ddtime=3,
        )
        assert summary["s0"]["pairs"] == 2
        assert summary["s0"]["recall"] == 1.0
