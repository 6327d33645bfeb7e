"""CLI bridge tests — the process-boundary surface behind
matlab/teaser_solve.m (mirrors teaser_mex.cc:99-244's argument schema)."""

import subprocess
import sys

import numpy as np
import pytest

from psulvsb_tpu.cli import build_parser, main, _read_points


def _write_cloud(path, pts, fmt="csv"):
    if fmt == "csv":
        np.savetxt(path, pts, delimiter=",")
    else:
        np.savetxt(path, pts)


def _make_problem(rng, n=150, scale=1.3, outliers=0.3):
    src = rng.uniform(-1, 1, size=(3, n))
    angle = 0.7
    axis = np.array([0.2, 1.0, -0.5])
    axis /= np.linalg.norm(axis)
    k = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    r = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * k @ k
    t = np.array([0.3, -0.2, 0.5])
    dst = scale * r @ src + t[:, None] + rng.normal(size=(3, n)) * 0.005
    n_out = int(outliers * n)
    dst[:, :n_out] += rng.uniform(2, 6, size=(3, n_out)) * np.sign(
        rng.normal(size=(3, n_out))
    )
    return src, dst, scale, r, t


def _parse_solution(text):
    lines = [ln.split() for ln in text.strip().splitlines()]
    assert [ln[0] for ln in lines] == [
        "scale", "rotation", "rotation", "rotation", "translation",
        "time_ms", "valid",
    ]
    s = float(lines[0][1])
    r = np.array([[float(v) for v in lines[i][1:]] for i in (1, 2, 3)])
    t = np.array([float(v) for v in lines[4][1:]])
    return s, r, t, float(lines[5][1]), int(lines[6][1])


class TestParser:
    def test_defaults_match_reference_wrapper(self):
        # teaser_solve.m defaults: Cbar2 1, NoiseBound 0.03, scaling on,
        # GNC-TLS, factor 1.4, 100 iters, cost thr 0.005, PMC_EXACT, 0.5.
        a = build_parser().parse_args(["--src", "s", "--dst", "d"])
        assert a.cbar2 == 1.0
        assert a.noise_bound == 0.03
        assert a.estimate_scaling == 1
        assert a.rotation_estimation_algorithm == 0
        assert a.rotation_gnc_factor == 1.4
        assert a.rotation_max_iterations == 100
        assert a.rotation_cost_threshold == 0.005
        assert a.inlier_selection_algorithm == 0
        assert a.kcore_heu_threshold == 0.5

    def test_reads_both_orientations(self, tmp_path, rng):
        pts = rng.normal(size=(3, 40))
        _write_cloud(tmp_path / "a.csv", pts)
        _write_cloud(tmp_path / "b.txt", pts.T, fmt="txt")
        np.testing.assert_allclose(_read_points(str(tmp_path / "a.csv")), pts)
        np.testing.assert_allclose(_read_points(str(tmp_path / "b.txt")), pts)


class TestEndToEnd:
    def test_in_process_solve(self, tmp_path, rng):
        """main() called in-process (what the subprocess runs): recovers
        s, R, t from a scaled outlier-contaminated problem."""
        src, dst, s_gt, r_gt, t_gt = _make_problem(rng)
        _write_cloud(tmp_path / "src.csv", src)
        _write_cloud(tmp_path / "dst.csv", dst)
        out = tmp_path / "sol.txt"
        rc = main([
            "--src", str(tmp_path / "src.csv"),
            "--dst", str(tmp_path / "dst.csv"),
            "--out", str(out),
            "--noise-bound", "0.02",
        ])
        assert rc == 0
        s, r, t, ms, valid = _parse_solution(out.read_text())
        assert valid == 1
        assert abs(s - s_gt) < 0.05
        cos = (np.trace(r_gt.T @ r) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 5
        assert np.linalg.norm(t - t_gt) < 0.3
        assert ms > 0

    @pytest.mark.slow
    def test_subprocess_solve(self, tmp_path, rng):
        """Full process boundary, exactly as MATLAB's system() call."""
        src, dst, s_gt, r_gt, t_gt = _make_problem(rng, n=120)
        _write_cloud(tmp_path / "src.csv", src)
        _write_cloud(tmp_path / "dst.csv", dst)
        proc = subprocess.run(
            [sys.executable, "-m", "psulvsb_tpu.cli",
             "--src", str(tmp_path / "src.csv"),
             "--dst", str(tmp_path / "dst.csv"),
             "--noise-bound", "0.02", "--platform", "cpu"],
            capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr
        s, r, t, _ms, valid = _parse_solution(proc.stdout)
        assert valid == 1
        assert abs(s - s_gt) < 0.05
        cos = (np.trace(r_gt.T @ r) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 5
