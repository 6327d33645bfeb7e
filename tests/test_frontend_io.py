"""Frontend (kNN, normals, histogram filter) and PLY I/O tests — parity
targets: io-test.cc, the PCL normal/histogram stages of PSULVSB.cc."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psulvsb_tpu.frontend.knn import knn
from psulvsb_tpu.frontend.normals import estimate_normals
from psulvsb_tpu.frontend.histogram_filter import normal_angle_histogram_filter
from psulvsb_tpu.io.ply import read_ply, write_ply
from psulvsb_tpu.eval.synthetic import synthetic_cloud


class TestKnn:
    def test_matches_numpy_bruteforce(self, rng):
        pts = jnp.asarray(rng.normal(size=(3, 300)), jnp.float32)
        idx, d = knn(pts, pts, k=5)
        dn = np.linalg.norm(
            np.asarray(pts)[:, :, None] - np.asarray(pts)[:, None, :], axis=0
        )
        ref = np.argsort(dn, axis=1)[:, :5]
        # Self (distance 0) must be first.
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(300))
        # Distances match the reference sort (indices can tie-swap).
        np.testing.assert_allclose(
            np.sqrt(np.asarray(d)),
            np.take_along_axis(dn, ref, 1),
            atol=1e-4,
        )

    def test_inactive_points_excluded(self, rng):
        pts = jnp.asarray(rng.normal(size=(3, 64)), jnp.float32)
        mask = jnp.arange(64) < 32
        idx, _ = knn(pts, pts, k=4, point_active=mask)
        assert int(jnp.max(idx[:, :4])) < 32 or not bool(jnp.any(idx[:32] >= 32))


class TestNormals:
    def test_sphere_normals_radial(self, rng):
        # Exact unit sphere: true normal is radial.
        v = rng.normal(size=(3, 800)).astype(np.float32)
        pts = jnp.asarray(v / np.linalg.norm(v, axis=0, keepdims=True))
        normals = estimate_normals(pts, k=12)
        dots = np.abs((np.asarray(normals) * np.asarray(pts)).sum(axis=0))
        assert np.median(dots) > 0.98

    def test_plane_normals_exact(self, rng):
        xy = rng.normal(size=(2, 200)).astype(np.float32)
        pts = jnp.asarray(np.vstack([xy, np.zeros((1, 200), np.float32)]))
        normals = estimate_normals(pts, k=10, viewpoint=jnp.asarray([0.0, 0, 10.0]))
        np.testing.assert_allclose(np.asarray(normals[2]), np.ones(200), atol=1e-4)


class TestHistogramFilter:
    def test_consistent_rotation_peak_kept(self, key, rng):
        """Inlier correspondences share one src->dst normal rotation angle;
        outliers have random normals. The filter must keep (1) a superset of
        structure near the peak and discard (-1) far-angle bins."""
        n = 400
        n_in = 150
        # Inlier normals: fixed angle ~20 deg between src and dst.
        theta = np.deg2rad(20.0)
        src_n = rng.normal(size=(3, n)).astype(np.float32)
        src_n /= np.linalg.norm(src_n, axis=0, keepdims=True)
        dst_n = np.empty_like(src_n)
        for i in range(n):
            v = src_n[:, i]
            # random orthogonal direction
            o = np.cross(v, rng.normal(size=3))
            o /= np.linalg.norm(o) + 1e-30
            if i < n_in:
                dst_n[:, i] = np.cos(theta) * v + np.sin(theta) * o
            else:
                r = rng.normal(size=3)
                dst_n[:, i] = r / np.linalg.norm(r)
        keep, angles = normal_angle_histogram_filter(
            jnp.asarray(src_n), jnp.asarray(dst_n)
        )
        keep = np.asarray(keep)
        a = np.asarray(angles)
        # Most inliers (angle 20 deg) survive; the kept set is dominated by
        # near-20-degree angles.
        assert (keep[:n_in] == 1).mean() > 0.8
        kept_angles = a[keep == 1]
        assert np.abs(np.median(kept_angles) - 20.0) < 3.0
        # Distant angles got -1 somewhere.
        assert (keep == -1).sum() > 0


class TestPlyIO:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, rng, binary):
        pts = rng.normal(size=(3, 57)).astype(np.float32)
        p = str(tmp_path / "cloud.ply")
        write_ply(p, pts, binary=binary)
        back = read_ply(p)
        np.testing.assert_allclose(back, pts, atol=1e-6)

    def test_reads_double_and_extra_props(self, tmp_path):
        p = str(tmp_path / "d.ply")
        with open(p, "wb") as f:
            f.write(
                b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 2\n"
                b"property double x\nproperty double y\nproperty double z\n"
                b"property uchar red\n"
                b"end_header\n"
            )
            rec = np.dtype([("x", "<f8"), ("y", "<f8"), ("z", "<f8"), ("r", "u1")])
            arr = np.array([(1.0, 2.0, 3.0, 7), (4.0, 5.0, 6.0, 9)], dtype=rec)
            f.write(arr.tobytes())
        back = read_ply(p)
        np.testing.assert_allclose(back, [[1, 4], [2, 5], [3, 6]], atol=1e-6)

    def test_rejects_non_ply(self, tmp_path):
        p = str(tmp_path / "x.ply")
        with open(p, "wb") as f:
            f.write(b"not a ply\n")
        with pytest.raises(ValueError):
            read_ply(p)


class TestICP:
    def test_refines_perturbed_alignment(self, key, rng):
        from psulvsb_tpu.frontend.icp import icp_point_to_point
        from psulvsb_tpu.core.se3 import rodrigues
        from psulvsb_tpu.core.metrics import angular_error_deg

        pts = jnp.asarray(synthetic_cloud(400, seed=9))
        r_true = rodrigues(jnp.array([0.3, 0.5, 1.0]), jnp.asarray(0.8))
        t_true = jnp.array([0.2, -0.1, 0.3])
        dst = r_true @ pts + t_true[:, None]
        # Start from a slightly perturbed initialization.
        r0 = rodrigues(jnp.array([0.3, 0.5, 1.0]), jnp.asarray(0.75))
        res = icp_point_to_point(
            pts, dst, init_rotation=r0, init_translation=t_true * 0.9,
            max_correspondence_distance=0.3,
        )
        assert float(angular_error_deg(r_true, res.rotation)) < 0.5
        assert float(jnp.linalg.norm(res.translation - t_true)) < 0.02


class TestTiming:
    def test_timer_and_throttle(self):
        from psulvsb_tpu.utils.timing import Timer, timed, log_throttled

        t = Timer("x").start()
        assert t.stop() >= 0
        with timed("span") as r:
            pass
        assert "elapsed_s" in r
        for i in range(25):
            log_throttled("k", f"msg {i}", every=10)


class TestICPDivergence:
    def test_no_correspondence_reports_inf_rmse(self, rng):
        """ICP with no correspondence in range is a DIVERGED state: rmse
        must be inf and the init transform must come back unchanged (not a
        garbage zero-weight Procrustes with rmse 0.0)."""
        from psulvsb_tpu.frontend.icp import icp_point_to_point

        src = jnp.asarray(rng.normal(size=(3, 50)), jnp.float32)
        dst = src + 100.0  # far beyond max_correspondence_distance
        res = icp_point_to_point(
            src, dst, max_correspondence_distance=0.1, max_iterations=5
        )
        assert not bool(jnp.isfinite(res.rmse))
        np.testing.assert_allclose(np.asarray(res.rotation), np.eye(3), atol=1e-6)

    def test_rmse_matches_returned_transform(self, rng):
        """The reported rmse must be computed under the RETURNED transform
        (inside the loop it lags one update behind)."""
        from psulvsb_tpu.frontend.icp import icp_point_to_point
        from psulvsb_tpu.utils.precision import mm

        src = jnp.asarray(rng.normal(size=(3, 80)), jnp.float32)
        t_true = jnp.asarray([0.05, -0.02, 0.03])
        dst = src + t_true[:, None]
        res = icp_point_to_point(
            src, dst, max_correspondence_distance=0.5, max_iterations=1
        )
        # One iteration from identity solves the pure translation exactly,
        # so the returned transform's residual is ~0 (knn's f32 distance
        # noise floor ~1e-4); the pre-update (stale) rmse would be
        # ||t_true|| ~ 0.06.
        assert float(res.rmse) < 1e-3
        moved = mm(res.rotation, src) + res.translation[:, None]
        d = jnp.sqrt(jnp.mean(jnp.sum((dst - moved) ** 2, axis=0)))
        assert float(res.rmse) == pytest.approx(float(d), abs=1e-3)
