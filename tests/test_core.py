"""Core linalg / se3 / metrics tests (parity targets: utils-test.cc,
linalg-test.cc in the reference's TEASER-plusplus/test/teaser/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psulvsb_tpu.core.linalg import (
    hatmap,
    vector_kron,
    nearest_psd,
    svd_rot,
    rot_from_correlation,
    weighted_procrustes_srt,
)
from psulvsb_tpu.core.se3 import SE3, transform_points, random_se3, rodrigues
from psulvsb_tpu.core.metrics import (
    angular_error_deg,
    masked_rmse,
    inlier_probability,
    calculate_diameter,
)


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class TestLinalg:
    def test_hatmap(self):
        v = jnp.array([1.0, 2.0, 3.0])
        h = hatmap(v)
        np.testing.assert_allclose(
            np.asarray(h), [[0, -3, 2], [3, 0, -1], [-2, 1, 0]]
        )

    def test_vector_kron(self, rng):
        a = rng.normal(size=(3, 5)).astype(np.float32)
        b = rng.normal(size=(3, 5)).astype(np.float32)
        out = np.asarray(vector_kron(jnp.asarray(a), jnp.asarray(b)))
        for c in range(5):
            np.testing.assert_allclose(out[:, c], np.kron(a[:, c], b[:, c]), rtol=1e-5)

    def test_nearest_psd(self, rng):
        a = rng.normal(size=(6, 6)).astype(np.float32)
        p = np.asarray(nearest_psd(jnp.asarray(a)))
        w = np.linalg.eigvalsh((p + p.T) / 2)
        assert w.min() >= -1e-5

    @pytest.mark.parametrize("method", ["eigh", "power"])
    def test_svd_rot_recovers_rotation(self, rng, method):
        r_true = random_rotation(rng)
        x = rng.normal(size=(3, 50))
        y = r_true @ x
        r = np.asarray(
            svd_rot(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                    method=method)
        )
        np.testing.assert_allclose(r, r_true, atol=5e-4)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-4)

    def test_svd_rot_reflection_case(self, rng):
        """Degenerate/reflection-prone input must still yield det +1
        (the reference flips V's last column, utils.h:131-134)."""
        x = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 0.0]])
        y = np.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, 0.0]])
        r = np.asarray(svd_rot(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-4)

    @pytest.mark.parametrize("method", ["eigh", "power"])
    def test_svd_rot_180_degree_probe_orthogonal(self, method):
        """180-degree rotations whose quaternion has near-zero component sum
        used to collapse the 'power' path's fixed all-ones probe (ADVICE r1);
        the largest-norm-column probe must recover them exactly."""
        # q = (0, 1, -1, 0)/sqrt(2): w = 0 and sum(q) = 0 — the adversarial
        # direction for the old probe. R = 180 deg about axis (1,-1,0)/sqrt2.
        q = np.array([0.0, 1.0, -1.0, 0.0]) / np.sqrt(2.0)
        w, x_, y_, z_ = q
        r_true = np.array(
            [
                [1 - 2 * (y_**2 + z_**2), 2 * (x_ * y_ - w * z_), 2 * (x_ * z_ + w * y_)],
                [2 * (x_ * y_ + w * z_), 1 - 2 * (x_**2 + z_**2), 2 * (y_ * z_ - w * x_)],
                [2 * (x_ * z_ - w * y_), 2 * (y_ * z_ + w * x_), 1 - 2 * (x_**2 + y_**2)],
            ]
        )
        rng = np.random.default_rng(3)
        x = rng.normal(size=(3, 60))
        y = r_true @ x
        r = np.asarray(
            svd_rot(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                    method=method)
        )
        np.testing.assert_allclose(r, r_true, atol=5e-4)

    def test_svd_rot_weighted_ignores_outliers(self, rng):
        r_true = random_rotation(rng)
        x = rng.normal(size=(3, 40))
        y = r_true @ x
        y[:, :5] += 100.0  # corrupted columns
        w = np.ones(40)
        w[:5] = 0.0
        r = np.asarray(
            svd_rot(
                jnp.asarray(x, jnp.float32),
                jnp.asarray(y, jnp.float32),
                jnp.asarray(w, jnp.float32),
            )
        )
        np.testing.assert_allclose(r, r_true, atol=5e-4)

    def test_weighted_procrustes_srt(self, rng):
        r_true = random_rotation(rng)
        t_true = rng.normal(size=3)
        x = rng.normal(size=(3, 30))
        y = r_true @ x + t_true[:, None]
        r, t = weighted_procrustes_srt(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32),
            jnp.ones((30,), jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)


class TestSE3:
    def test_rodrigues_vs_scipy_formula(self, rng):
        axis = jnp.asarray([0.0, 0.0, 1.0])
        r = np.asarray(rodrigues(axis, jnp.asarray(np.pi / 2)))
        np.testing.assert_allclose(
            r, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
        )

    def test_random_se3_properties(self, key):
        t = random_se3(key)
        r = np.asarray(t.rotation)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)
        assert float(jnp.linalg.norm(t.translation)) <= 3.0

    def test_transform_points_matches_matrix(self, key, rng):
        t = random_se3(key)
        pts = jnp.asarray(rng.normal(size=(3, 10)), jnp.float32)
        out = transform_points(t, pts)
        hom = np.vstack([np.asarray(pts), np.ones((1, 10))])
        expect = (np.asarray(t.as_matrix()) @ hom)[:3]
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


class TestMetrics:
    def test_angular_error(self, rng):
        r = random_rotation(rng)
        assert float(angular_error_deg(jnp.asarray(r), jnp.asarray(r))) < 1e-3
        rz = rodrigues(jnp.array([0.0, 0, 1]), jnp.asarray(0.3))
        err = angular_error_deg(jnp.eye(3), rz)
        assert float(err) == pytest.approx(np.degrees(0.3), abs=1e-3)

    def test_masked_rmse(self, rng):
        src = jnp.asarray(rng.normal(size=(3, 20)), jnp.float32)
        dst = src + 0.1
        mask = jnp.ones(20, bool)
        rmse = masked_rmse(src, dst, mask, jnp.eye(3), jnp.zeros(3))
        assert float(rmse) == pytest.approx(np.sqrt(3) * 0.1, abs=1e-4)
        empty = masked_rmse(src, dst, jnp.zeros(20, bool), jnp.eye(3), jnp.zeros(3))
        assert np.isinf(float(empty))

    def test_inlier_probability_matches_chi3(self):
        # P(r=0) = 1; decreasing in r; at r = sigma, survival of chi2(3) at 0.5.
        p0 = float(inlier_probability(jnp.asarray(0.0), 0.01))
        assert p0 == pytest.approx(1.0, abs=1e-6)
        p1 = float(inlier_probability(jnp.asarray(0.01), 0.01))
        p2 = float(inlier_probability(jnp.asarray(0.05), 0.01))
        assert p0 > p1 > p2
        # scipy cross-check value: 1 - gammainc(1.5, 0.5) ~ 0.8013
        assert p1 == pytest.approx(0.80125, abs=1e-3)

    def test_diameter(self):
        pts = jnp.asarray([[0.0, 1.0], [0.0, 0.0], [0.0, 0.0]])
        # cog = (0.5,0,0); max dist = 0.5 -> diameter 1.0
        assert float(calculate_diameter(pts)) == pytest.approx(1.0, abs=1e-6)


class TestUtilsParity:
    def test_random_sample_distinct(self, key):
        from psulvsb_tpu.core.linalg import random_sample

        idx = np.asarray(random_sample(key, 50, 10))
        assert len(set(idx.tolist())) == 10
        assert idx.min() >= 0 and idx.max() < 50

    def test_mask_vector_and_find_nonzero(self):
        from psulvsb_tpu.core.linalg import mask_vector, find_nonzero, remove_columns

        assert mask_vector([True, False, True], ["a", "b", "c"]) == ["a", "c"]
        assert find_nonzero([0, 1, 0, 2]) == [1, 3]
        arr = np.arange(12).reshape(3, 4)
        out = remove_columns(arr, [1, 3])
        np.testing.assert_array_equal(out, arr[:, [0, 2]])


class TestPointCloud:
    def test_container_parity(self):
        from psulvsb_tpu.core.geometry import PointCloud

        pc = PointCloud()
        pc.push_back((1.0, 2.0, 3.0))
        pc.push_back({"x": 4.0, "y": 5.0, "z": 6.0})
        assert pc.size() == len(pc) == 2
        assert pc[0] == (1.0, 2.0, 3.0)
        arr = pc.asarray()
        assert arr.shape == (3, 2)
        np.testing.assert_allclose(arr[:, 1], [4, 5, 6])
        pc.clear()
        assert pc.size() == 0

    def test_from_array(self, rng):
        from psulvsb_tpu.core.geometry import PointCloud

        pts = rng.normal(size=(3, 7)).astype(np.float32)
        pc = PointCloud(pts)
        np.testing.assert_allclose(pc.asarray(), pts, atol=1e-6)
