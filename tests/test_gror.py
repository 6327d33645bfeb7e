"""GROR initial-alignment tests (parity target: the GROR usage in
registration_artificial.cc:571-576 — robust initial transform from noisy,
outlier-heavy correspondences)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psulvsb_tpu.core.metrics import angular_error_deg
from psulvsb_tpu.eval.synthetic import synthetic_cloud, make_synthetic_pair
from psulvsb_tpu.gror.gror import gror_align, GRORInitialAlignment, _two_vectors_align


class TestTwoVectorsAlign:
    def test_aligns_random_vectors(self, rng):
        for _ in range(5):
            a = rng.normal(size=3)
            b = rng.normal(size=3)
            a /= np.linalg.norm(a)
            b /= np.linalg.norm(b)
            r = np.asarray(
                _two_vectors_align(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
            )
            np.testing.assert_allclose(r @ a, b, atol=1e-4)
            assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-3)

    def test_antiparallel(self):
        a = jnp.array([0.0, 0, 1.0])
        r = np.asarray(_two_vectors_align(a, -a))
        np.testing.assert_allclose(r @ np.array([0, 0, 1.0]), [0, 0, -1.0], atol=1e-4)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-3)


class TestGror:
    def test_recovers_transform_with_outliers(self, key):
        src = jnp.asarray(synthetic_cloud(200, seed=0))
        pair = make_synthetic_pair(key, src, noise_bound=0.01, outlier_rate=0.6)
        res = gror_align(pair.src, pair.dst, resolution=0.05, k_optimal=150)
        re = float(angular_error_deg(pair.transform.rotation, res.rotation))
        te = float(jnp.linalg.norm(res.translation - pair.transform.translation))
        assert re < 5.0, re
        assert te < 0.2, te
        # Inliers should exclude most true outliers.
        out = np.asarray(pair.outlier_mask)
        inl = np.asarray(res.inliers)
        assert (inl & out).sum() <= 0.1 * out.sum()

    def test_heavy_outliers(self, key):
        src = jnp.asarray(synthetic_cloud(300, seed=1))
        pair = make_synthetic_pair(key, src, noise_bound=0.01, outlier_rate=0.85)
        res = gror_align(pair.src, pair.dst, resolution=0.05, k_optimal=200)
        re = float(angular_error_deg(pair.transform.rotation, res.rotation))
        assert re < 5.0, re

    def test_facade(self, key):
        src = np.asarray(synthetic_cloud(150, seed=2))
        pair = make_synthetic_pair(key, jnp.asarray(src), noise_bound=0.01,
                                   outlier_rate=0.5)
        gror = GRORInitialAlignment()
        gror.setInputSource(np.asarray(pair.src))
        gror.setInputTarget(np.asarray(pair.dst))
        gror.setResolution(0.05)
        gror.setOptimalSelectionNumber(100)
        gror.setNumberOfThreads(32)
        gror.setInputCorrespondences(
            np.stack([np.arange(150), np.arange(150)], axis=1)
        )
        res = gror.align()
        re = float(angular_error_deg(pair.transform.rotation, res.rotation))
        assert re < 5.0
