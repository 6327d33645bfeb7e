"""FPFH + matcher tests — parity targets: feature-test.cc (FPFH vs PCL
reference behavior) and matcher-test.cc (self-matching, bunny-scene match)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psulvsb_tpu.frontend.fpfh import compute_fpfh, pair_features, FPFHEstimation
from psulvsb_tpu.frontend.matcher import match_features, Matcher
from psulvsb_tpu.frontend.normals import estimate_normals
from psulvsb_tpu.eval.synthetic import synthetic_cloud
from psulvsb_tpu.core.se3 import random_se3, transform_points


class TestPairFeatures:
    def test_known_geometry(self):
        # Two points on the x axis, normals along z: d = (1,0,0), ns = z.
        p1 = jnp.array([0.0, 0, 0])
        p2 = jnp.array([1.0, 0, 0])
        nz = jnp.array([0.0, 0, 1.0])
        f1, f2, f3, dist, valid = pair_features(p1, nz, p2, nz)
        assert bool(valid)
        assert float(dist) == pytest.approx(1.0)
        # f3 = ns . d / |d| = 0; v = d x ns = (0,-1,0); f2 = v . nt = 0;
        # w = ns x v = (1,0,0); f1 = atan2(w.nt, ns.nt) = atan2(0, 1) = 0.
        assert float(f3) == pytest.approx(0.0, abs=1e-6)
        assert float(f2) == pytest.approx(0.0, abs=1e-6)
        assert float(f1) == pytest.approx(0.0, abs=1e-6)

    def test_swap_rule_symmetry(self, rng):
        # Feature set must be invariant to argument order (source/target
        # swap rule makes the pair canonical).
        p1 = jnp.asarray(rng.normal(size=3), jnp.float32)
        p2 = jnp.asarray(rng.normal(size=3), jnp.float32)
        n1 = jnp.asarray(rng.normal(size=3), jnp.float32)
        n2 = jnp.asarray(rng.normal(size=3), jnp.float32)
        n1 = n1 / jnp.linalg.norm(n1)
        n2 = n2 / jnp.linalg.norm(n2)
        a = pair_features(p1, n1, p2, n2)
        b = pair_features(p2, n2, p1, n1)
        for x, y in zip(a[:4], b[:4]):
            assert float(x) == pytest.approx(float(y), abs=1e-5)


class TestFPFH:
    def test_shape_and_block_normalization(self):
        pts = jnp.asarray(synthetic_cloud(300, seed=1))
        normals = estimate_normals(pts, k=12)
        feat = compute_fpfh(pts, normals, radius=0.4, k=32)
        assert feat.shape == (300, 33)
        blocks = np.asarray(feat).reshape(300, 3, 11).sum(axis=2)
        np.testing.assert_allclose(blocks, 100.0, atol=0.1)

    def test_rotation_invariance(self, key):
        """FPFH is a rotation-invariant descriptor: features of a rotated
        cloud must match the originals."""
        pts = jnp.asarray(synthetic_cloud(300, seed=2))
        t = random_se3(key, max_translation=0.0)
        pts_r = t.rotation @ pts
        n0 = estimate_normals(pts, k=12)
        n1 = estimate_normals(pts_r, k=12)
        f0 = np.asarray(compute_fpfh(pts, n0, radius=0.4, k=32))
        f1 = np.asarray(compute_fpfh(pts_r, n1, radius=0.4, k=32))
        # L1 distance per descriptor, relative to its mass (300).
        rel = np.abs(f0 - f1).sum(axis=1) / 300.0
        assert np.median(rel) < 0.15

    def test_facade(self):
        pts = synthetic_cloud(120, seed=3)
        est = FPFHEstimation(normal_k=10, neighbor_cap=24)
        feat = est.computeFPFHFeatures(pts, 0.3, 0.4)
        assert feat.shape == (120, 33)


class TestMatcher:
    def _make_pair(self, key, n=250, noise=0.005):
        src = jnp.asarray(synthetic_cloud(n, seed=4))
        t = random_se3(key, max_translation=1.0)
        dst = transform_points(t, src)
        dst = dst + noise * jax.random.normal(jax.random.PRNGKey(9), dst.shape)
        return np.asarray(src), np.asarray(dst)

    def test_self_match_identity(self):
        """Matching a cloud against itself must return the identity pairs
        (matcher-test.cc self-matching case)."""
        src = np.asarray(synthetic_cloud(200, seed=5))
        pts = jnp.asarray(src)
        normals = estimate_normals(pts, k=12)
        feat = np.asarray(compute_fpfh(pts, normals, radius=0.4, k=32))
        corres = match_features(
            src, src, feat, feat, use_crosscheck=True, use_tuple_test=False
        )
        assert corres.shape[0] >= 190
        assert (corres[:, 0] == corres[:, 1]).mean() > 0.95

    def test_transformed_match_recovers_pairs(self, key):
        src, dst = self._make_pair(key)
        spts, dpts = jnp.asarray(src), jnp.asarray(dst)
        sf = np.asarray(
            compute_fpfh(spts, estimate_normals(spts, k=12), radius=0.4, k=32)
        )
        df = np.asarray(
            compute_fpfh(dpts, estimate_normals(dpts, k=12), radius=0.4, k=32)
        )
        corres = match_features(src, dst, sf, df, use_crosscheck=True,
                                use_tuple_test=True, tuple_scale=0.9)
        assert corres.shape[0] >= 50
        # Correct correspondence is i == j by construction.
        acc = (corres[:, 0] == corres[:, 1]).mean()
        assert acc > 0.6, f"match accuracy {acc}"

    def test_tuple_test_rejects_scale_inconsistency(self, key):
        """Pairs matching a uniformly-scaled cloud fail the triangle test
        when tuple_scale is tight."""
        src = np.asarray(synthetic_cloud(100, seed=6))
        dst = 3.0 * src  # gross scale change
        feat = np.eye(100, 33, dtype=np.float32)  # perfect feature identity
        corres = match_features(src, dst, feat, feat, use_crosscheck=True,
                                use_tuple_test=True, tuple_scale=0.95)
        assert corres.shape[0] == 0

    def test_facade(self, key):
        src, dst = self._make_pair(key, n=120)
        spts, dpts = jnp.asarray(src), jnp.asarray(dst)
        sf = np.asarray(compute_fpfh(spts, estimate_normals(spts, k=10), 0.4, k=24))
        df = np.asarray(compute_fpfh(dpts, estimate_normals(dpts, k=10), 0.4, k=24))
        m = Matcher()
        corres = m.calculateCorrespondences(src, dst, sf, df)
        assert corres.ndim == 2 and corres.shape[1] == 2
