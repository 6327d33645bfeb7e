"""Unit tests for the scalar robust estimators, with the golden values of the
reference's tls-test.cc (TEASER-plusplus/test/teaser/tls-test.cc:21-140:
MATLAB-derived estimates 0.8383 / 0.6425 and inlier masks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psulvsb_tpu.robust.scalar_tls import tls_vote, max_stabbing, scale_consensus_1pt


class TestTlsVote:
    def test_no_outlier(self):
        x = jnp.array([0.5, 1.0, 0.6, 0.7, 1.2])
        r = jnp.array([0.9, 0.9, 0.4, 0.5, 0.4])
        est, inl = tls_vote(x, r)
        assert est == pytest.approx(0.8383, abs=1e-3)
        np.testing.assert_array_equal(np.asarray(inl), [True] * 5)

    def test_one_outlier(self):
        x = jnp.array([0.5, 1.0, 0.6, 0.7, 1.2, 10.0])
        r = jnp.array([0.9, 0.9, 0.4, 0.5, 0.4, 0.5])
        est, inl = tls_vote(x, r)
        assert est == pytest.approx(0.8383, abs=1e-3)
        np.testing.assert_array_equal(np.asarray(inl), [True] * 5 + [False])

    def test_three_outliers(self):
        x = jnp.array([0.5, 1.0, 0.6, 20.0, 16.0, 10.0])
        r = jnp.array([0.9, 0.9, 0.4, 0.5, 0.4, 0.5])
        est, inl = tls_vote(x, r)
        assert est == pytest.approx(0.6425, abs=1e-3)
        np.testing.assert_array_equal(
            np.asarray(inl), [True, True, True, False, False, False]
        )

    def test_padding_invariance(self):
        """Padded lanes must not change the estimate."""
        x = jnp.array([0.5, 1.0, 0.6, 0.7, 1.2, 10.0])
        r = jnp.array([0.9, 0.9, 0.4, 0.5, 0.4, 0.5])
        est0, _ = tls_vote(x, r)
        xp = jnp.concatenate([x, jnp.zeros(10)])
        rp = jnp.concatenate([r, jnp.full(10, 0.1)])
        active = jnp.arange(16) < 6
        est1, inl1 = tls_vote(xp, rp, active=active)
        assert est1 == pytest.approx(float(est0), abs=1e-6)
        assert not bool(jnp.any(inl1[6:]))


class TestMaxStabbing:
    def test_simple_consensus(self):
        # 4 points near 2.0, 2 far away — stabbing must find the cluster mean.
        x = jnp.array([1.9, 2.0, 2.05, 2.1, 7.0, -3.0])
        est, inl = max_stabbing(x, 0.2)
        assert est == pytest.approx((1.9 + 2.0 + 2.05 + 2.1) / 4, abs=1e-5)
        np.testing.assert_array_equal(
            np.asarray(inl), [True, True, True, True, False, False]
        )

    def test_warm_interval_participates(self):
        # Two symmetric 2-clusters; warm value breaks the tie toward its own.
        x = jnp.array([0.0, 0.1, 5.0, 5.1])
        est_a, _ = max_stabbing(x, 0.2, warm_value=jnp.asarray(5.05), use_warm=True)
        assert est_a == pytest.approx((5.0 + 5.1 + 5.05) / 3, abs=1e-5)
        est_b, _ = max_stabbing(x, 0.2, warm_value=jnp.asarray(0.05), use_warm=True)
        assert est_b == pytest.approx((0.0 + 0.1 + 0.05) / 3, abs=1e-5)

    def test_padding_invariance(self):
        x = jnp.array([1.9, 2.0, 2.05, 2.1, 7.0, -3.0])
        est0, _ = max_stabbing(x, 0.2)
        xp = jnp.concatenate([x, jnp.full(10, 99.0)])
        active = jnp.arange(16) < 6
        est1, inl1 = max_stabbing(xp, 0.2, active=active)
        assert est1 == pytest.approx(float(est0), abs=1e-6)
        assert not bool(jnp.any(inl1[6:]))


class TestScaleConsensus:
    def test_recovers_dominant_scale(self, key):
        rng = np.random.default_rng(0)
        true = 1.7
        inliers = true + rng.uniform(-0.05, 0.05, size=80)
        outliers = rng.uniform(0.1, 10.0, size=120)
        x = jnp.asarray(np.concatenate([inliers, outliers]), jnp.float32)
        r = jnp.full((200,), 0.06, jnp.float32)
        est, inl = scale_consensus_1pt(x, r, key)
        assert est == pytest.approx(true, abs=0.05)
        # Inlier mask is computed from the pre-refinement candidate
        # (reference registration.cc:107), so the window may be offset from
        # the mode by up to one range — expect a solid majority, not all.
        assert int(jnp.sum(inl[:80])) >= 40
        assert int(jnp.sum(inl[:80])) > int(jnp.sum(inl[80:]))

    def test_warm_start_wins_when_good(self, key):
        """With a warm value exactly at the mode, candidate 0 reaches
        confidence immediately and the refined estimate stays at the mode."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            np.concatenate([2.0 + rng.uniform(-0.01, 0.01, 90), rng.uniform(5, 9, 10)]),
            jnp.float32,
        )
        r = jnp.full((100,), 0.02, jnp.float32)
        est, _ = scale_consensus_1pt(
            x, r, key, warm_value=jnp.asarray(2.0, jnp.float32), use_warm=True
        )
        assert est == pytest.approx(2.0, abs=0.01)


def test_jit_and_grad_safety():
    """All estimators must be jittable."""
    x = jnp.array([0.5, 1.0, 0.6, 0.7, 1.2])
    r = jnp.array([0.9, 0.9, 0.4, 0.5, 0.4])
    est, _ = jax.jit(tls_vote)(x, r)
    assert jnp.isfinite(est)
    est2, _ = jax.jit(max_stabbing)(x, 0.3)
    assert jnp.isfinite(est2)


class TestTranslationEndpoints:
    def test_matches_masked_full_solve(self, key):
        """solve_translation_endpoints must produce the identical estimate
        and point-inlier set as the full-(3,C) masked solve — it is the same
        stabbing problem at compact size (registration.cc:1114-1154 dedup +
        :1248-1250 solve)."""
        from psulvsb_tpu.robust.translation import (
            solve_translation,
            solve_translation_endpoints,
        )
        from psulvsb_tpu.solver.basic import endpoint_mask
        from psulvsb_tpu.utils.precision import mm

        c, L = 200, 64
        ks = jax.random.split(key, 6)
        src = jax.random.normal(ks[0], (3, c))
        rot = jnp.eye(3)
        t_true = jnp.array([0.3, -0.2, 0.5])
        dst = src + t_true[:, None]
        # 40% corrupted points
        bad = jax.random.uniform(ks[1], (c,)) < 0.4
        dst = jnp.where(bad[None, :], dst + jax.random.normal(ks[2], (3, c)), dst)
        b_i = jax.random.randint(ks[3], (L,), 0, c)
        b_j = jax.random.randint(ks[4], (L,), 0, c - 1)
        b_j = jnp.where(b_j >= b_i, b_j + 1, b_j)
        tim_mask = jax.random.uniform(ks[5], (L,)) < 0.7
        scale = jnp.float32(1.0)
        warm = jnp.zeros((3,))
        use_warm = jnp.asarray(False)

        pts = endpoint_mask(b_i, b_j, tim_mask, c)
        moved = scale * mm(rot, src)
        t_ref, inl_ref, _ = solve_translation(
            moved, dst, 0.05, 1.0, active=pts,
            warm_translation=warm, use_warm=use_warm,
        )
        t_cmp, inl_c, pts_c, _ = solve_translation_endpoints(
            src, dst, rot, scale, b_i, b_j, tim_mask, 0.05, 1.0,
            warm_translation=warm, use_warm=use_warm,
        )
        np.testing.assert_allclose(np.asarray(t_cmp), np.asarray(t_ref), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(pts_c), np.asarray(pts))
        np.testing.assert_array_equal(
            np.asarray(inl_c), np.asarray(inl_ref & pts)
        )

    def test_duplicate_endpoints_vote_once(self):
        """A point appearing in many TIMs must vote once (the dub[] dedup)."""
        from psulvsb_tpu.robust.translation import solve_translation_endpoints

        c = 10
        src = jnp.zeros((3, c)).at[0].set(jnp.arange(c, dtype=jnp.float32))
        t_true = jnp.array([0.0, 1.0, 0.0])
        dst = src + t_true[:, None]
        # Point 3 is corrupted and appears as an endpoint of EVERY TIM; if
        # duplicates voted, its interval would out-stab the good cluster.
        dst = dst.at[1, 3].set(50.0)
        b_i = jnp.full((8,), 3, jnp.int32)
        b_j = jnp.arange(8, dtype=jnp.int32)
        b_j = jnp.where(b_j >= 3, b_j + 1, b_j)
        mask = jnp.ones((8,), bool)
        t, inl, pts, _ = solve_translation_endpoints(
            src, dst, jnp.eye(3), jnp.float32(1.0), b_i, b_j, mask, 0.05, 1.0,
        )
        assert float(t[1]) == pytest.approx(1.0, abs=1e-5)
        assert not bool(inl[3])


class TestGlobalTranslationVote:
    """global_translation_vote — the repeated-geometry aliasing rescue
    (docs/FRONTEND_FAILURES.md; config.py translation_rescue)."""

    def _aliased(self, key, n_true=20, n_decoy=10, n_noise=70):
        """Correspondence set whose per-point translation proposals form a
        majority cluster at t_true and a rotation-consistent decoy cluster
        at t_true + offset (a translated copy of repeated geometry — TIMs
        cannot tell the clusters apart), plus unstructured noise."""
        from psulvsb_tpu.core.se3 import random_se3

        c = n_true + n_decoy + n_noise
        ks = jax.random.split(key, 4)
        src = jax.random.uniform(ks[0], (3, c), minval=-5.0, maxval=5.0)
        rot = random_se3(ks[1]).rotation
        t_true = jnp.array([0.4, -0.8, 1.2])
        t_decoy = t_true + jnp.array([3.0, 0.0, -2.0])
        dst = rot @ src + t_true[:, None]
        idx = jnp.arange(c)
        decoy = (idx >= n_true) & (idx < n_true + n_decoy)
        dst = jnp.where(decoy[None, :], rot @ src + t_decoy[:, None], dst)
        noise = idx >= n_true + n_decoy
        dst = jnp.where(
            noise[None, :],
            dst + jax.random.uniform(ks[2], (3, c), minval=-8.0, maxval=8.0),
            dst,
        )
        dst = dst + 0.01 * jax.random.normal(ks[3], (3, c))
        return src, dst, rot, t_true, t_decoy

    def test_rescues_decoy_translation(self, key):
        """Incumbent = the decoy cluster's translation (what the
        rotation-inlier subset stab picks when the subset is
        decoy-dominated): the vote must return the majority cluster's
        translation with strictly more support."""
        from psulvsb_tpu.robust.translation import global_translation_vote

        src, dst, rot, t_true, t_decoy = self._aliased(key)
        real = jnp.ones((src.shape[1],), bool)
        t_new, sup_new, sup_cur = global_translation_vote(
            src, dst, rot, jnp.float32(1.0), real, 0.1, 1.0, t_decoy,
            chunk=32,
        )
        assert int(sup_new) > int(sup_cur)
        assert int(sup_new) == 20 and int(sup_cur) == 10
        np.testing.assert_allclose(
            np.asarray(t_new), np.asarray(t_true), atol=0.05
        )

    def test_noop_when_incumbent_is_global_mode(self, key):
        """Incumbent already at the majority cluster: support cannot
        strictly improve, so the caller's sup_new > sup_cur gate holds the
        incumbent (rescue is a no-op by construction)."""
        from psulvsb_tpu.robust.translation import global_translation_vote

        src, dst, rot, t_true, _ = self._aliased(key)
        real = jnp.ones((src.shape[1],), bool)
        t_new, sup_new, sup_cur = global_translation_vote(
            src, dst, rot, jnp.float32(1.0), real, 0.1, 1.0, t_true,
            chunk=32,
        )
        assert int(sup_new) == int(sup_cur) == 20
        np.testing.assert_allclose(
            np.asarray(t_new), np.asarray(t_true), atol=0.05
        )

    def test_padding_never_votes(self, key):
        """Padded columns (real=False) must neither propose nor vote: a
        padding block placed exactly on the decoy cluster cannot flip the
        winner."""
        from psulvsb_tpu.robust.translation import global_translation_vote

        src, dst, rot, t_true, t_decoy = self._aliased(key)
        c = src.shape[1]
        # Append 40 fake columns that all agree with the decoy.
        pad_src = jax.random.uniform(
            jax.random.fold_in(key, 1), (3, 40), minval=-5.0, maxval=5.0
        )
        pad_dst = rot @ pad_src + t_decoy[:, None]
        src2 = jnp.concatenate([src, pad_src], axis=1)
        dst2 = jnp.concatenate([dst, pad_dst], axis=1)
        real = jnp.concatenate([jnp.ones((c,), bool), jnp.zeros((40,), bool)])
        t_new, sup_new, sup_cur = global_translation_vote(
            src2, dst2, rot, jnp.float32(1.0), real, 0.1, 1.0, t_decoy,
            chunk=32,
        )
        assert int(sup_new) == 20 and int(sup_cur) == 10
        np.testing.assert_allclose(
            np.asarray(t_new), np.asarray(t_true), atol=0.05
        )

    def test_scale_model(self, key):
        """dst = s*(R p + t): proposals live in the s-scaled space and the
        returned translation is already divided by s."""
        from psulvsb_tpu.robust.translation import global_translation_vote

        src, dst, rot, t_true, t_decoy = self._aliased(key)
        s = jnp.float32(2.5)
        t_new, sup_new, sup_cur = global_translation_vote(
            src, s * dst, rot, s, jnp.ones((src.shape[1],), bool),
            0.1, 1.0, t_decoy, chunk=32,
        )
        # NOTE dst was built as rot@src + t; s*dst = s*(rot@src + t) — the
        # solver's model with translation t and scale s.
        assert int(sup_new) == 20
        np.testing.assert_allclose(
            np.asarray(t_new), np.asarray(t_true), atol=0.05
        )
