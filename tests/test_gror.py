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


class TestGrorInit:
    """GROR wired into the PSULVSB loop as the initial-alignment stage
    (registration_artificial.cc:571-576: GROR's transform seeds the solver;
    here it seeds the warm state, config.gror_init)."""

    BASE = dict(
        sampled_cap=256,
        basic_cap=128,
        hypothesis_batch=4,
        scale_max_draws=64,
        local_max_iter=5,
        max_host_rounds=2,
    )

    @pytest.mark.slow
    def test_rescues_hostile_pair(self):
        """97% realistic (mismatch) outliers under a tight hypothesis budget:
        the cold start misses the basin, the GROR-seeded solve lands it.

        clique_init="off" on BOTH sides: the test isolates GROR's rescue,
        and the escalation clique seed (r5's triangle ordering) now solves
        this fixture on its own — with it on there is no hostile cold
        baseline left to rescue."""
        from psulvsb_tpu.solver.config import SolverParams
        from psulvsb_tpu.solver.psulvsb import psulvsb_solve

        src = jnp.asarray(synthetic_cloud(400, seed=3))
        pair = make_synthetic_pair(
            jax.random.PRNGKey(7), src, noise_bound=0.01, outlier_rate=0.97,
            outlier_mode="mismatch",
        )
        keep = jnp.ones((400,), jnp.int32)
        p_cold = SolverParams.preset_artificial(clique_init="off", **self.BASE)
        p_gror = SolverParams.preset_artificial_gror(
            gror_resolution=0.05, gror_k_optimal=200, clique_init="off",
            **self.BASE
        )
        sol_c, info_c = psulvsb_solve(pair.src, pair.dst, keep, p_cold,
                                      jax.random.PRNGKey(2))
        sol_g, info_g = psulvsb_solve(pair.src, pair.dst, keep, p_gror,
                                      jax.random.PRNGKey(2))
        re_c = float(angular_error_deg(pair.transform.rotation, sol_c.rotation))
        re_g = float(angular_error_deg(pair.transform.rotation, sol_g.rotation))
        assert info_g["gror_init"] and not info_c["gror_init"]
        assert re_c > 5.0, f"fixture no longer hostile to cold start: {re_c}"
        assert re_g < 5.0, re_g
        te_g = float(
            jnp.linalg.norm(sol_g.translation - pair.transform.translation)
        )
        assert te_g < 0.3, te_g

    def test_fewer_hypotheses_same_accuracy(self):
        """On the published displace protocol the warm baseline lets the
        local loop terminate earlier without losing the solution."""
        from psulvsb_tpu.solver.config import SolverParams
        from psulvsb_tpu.solver.psulvsb import psulvsb_solve

        src = jnp.asarray(synthetic_cloud(300, seed=3))
        pair = make_synthetic_pair(
            jax.random.PRNGKey(5), src, noise_bound=0.01, outlier_rate=0.97
        )
        keep = jnp.ones((300,), jnp.int32)
        p_cold = SolverParams.preset_artificial(**self.BASE)
        p_gror = SolverParams.preset_artificial_gror(
            gror_resolution=0.05, gror_k_optimal=200, **self.BASE
        )
        sol_c, info_c = psulvsb_solve(pair.src, pair.dst, keep, p_cold,
                                      jax.random.PRNGKey(2))
        sol_g, info_g = psulvsb_solve(pair.src, pair.dst, keep, p_gror,
                                      jax.random.PRNGKey(2))
        re_g = float(angular_error_deg(pair.transform.rotation, sol_g.rotation))
        assert re_g < 5.0, re_g
        assert info_g["total_hypotheses"] < info_c["total_hypotheses"]

    def test_fused_gror_init(self):
        """gror_init traces into the single-dispatch fused solve."""
        from psulvsb_tpu.solver.config import SolverParams
        from psulvsb_tpu.solver.fused import psulvsb_register

        src = jnp.asarray(synthetic_cloud(400, seed=3))
        pair = make_synthetic_pair(
            jax.random.PRNGKey(7), src, noise_bound=0.01, outlier_rate=0.97,
            outlier_mode="mismatch",
        )
        keep = jnp.ones((400,), jnp.int32)
        p = SolverParams.preset_artificial_gror(
            gror_resolution=0.05, gror_k_optimal=200, **self.BASE
        )
        sol = psulvsb_register(pair.src, pair.dst, keep, jax.random.PRNGKey(2), p)
        re = float(angular_error_deg(pair.transform.rotation, sol.rotation))
        assert bool(sol.valid)
        assert re < 5.0, re
