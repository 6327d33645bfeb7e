"""Algorithm-variant and facade-API tests (registration_WT.cc baseline,
2025-07 experiment, sub-solver class facades)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psulvsb_tpu.core.metrics import angular_error_deg
from psulvsb_tpu.eval.synthetic import synthetic_cloud, make_synthetic_pair
from psulvsb_tpu.solver.config import SolverParams
from psulvsb_tpu.solver.psulvsb import psulvsb_solve, write_iteration_stats
from psulvsb_tpu.robust.scalar_tls import ScalarTLSEstimator
from psulvsb_tpu.robust.scale import TLSScaleSolver, ScaleInliersSelector
from psulvsb_tpu.robust.translation import TLSTranslationSolver
from psulvsb_tpu.rotation.gnc import GNCTLSRotationSolver
from psulvsb_tpu.rotation.fgr import FastGlobalRegistrationSolver

SMALL = dict(sampled_cap=512, basic_cap=256, hypothesis_batch=4, scale_max_draws=64)


class TestVariants:
    def test_cransac_wt_baseline_still_solves(self, key):
        src = jnp.asarray(synthetic_cloud(120, seed=0))
        pair = make_synthetic_pair(key, src, noise_bound=0.05, outlier_rate=0.8)
        params = SolverParams.preset_cransac_wt(**SMALL)
        assert not params.enable_self_update and not params.enable_refinement
        sol, info = psulvsb_solve(
            pair.src, pair.dst, jnp.ones((120,), jnp.int32), params,
            jax.random.PRNGKey(3),
        )
        re = float(angular_error_deg(pair.transform.rotation, sol.rotation))
        assert re < 5.0
        # No refinement ran.
        assert not bool(info["refined"])

    def test_self_update_disabled_keeps_mask(self, key):
        """With self-update off, dropped (keep == 0) points never re-enter."""
        n = 100
        src = jnp.asarray(synthetic_cloud(n, seed=1))
        pair = make_synthetic_pair(key, src, noise_bound=0.05, outlier_rate=0.7)
        keep = np.ones(n, np.int32)
        keep[::3] = 0  # drop a third, including some inliers
        params = SolverParams.preset_psulvsb_2025_07(
            noise_bound=0.05, noise_bound_dataset=0.05, estimate_scaling=False,
            **SMALL,
        )
        sol, info = psulvsb_solve(
            pair.src, pair.dst, jnp.asarray(keep), params, jax.random.PRNGKey(5)
        )
        assert bool(sol.valid)

    def test_iteration_stats_writer(self, tmp_path, key):
        src = jnp.asarray(synthetic_cloud(80, seed=2))
        pair = make_synthetic_pair(key, src, noise_bound=0.05, outlier_rate=0.5)
        params = SolverParams.preset_artificial(**SMALL)
        _, info = psulvsb_solve(
            pair.src, pair.dst, jnp.ones((80,), jnp.int32), params,
            jax.random.PRNGKey(7),
        )
        p = str(tmp_path / "static.txt")
        write_iteration_stats(p, info)
        lines = open(p).read().splitlines()
        assert len(lines) == 3
        assert int(lines[0]) == info["rounds"]
        assert int(lines[2]) == info["total_hypotheses"] > 0


class TestSubSolverFacades:
    def test_scalar_tls_estimator(self):
        est = ScalarTLSEstimator()
        x = jnp.array([0.5, 1.0, 0.6, 0.7, 1.2, 10.0])
        r = jnp.array([0.9, 0.9, 0.4, 0.5, 0.4, 0.5])
        e, inl = est.estimate_tiled(x, r)
        assert float(e) == pytest.approx(0.8383, abs=1e-3)
        e2, _ = est.estimate(x, r, mode="scale")
        assert 0.4 < float(e2) < 1.3
        e3, _ = est.estimate(jnp.array([2.0, 2.1, 1.9, 7.0]), r[:4],
                             mode="translation", noise=0.2)
        assert float(e3) == pytest.approx(2.0, abs=0.1)

    def test_scale_solvers(self, rng):
        src = jnp.asarray(rng.normal(size=(3, 40)), jnp.float32)
        dst = 1.5 * src
        s, inl = TLSScaleSolver(0.01, 1.0).solveForScale(src, dst)
        assert float(s) == pytest.approx(1.5, abs=0.02)
        s2, inl2 = ScaleInliersSelector(0.01, 1.0).solveForScale(src, src)
        assert float(s2) == 1.0
        assert bool(jnp.all(inl2))

    def test_rotation_translation_facades(self, rng):
        from tests.test_core import random_rotation

        r_true = random_rotation(rng)
        src = jnp.asarray(rng.normal(size=(3, 50)), jnp.float32)
        dst = jnp.asarray(r_true, jnp.float32) @ src
        r, inl = GNCTLSRotationSolver(noise_bound=0.01).solveForRotation(src, dst)
        np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-3)
        r2, _ = FastGlobalRegistrationSolver(noise_bound=0.01).solveForRotation(src, dst)
        np.testing.assert_allclose(np.asarray(r2), r_true, atol=1e-2)
        t_true = np.array([0.3, -0.2, 0.7], np.float32)
        t, _ = TLSTranslationSolver(0.01, 1.0).solveForTranslation(
            src, src + jnp.asarray(t_true)[:, None]
        )
        np.testing.assert_allclose(np.asarray(t), t_true, atol=0.02)


class TestVariantComparison:
    def test_self_update_recovers_prefiltered_inliers(self, key):
        """The PSULVSB self-update's reason to exist: when the pre-filter
        wrongly drops true inliers (keep = 0), the full algorithm re-admits
        them while the C-RANSAC WT baseline cannot. Verify via the final
        keep mask escalation: with self-update the solve still succeeds when
        MOST inliers start dropped."""
        n = 150
        src = jnp.asarray(synthetic_cloud(n, seed=9))
        pair = make_synthetic_pair(key, src, noise_bound=0.05, outlier_rate=0.8)
        out = np.asarray(pair.outlier_mask)
        keep = np.ones(n, np.int32)
        inlier_idx = np.where(~out)[0]
        # Drop two thirds of the true inliers from the initial reduced set.
        keep[inlier_idx[:: 3]] = 0
        keep[inlier_idx[1:: 3]] = 0

        params_full = SolverParams.preset_artificial(**SMALL)
        sol_full, info_full = psulvsb_solve(
            pair.src, pair.dst, jnp.asarray(keep), params_full, jax.random.PRNGKey(2)
        )
        re_full = float(angular_error_deg(pair.transform.rotation, sol_full.rotation))
        assert re_full < 5.0, re_full
        # Self-update must have counted dropped inliers as final inliers.
        readmitted = (np.asarray(info_full["final_inliers"]) == 1) & (keep == 0)
        assert readmitted.sum() > 0, "self-update never re-admitted a dropped point"
