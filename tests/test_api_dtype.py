"""API facade dtype passthrough (VERDICT r2 #9): f64 callers either get a
real f64 solve (x64 enabled, like the reference's Eigen pipeline) or an
explicit downcast warning — never a silent f32 result."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psulvsb_tpu.api import RobustRegistrationSolver
from psulvsb_tpu.core.metrics import angular_error_deg
from psulvsb_tpu.eval.synthetic import synthetic_cloud, make_synthetic_pair
from psulvsb_tpu.solver.config import SolverParams


PARAMS = SolverParams.preset_artificial(
    sampled_cap=512, basic_cap=256, hypothesis_batch=8
)


def _pair():
    base = jnp.asarray(synthetic_cloud(200, seed=7))
    return make_synthetic_pair(
        jax.random.PRNGKey(1), base, noise_bound=0.05, outlier_rate=0.8
    )


class TestFacadeDtype:
    def test_f32_input_stays_f32_no_warning(self):
        pair = _pair()
        solver = RobustRegistrationSolver(PARAMS, seed=0)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            sol = solver.solve(np.asarray(pair.src, np.float32),
                               np.asarray(pair.dst, np.float32))
        assert sol.rotation.dtype == jnp.float32

    def test_f64_input_warns_without_x64(self):
        pair = _pair()
        solver = RobustRegistrationSolver(PARAMS, seed=0)
        with pytest.warns(UserWarning, match="float64 input downcast"):
            sol = solver.solve(np.asarray(pair.src, np.float64),
                               np.asarray(pair.dst, np.float64))
        assert sol.rotation.dtype == jnp.float32

    def test_f64_input_solves_in_f64_with_x64(self):
        pair = _pair()
        with jax.enable_x64(True):
            solver = RobustRegistrationSolver(PARAMS, seed=0)
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                sol = solver.solve(np.asarray(pair.src, np.float64),
                                   np.asarray(pair.dst, np.float64))
            assert sol.rotation.dtype == jnp.float64
            re = float(angular_error_deg(pair.transform.rotation, sol.rotation))
            assert re < 5.0

    def test_decoupled_f64_with_x64(self):
        pair = _pair()
        with jax.enable_x64(True):
            solver = RobustRegistrationSolver(
                PARAMS.replace(estimate_scaling=True), seed=0
            )
            sol = solver.solve_decoupled(
                np.asarray(pair.src, np.float64), np.asarray(pair.dst, np.float64)
            )
            assert sol.rotation.dtype == jnp.float64
