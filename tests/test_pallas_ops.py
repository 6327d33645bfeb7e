"""Pallas pair-grid kernel tests (interpret mode on CPU; the same kernels
compile natively on TPU — exercised by bench/GROR runs there)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psulvsb_tpu.ops.pallas_pairs import consistency_degree


def ref_degree(src, dst, tau, active=None):
    c = src.shape[1]
    ds = np.linalg.norm(src[:, :, None] - src[:, None, :], axis=0)
    dt = np.linalg.norm(dst[:, :, None] - dst[:, None, :], axis=0)
    ok = np.abs(ds - dt) < tau
    np.fill_diagonal(ok, False)
    if active is not None:
        ok &= active[None, :] & active[:, None]
        return np.where(active, ok.sum(1), 0)
    return ok.sum(1)


class TestConsistencyDegree:
    @pytest.mark.parametrize("c", [64, 300, 517])
    def test_matches_dense_reference(self, rng, c):
        src = rng.normal(size=(3, c)).astype(np.float32)
        dst = rng.normal(size=(3, c)).astype(np.float32)
        # Half the pairs get consistent geometry.
        dst[:, : c // 2] = src[:, : c // 2] + 0.3
        deg = np.asarray(consistency_degree(jnp.asarray(src), jnp.asarray(dst), 0.05))
        ref = ref_degree(src, dst, 0.05)
        np.testing.assert_array_equal(deg, ref)

    def test_active_mask(self, rng):
        c = 128
        src = rng.normal(size=(3, c)).astype(np.float32)
        dst = (src + 0.1).astype(np.float32)
        active = np.zeros(c, bool)
        active[: c // 2] = True
        deg = np.asarray(
            consistency_degree(
                jnp.asarray(src), jnp.asarray(dst), 0.05, active=jnp.asarray(active)
            )
        )
        ref = ref_degree(src, dst, 0.05, active)
        np.testing.assert_array_equal(deg[: c // 2], ref[: c // 2])
        assert (deg[c // 2 :] == 0).all()
