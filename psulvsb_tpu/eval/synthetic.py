"""Synthetic experiment protocol — the published PSULVSB driver's data
generator (/root/reference/examples/teaser_cpp_ply/PSULVSB.cc):

- random SE(3): uniform axis, angle in [0, pi), ||t|| <= 3 (PSULVSB.cc:256-278)
- per-coordinate uniform noise in [-noise_bound, +noise_bound]
  (addNoiseAndOutliers, PSULVSB.cc:190-194: Eigen ::Random * NOISE_BOUND)
- outliers: a fraction of target points displaced per-axis by a uniform
  draw from ±[5, 10] (PSULVSB.cc:196-221)

The reference loads the Stanford bunny PLY; here a deterministic synthetic
surface cloud stands in (any cloud works — the protocol only needs points).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from psulvsb_tpu.core.se3 import SE3, random_se3, transform_points


def synthetic_cloud(n: int, seed: int = 0, dtype=np.float32) -> np.ndarray:
    """Deterministic blobby closed surface: unit sphere modulated by a few
    random spherical harmonics — bunny-scale geometry (coords ~ ±1) with
    non-trivial normals. Returns (3, n)."""
    rng = np.random.default_rng(seed)
    theta = np.arccos(1 - 2 * rng.uniform(size=n))
    phi = rng.uniform(0, 2 * np.pi, size=n)
    r = 1.0
    for k in range(3, 7):
        a = rng.normal() * 0.08
        b = rng.normal() * 0.08
        r = r + a * np.cos(k * theta) + b * np.sin(k * phi) * np.sin(theta)
    pts = np.stack(
        [
            r * np.sin(theta) * np.cos(phi),
            r * np.sin(theta) * np.sin(phi),
            r * np.cos(theta),
        ]
    )
    return pts.astype(dtype)


class SyntheticPair(NamedTuple):
    src: jax.Array  # (3, N)
    dst: jax.Array  # (3, N)
    transform: SE3  # ground truth
    outlier_mask: jax.Array  # (N,) bool — True where dst was corrupted


def make_synthetic_pair(
    key: jax.Array,
    src: jax.Array,
    noise_bound: float = 0.05,
    outlier_rate: float = 0.9,
    max_translation: float = 3.0,
    outlier_mode: str = "displace",
) -> SyntheticPair:
    """dst = T(src) + uniform noise, then `outlier_rate` of the points are
    corrupted.

    outlier_mode:
      "displace" — large per-axis displacement with magnitude uniform in
        [5, 10] and random sign (PSULVSB.cc:196-221, the published
        protocol). Displaced points float in space, so normals estimated on
        the corrupted cloud are garbage — hostile to the normal-angle
        pre-filter by construction.
      "mismatch" — the outlier's dst is the (transformed, noisy) position of
        a DIFFERENT random src point: both endpoints remain real surface
        points, like wrong FPFH/FCGF matches on real scans. Use this for
        realistic correspondence-benchmark fixtures.
    """
    n = src.shape[1]
    k_t, k_noise, k_sel, k_mag, k_sign = jax.random.split(key, 5)
    gt = random_se3(k_t, max_translation=max_translation, dtype=src.dtype)
    dst = transform_points(gt, src)
    dst = dst + jax.random.uniform(
        k_noise, dst.shape, dtype=src.dtype, minval=-noise_bound, maxval=noise_bound
    )

    n_out = int(round(n * outlier_rate))
    perm = jax.random.permutation(k_sel, n)
    outlier_mask = jnp.zeros((n,), bool).at[perm[:n_out]].set(True)
    if outlier_mode == "displace":
        mag = jax.random.uniform(
            k_mag, (3, n), dtype=src.dtype, minval=5.0, maxval=10.0
        )
        sign = jnp.where(
            jax.random.uniform(k_sign, (3, n), dtype=src.dtype) <= 0.5, -1.0, 1.0
        )
        dst = jnp.where(outlier_mask[None, :], dst + sign * mag, dst)
    elif outlier_mode == "mismatch":
        wrong = jax.random.permutation(k_mag, n)
        dst = jnp.where(outlier_mask[None, :], dst[:, wrong], dst)
    else:
        raise ValueError(f"unknown outlier_mode {outlier_mode!r}")
    return SyntheticPair(src=src, dst=dst, transform=gt, outlier_mask=outlier_mask)
