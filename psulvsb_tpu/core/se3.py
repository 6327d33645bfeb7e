"""SE(3) types and transforms as pytrees.

The reference passes 4x4 homogeneous Eigen matrices around (e.g.
PSULVSB.cc:256-283, registration.cc:1296-1329). Here a transform is the
(scale, rotation, translation) triple applied as p -> s * (R p + t) — note
the PSULVSB convention: the solver divides t by s (registration.cc:1250) and
then always scores with scale * (R p + t) (registration.cc:1329,1417).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from psulvsb_tpu.utils.precision import mm


class SE3(NamedTuple):
    """Similarity transform: p -> scale * (rotation @ p + translation)."""

    scale: jax.Array  # ()
    rotation: jax.Array  # (3, 3)
    translation: jax.Array  # (3,)

    @staticmethod
    def identity(dtype=jnp.float32) -> "SE3":
        return SE3(
            scale=jnp.ones((), dtype=dtype),
            rotation=jnp.eye(3, dtype=dtype),
            translation=jnp.zeros((3,), dtype=dtype),
        )

    def as_matrix(self) -> jax.Array:
        """4x4 homogeneous matrix of s*(R p + t)."""
        m = jnp.eye(4, dtype=self.rotation.dtype)
        m = m.at[:3, :3].set(self.scale * self.rotation)
        m = m.at[:3, 3].set(self.scale * self.translation)
        return m


def transform_points(t: SE3, pts: jax.Array) -> jax.Array:
    """Apply p -> s * (R p + t) to a (3, N) point matrix."""
    return t.scale * (mm(t.rotation, pts) + t.translation[:, None])


def compose_srt(outer_r: jax.Array, outer_t: jax.Array, inner: SE3) -> SE3:
    """Compose p -> outer_r @ (inner(p)) + outer_t, keeping inner's scale.

    Mirrors weightedSVD's `finalTransform * initialTransform`
    (registration.cc:562-566) where the initial transform embeds (R, t) with
    scale applied outside.
    """
    return SE3(
        scale=inner.scale,
        rotation=mm(outer_r, inner.rotation),
        translation=mm(outer_r, inner.translation) + outer_t / jnp.maximum(inner.scale, 1e-30),
    )


def rodrigues(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Axis-angle -> rotation matrix (Rodrigues). Ref PSULVSB.cc:259-271."""
    axis = axis / (jnp.linalg.norm(axis) + 1e-30)
    k = jnp.array(
        [
            [0.0, -axis[2], axis[1]],
            [axis[2], 0.0, -axis[0]],
            [-axis[1], axis[0], 0.0],
        ],
        dtype=axis.dtype,
    )
    eye = jnp.eye(3, dtype=axis.dtype)
    return eye + jnp.sin(angle) * k + (1.0 - jnp.cos(angle)) * mm(k, k)


def random_se3(key: jax.Array, max_translation: float = 3.0, dtype=jnp.float32) -> SE3:
    """Random SE(3) following the synthetic protocol of PSULVSB.cc:256-278:
    uniform random axis, uniform angle in [0, pi), translation of uniform
    random direction with norm uniform in [0, max_translation).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    axis = jax.random.uniform(k1, (3,), dtype=dtype, minval=-1.0, maxval=1.0)
    angle = jax.random.uniform(k2, (), dtype=dtype, minval=0.0, maxval=jnp.pi)
    r = rodrigues(axis, angle)
    t_dir = jax.random.uniform(k3, (3,), dtype=dtype, minval=-0.5, maxval=0.5)
    t_dir = t_dir / (jnp.linalg.norm(t_dir) + 1e-30)
    t_norm = max_translation * jax.random.uniform(k4, (), dtype=dtype)
    return SE3(scale=jnp.ones((), dtype=dtype), rotation=r, translation=t_norm * t_dir)
