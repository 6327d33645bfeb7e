"""Registration solution pytree.

Equivalent of teaser::RegistrationSolution
(/root/reference/teaser/include/teaser/registration.h:34-41) with the
PSULVSB `final_inlier_count` field (set at registration.cc:1528) and the
validity flag (registration.cc:1031-1036, 1531).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RegistrationSolution(NamedTuple):
    valid: jax.Array  # () bool
    scale: jax.Array  # ()
    rotation: jax.Array  # (3, 3)
    translation: jax.Array  # (3,)
    final_inlier_count: jax.Array  # () int32

    @staticmethod
    def identity(dtype=jnp.float32) -> "RegistrationSolution":
        return RegistrationSolution(
            valid=jnp.zeros((), bool),
            scale=jnp.ones((), dtype),
            rotation=jnp.eye(3, dtype=dtype),
            translation=jnp.zeros((3,), dtype),
            final_inlier_count=jnp.zeros((), jnp.int32),
        )
