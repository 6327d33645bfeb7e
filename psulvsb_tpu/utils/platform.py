"""Restore `JAX_PLATFORMS` env-var semantics for entry-point scripts.

Some environments install a sitecustomize hook that registers an
out-of-tree backend by calling `jax.config.update("jax_platforms", ...)`
at interpreter start, silently overriding the user's `JAX_PLATFORMS`
env var. A user who sets `JAX_PLATFORMS=cpu` then gets the remote backend
anyway — and if its transport is down, the first device op hangs
indefinitely. Entry points (examples/, cli.py) call this once after
imports so the env var means what it says.
"""

from __future__ import annotations

import os


def respect_env_platforms() -> None:
    """If JAX_PLATFORMS is set, re-apply it over any sitecustomize override.

    No-op when the env var is unset or jax is already initialized (config
    updates after backend init raise; by then the platform is fixed anyway).
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except RuntimeError:
        pass
