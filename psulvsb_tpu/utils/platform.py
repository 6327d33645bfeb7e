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

    When the requested list names only remote/accelerator platforms, the
    host `cpu` backend is appended as a NON-default extra. The default
    device (first entry) is unchanged, but code that explicitly pins tiny
    host-side work to `jax.devices("cpu")` — e.g. eval/make_dataset.py's
    per-pair generation, measured ~5 s/pair through the axon tunnel vs ~ms
    on host — keeps working instead of silently falling through to the
    tunnel. `JAX_PLATFORMS=cpu` still means cpu-only.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    # PSULVSB_NO_CPU_FALLBACK=1 opts out of the appended host backend and
    # restores JAX's documented exact-list semantics (advice r4: code that
    # gates on `jax.devices("cpu")` existing should be able to see the
    # env var verbatim).
    if os.environ.get("PSULVSB_NO_CPU_FALLBACK"):
        value = want
    else:
        value = with_cpu_fallback(want)
    try:
        jax.config.update("jax_platforms", value)
    except RuntimeError:
        pass


def with_cpu_fallback(want: str) -> str:
    """Append `cpu` as a non-default platform unless already listed.

    The first entry stays the default device; `cpu` at the end only makes
    `jax.devices("cpu")` resolvable for explicitly host-pinned work.
    """
    platforms = [p.strip() for p in want.split(",") if p.strip()]
    if "cpu" not in platforms:
        platforms.append("cpu")
    return ",".join(platforms)
