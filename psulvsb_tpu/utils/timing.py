"""Tracing / profiling / logging utilities.

Equivalent of the reference's compile-time chrono + stdout macros
(/root/reference/teaser/include/teaser/macros.h:13-69:
TEASER_DEBUG_DECLARE/START/STOP/GET_TIMING, TEASER_DEBUG_INFO_MSG,
TEASER_INFO_MSG_THROTTLE, gated by NDEBUG/TEASER_DIAG_PRINT), rebuilt as:

- `Timer` / `timed(...)`: wall-clock spans with `jax.block_until_ready`
  (device work is async — a bare chrono span measures dispatch, not
  compute),
- `trace(...)`: a `jax.profiler.trace` context writing an xprof trace dir,
- `log` / `log_throttled`: stdlib-logging-backed equivalents of the info
  macros, enabled via PSULVSB_DIAG=1 (the TEASER_DIAG_PRINT analog).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

import jax

logger = logging.getLogger("psulvsb_tpu")
if os.environ.get("PSULVSB_DIAG", "0") == "1":
    logging.basicConfig(level=logging.INFO)
    logger.setLevel(logging.INFO)

_throttle_counts: dict[str, int] = {}


def log(msg: str) -> None:
    """TEASER_DEBUG_INFO_MSG analog (macros.h:18-28)."""
    logger.info(msg)


def log_throttled(key: str, msg: str, every: int = 10) -> None:
    """TEASER_INFO_MSG_THROTTLE analog (macros.h:42-60)."""
    c = _throttle_counts.get(key, 0)
    if c % every == 0:
        logger.info(msg)
    _throttle_counts[key] = c + 1


class Timer:
    """TEASER_DEBUG_DECLARE/START/STOP/GET_TIMING analog (macros.h:62-68),
    with device-sync semantics."""

    def __init__(self, name: str = ""):
        self.name = name
        self.elapsed_s = 0.0
        self._t0 = None

    def start(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.elapsed_s += time.perf_counter() - self._t0
        return self.elapsed_s

    def get_timing(self) -> float:
        return self.elapsed_s


@contextlib.contextmanager
def timed(name: str, sync_on=None):
    """Context-manager span; logs at exit when diagnostics are enabled."""
    t = Timer(name).start()
    result = {}
    try:
        yield result
    finally:
        result["elapsed_s"] = t.stop(sync_on=sync_on)
        log(f"[{name}] {result['elapsed_s']:.4f}s")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/psulvsb_trace"):
    """jax.profiler trace span (xprof); view with tensorboard or xprof."""
    with jax.profiler.trace(log_dir):
        yield log_dir
