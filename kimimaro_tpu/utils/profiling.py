"""Lightweight phase timing.

The reference's observability is tqdm progress bars plus offline benchmark
artifacts (SURVEY.md §5.1). Here: a nestable phase timer that prints when
KIMIMARO_TPU_PROFILE=1 (or profile=True), used by the skeletonize driver to
report Preamble / Border / Trace / Finalize times (the phase split the
reference documents in README.md:54 but never instruments).
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

_ENABLED = os.environ.get("KIMIMARO_TPU_PROFILE", "") not in ("", "0")


def enabled() -> bool:
    return _ENABLED


@contextmanager
def phase(name: str, sync=None):
    """Time a phase; `sync` is an optional jax array (or pytree) blocked on
    before stopping the clock so async dispatch doesn't hide device time."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        print(f"[kimimaro_tpu] {name}: {time.perf_counter() - t0:.3f}s")
