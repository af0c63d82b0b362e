"""Lightweight phase timing and run counters.

The reference's observability is tqdm progress bars plus offline benchmark
artifacts (SURVEY.md §5.1). Here: a nestable phase timer that prints when
KIMIMARO_TPU_PROFILE=1 (or profile=True) and, when collection is switched
on (`collect(True)`), accumulates per-phase wall seconds and named counters
(e.g. how many engine jobs fell back to the host loop) so benchmarks can
report the reference's documented Preamble / Trace / Finalize phase split
(reference README.md:54) as machine-readable numbers.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from typing import Dict

_ENABLED = os.environ.get("KIMIMARO_TPU_PROFILE", "") not in ("", "0")
_COLLECT = False
_STATS: Dict[str, float] = {}
_COUNTERS: Dict[str, int] = {}


def enabled() -> bool:
    return _ENABLED


def collect(on: bool = True) -> None:
    """Turn on in-memory accumulation of phase times and counters."""
    global _COLLECT
    _COLLECT = on


def reset_stats() -> None:
    _STATS.clear()
    _COUNTERS.clear()


def get_stats() -> dict:
    """{"phases": {name: seconds}, "counters": {name: n}} accumulated
    since the last reset_stats()."""
    return {"phases": dict(_STATS), "counters": dict(_COUNTERS)}


def count(name: str, n: int = 1) -> None:
    """Bump a named counter (recorded only while collecting/profiling)."""
    if not (_COLLECT or _ENABLED):
        return
    _COUNTERS[name] = _COUNTERS.get(name, 0) + int(n)


@contextmanager
def phase(name: str, sync=None):
    """Time a phase; `sync` is an optional jax array (or pytree) blocked on
    before stopping the clock so async dispatch doesn't hide device time."""
    if not (_ENABLED or _COLLECT):
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        if _COLLECT:
            _STATS[name] = _STATS.get(name, 0.0) + dt
        if _ENABLED:
            print(f"[kimimaro_tpu] {name}: {dt:.3f}s")
