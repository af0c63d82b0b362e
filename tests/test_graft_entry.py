"""The driver compile-checks __graft_entry__.entry() single-chip; keep it
compiling (a host-synced escalation inside a traced function broke it
once: geodesic.distance_field must stay jit-safe)."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_lowers_and_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    jax.jit(fn).lower(*args).compile()
