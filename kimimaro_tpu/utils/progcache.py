"""Cross-process program cache built on jax.export.

JAX's persistent compilation cache skips XLA *compiles* but not Python
*tracing*: every fresh process re-traces each jitted program, and the
engine's vmapped whole-trace kernel costs seconds of pure tracing per
(bucket shape, lane count) variant — profiled as the dominant cost of the
CPU test suite (28.5 s of a 38 s test was trace_to_jaxpr). This module
persists the lowered StableHLO (jax.export serialization) keyed by
(function name, static config, argument signature, backend, package
source hash); a hit deserializes and calls without tracing any Python.

Opt-in via KIMIMARO_TPU_PROGCACHE=1 (the test conftest sets it). The
exported call path drops buffer donation, so the TPU bench path — which
relies on donation for HBM headroom — keeps the direct jit call by
default.
"""

from __future__ import annotations

import functools
import hashlib
import os
import threading

_DIR = None
_mem = {}
_lock = threading.Lock()
_src_hash = None


def _cache_dir() -> str:
    global _DIR
    if _DIR is None:
        _DIR = os.environ.get(
            "KIMIMARO_TPU_PROGCACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                ".jax_cache", "export",
            ),
        )
    return _DIR


def enabled() -> bool:
    return os.environ.get("KIMIMARO_TPU_PROGCACHE", "0") not in ("", "0")


def _code_fingerprint(src: str) -> bytes:
    """AST dump with docstrings stripped: comment- and docstring-only
    edits keep the fingerprint stable (a full re-export of every program
    for a typo fix costs ~10 minutes of suite time)."""
    import ast

    try:
        tree = ast.parse(src)
    except SyntaxError:
        return src.encode()
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(body, list) and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:] or [ast.Pass()]
    return ast.dump(tree).encode()


def _source_hash() -> str:
    """Hash of every .py file's code (comments/docstrings excluded) in the
    package + the jax version: any code change invalidates all exported
    programs (they bake in the traced logic, so a stale hit would
    silently run old code)."""
    global _src_hash
    if _src_hash is None:
        import jax

        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for root, dirs, files in sorted(os.walk(pkg)):
            dirs.sort()
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    h.update(p.encode())
                    with open(p, "r", errors="replace") as fh:
                        h.update(_code_fingerprint(fh.read()))
        h.update(jax.__version__.encode())
        _src_hash = h.hexdigest()[:16]
    return _src_hash


def call(name: str, jitted_fn, static_kwargs: dict, *args,
         donates: bool = False):
    """`jitted_fn(*args, **static_kwargs)` through the export cache.

    jitted_fn: a jax.jit-wrapped callable whose `static_kwargs` are all
    hashable statics; args: array/scalar positional arguments. Falls back
    to the direct call when the cache is disabled or export fails (e.g.
    primitives without StableHLO serialization on this backend).

    donates=True marks functions whose jit donates input buffers: the
    export path drops donation, so on accelerators those keep the direct
    jit call (HBM headroom matters at 512^3); on CPU the export path
    still applies (the test suite's tracing cost dominates there)."""
    if not enabled():
        return jitted_fn(*args, **static_kwargs)

    import jax
    import numpy as np

    if donates and jax.default_backend() != "cpu":
        return jitted_fn(*args, **static_kwargs)

    sig = ",".join(
        f"{tuple(getattr(a, 'shape', ()))}:"
        f"{getattr(a, 'dtype', type(a).__name__)}"
        for a in args
    )
    key_src = "|".join([
        name,
        repr(sorted(static_kwargs.items())),
        sig,
        jax.default_backend(),
        str(jax.local_device_count()),
        _source_hash(),
        # env toggles that change traced logic (a stale hit would
        # silently run the other variant)
        os.environ.get("KIMIMARO_TPU_PALLAS_ARGMAX", "auto"),
    ])
    key = hashlib.sha256(key_src.encode()).hexdigest()[:32]

    exp = _mem.get(key)
    if exp is None:
        with _lock:
            exp = _mem.get(key)
            if exp is None:
                path = os.path.join(_cache_dir(), key + ".bin")
                if os.path.exists(path):
                    with open(path, "rb") as fh:
                        exp = jax.export.deserialize(bytearray(fh.read()))
                else:
                    specs = [
                        jax.ShapeDtypeStruct(a.shape, a.dtype)
                        if hasattr(a, "dtype") else a
                        for a in args
                    ]
                    try:
                        exp = jax.export.export(
                            jax.jit(functools.partial(
                                jitted_fn, **static_kwargs))
                        )(*specs)
                    except Exception:
                        return jitted_fn(*args, **static_kwargs)
                    os.makedirs(_cache_dir(), exist_ok=True)
                    tmp = path + f".tmp{os.getpid()}"
                    with open(tmp, "wb") as fh:
                        fh.write(exp.serialize())
                    os.replace(tmp, path)
                    _prune()
                _mem[key] = exp
    return exp.call(*args)


_PRUNE_MAX = 8192


def _prune():
    """Source-hash keys strand old entries on every commit; keep the
    directory bounded by dropping the oldest half when it overflows."""
    try:
        names = os.listdir(_cache_dir())
    except OSError:
        return
    if len(names) <= _PRUNE_MAX:
        return
    paths = []
    for nm in names:
        p = os.path.join(_cache_dir(), nm)
        try:
            paths.append((os.path.getmtime(p), p))
        except OSError:
            pass
    paths.sort()
    for _, p in paths[: len(paths) // 2]:
        try:
            os.remove(p)
        except OSError:
            pass
