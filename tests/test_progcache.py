"""Unit tests for the export-backed program cache (utils/progcache.py)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kimimaro_tpu.utils import progcache


@functools.partial(jax.jit, static_argnames=("n",))
def _toy(x, y, n: int):
    def body(c, _):
        return c * 1.5 + y, c.sum()

    out, hist = jax.lax.scan(body, x, None, length=n)
    return out, hist


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("KIMIMARO_TPU_PROGCACHE", "1")
    monkeypatch.setenv("KIMIMARO_TPU_PROGCACHE_DIR", str(tmp_path))
    monkeypatch.setattr(progcache, "_DIR", None)
    monkeypatch.setattr(progcache, "_mem", {})
    return tmp_path


def test_hit_matches_direct(cache_dir):
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    y = np.ones(4, np.float32)
    direct = _toy(x, y, n=3)
    via = progcache.call("toy", _toy, dict(n=3), x, y)
    assert np.allclose(direct[0], via[0]) and np.allclose(direct[1], via[1])
    files = [f for f in os.listdir(cache_dir) if f.endswith(".bin")]
    assert len(files) == 1

    # second call must come from the in-memory table; third from disk
    via2 = progcache.call("toy", _toy, dict(n=3), x, y)
    assert np.allclose(direct[0], via2[0])
    progcache._mem.clear()
    via3 = progcache.call("toy", _toy, dict(n=3), x, y)
    assert np.allclose(direct[0], via3[0])
    assert len(os.listdir(cache_dir)) == 1  # no re-export


def test_key_separates_statics_and_shapes(cache_dir):
    x = np.ones((2, 4), np.float32)
    y = np.ones(4, np.float32)
    progcache.call("toy", _toy, dict(n=2), x, y)
    progcache.call("toy", _toy, dict(n=4), x, y)  # different static
    progcache.call("toy", _toy, dict(n=2), np.ones((5, 4), np.float32), y)
    files = [f for f in os.listdir(cache_dir) if f.endswith(".bin")]
    assert len(files) == 3


def test_disabled_passthrough(cache_dir, monkeypatch):
    monkeypatch.setenv("KIMIMARO_TPU_PROGCACHE", "0")
    x = np.ones((2, 4), np.float32)
    y = np.zeros(4, np.float32)
    out = progcache.call("toy", _toy, dict(n=2), x, y)
    assert np.allclose(out[0], _toy(x, y, n=2)[0])
    assert not [f for f in os.listdir(cache_dir) if f.endswith(".bin")]


def test_prune_bounds_directory(cache_dir, monkeypatch):
    monkeypatch.setattr(progcache, "_PRUNE_MAX", 4)
    for i in range(6):
        (cache_dir / f"old{i}.bin").write_bytes(b"x")
        os.utime(cache_dir / f"old{i}.bin", (1000 + i, 1000 + i))
    progcache._prune()
    assert len(list(cache_dir.iterdir())) <= 4


def test_fingerprint_ignores_comments_and_docstrings():
    a = progcache._code_fingerprint(
        'def f(x):\n    """doc A"""\n    # comment\n    return x + 1\n')
    b = progcache._code_fingerprint(
        'def f(x):\n    """doc B, reworded"""\n    return x + 1  # note\n')
    c = progcache._code_fingerprint('def f(x):\n    return x + 2\n')
    assert a == b
    assert a != c
