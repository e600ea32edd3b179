"""Persistent XLA compilation cache (runtime/compile_cache.py).

The cache is the cold-start fix for the compile fleet measured in
``bench_ingest`` (6-22 s per (batch, seq) bucket over a relay-attached
chip). These tests pin the contract: resolution order of the knob, the
off-switch, and — on the CPU backend — that enabling it really writes
cache entries a second compile can hit.
"""

import os
import subprocess
import sys

from multimodal_rag_tpu.runtime.compile_cache import enable_compile_cache

_SUB = r"""
import sys
import jax, jax.numpy as jnp
from multimodal_rag_tpu.runtime.compile_cache import enable_compile_cache

path = enable_compile_cache(sys.argv[1])
assert path == sys.argv[1], (path, sys.argv[1])

@jax.jit
def f(x):
    return jnp.tanh(x) @ x.T

x = jnp.ones((17, 23), jnp.float32)  # odd shape: not in any warmup set
f(x).block_until_ready()
"""


import jax
import pytest


@pytest.fixture(autouse=True)
def _restore_suite_cache_dir():
    """The redirection tests move the process-global cache dir; point it
    back at the suite's dir afterward so later tests keep hitting it."""
    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def test_off_values_disable():
    for raw in ("off", "OFF", "false", "0", "none"):
        assert enable_compile_cache(raw) is None


def test_env_knob_off(monkeypatch):
    monkeypatch.setenv("MMRAG_COMPILE_CACHE_DIR", "off")
    assert enable_compile_cache() is None


def test_explicit_dir_wins_over_env(tmp_path, monkeypatch):
    monkeypatch.setenv("MMRAG_COMPILE_CACHE_DIR", str(tmp_path / "env"))
    want = tmp_path / "arg"
    got = enable_compile_cache(str(want))
    assert got == str(want)
    assert want.is_dir()


def test_cache_populates_and_hits(tmp_path):
    """Two fresh interpreters, same cache dir: the first populates, the
    second starts with a non-empty dir and leaves it unchanged in size
    (pure hit). Subprocesses because the cache config must be set before
    the process's first compile to be representative."""
    cache = tmp_path / "xla"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("MMRAG_COMPILE_CACHE_DIR", None)
    for _ in range(2):
        subprocess.run(
            [sys.executable, "-c", _SUB, str(cache)],
            check=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
    entries = [p for p in cache.rglob("*") if p.is_file()]
    assert entries, "persistent cache wrote no entries"
