"""Test configuration.

Default tier: tests run on the CPU backend with 8 virtual devices so
multi-chip sharding logic (mesh layouts, collectives-based top-k merge) is
exercised without TPU hardware (SURVEY.md §4). Must run before the first
``import jax``.

Real-TPU tier (VERDICT r1 #5): ``MMRAG_TPU_TESTS=1`` skips the CPU forcing
so ``tests/test_tpu_kernels.py`` runs the same kernel-vs-oracle contracts
COMPILED on the chip (``interpret=False``) — interpret mode cannot catch
VMEM-budget, layout, or CompilerParams regressions. Usage on a TPU host:

    MMRAG_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -v
    # or: make tpu-test
"""

import os

TPU_TIER = os.environ.get("MMRAG_TPU_TESTS") == "1"

if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("MMRAG_BASE_DIR", "/tmp/mmrag_tests")

import jax  # noqa: E402

if not TPU_TIER:
    # The hosting environment may pre-register a TPU plugin that overrides
    # JAX_PLATFORMS from the environment; force the CPU backend explicitly.
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent compile cache for the suite: the 800+ tests compile
# thousands of small executables; re-runs on the same host deserialize
# instead (runtime/compile_cache.py). Content-addressed per backend, so
# CPU-tier and TPU-tier entries coexist; MMRAG_COMPILE_CACHE_DIR=off
# opts out.
from multimodal_rag_tpu.runtime.compile_cache import (  # noqa: E402
    enable_compile_cache,
)

enable_compile_cache(
    os.environ.get("MMRAG_COMPILE_CACHE_DIR")
    or os.path.join(os.environ["MMRAG_BASE_DIR"], "xla_cache")
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: compiled-on-TPU kernel tests (set MMRAG_TPU_TESTS=1 on a "
        "TPU host; skipped elsewhere)",
    )
